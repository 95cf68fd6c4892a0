package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Linalg (co-moment / power iteration / JL / SQ8), Spatial proximity
  * join, Sharding rendezvous, Downsample LTOB, and late-interaction
  * retrieval: semantic invariants the oracle rows can't see directly. */
class LinalgSpatialSpec extends SparkSuite {

  private lazy val s = sqlc

  private def vecs(rows: Seq[(Long, Seq[Float])]) = {
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("comomentMatrix matches the hand-computed 2-dim case") {
    // quantize to (1, 2), (3, 4), (6, 0) — values chosen so the float
    // milli-quantization is exact (0.005f would floor to 4, not 5)
    val df = vecs(Seq((0L, Seq(0.001f, 0.002f)), (1L, Seq(0.003f, 0.004f)),
      (2L, Seq(0.006f, 0.0f))))
    val m = Linalg.comomentMatrix(df, "embedding", dim = 2)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    // n=3; sx=(10,6); sxx=46, sxy=1*2+3*4+6*0=14, syy=20
    // c11 = 3*46 - 100 = 38; c12 = 3*14 - 60 = -18; c22 = 3*20 - 36 = 24
    assert(m == Map((1, 1) -> 38L, (1, 2) -> -18L, (2, 2) -> 24L))
  }

  test("power iteration finds the dominant axis of an anisotropic cloud") {
    // points spread ±along dim 0, tiny noise on dim 1 → top eigenvector
    // must load on dim 0 with |comp| = 1e6, dim 1 near zero
    val df = vecs((0 until 40).map { i =>
      val sign = if (i % 2 == 0) 1f else -1f
      (i.toLong, Seq(sign * (0.1f + i * 0.01f), (i % 5) * 0.001f))
    })
    val v = Linalg.powerIterationTop(df, "embedding", dim = 2, iters = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(math.abs(v(1)) == 1000000L)
    assert(math.abs(v(2)) < 100000L)
  }

  test("jlProject output matches per-element sign expansion") {
    val df = vecs(Seq((0L, (1 to 64).map(i => i * 0.001f))))
    val proj = Linalg.jlProject(df, "vec_id", "embedding", dim = 64, k = 16)
      .collect()(0).getSeq[Long](1)
    // recompute expected from the published sign rows over the quantized
    // values Spark computed (read them back via Similarity.quantize)
    val qv = df.select(Similarity.quantize(col("embedding")))
      .collect()(0).getSeq[Long](0)
    val expect = (1 to 16).map { a =>
      Linalg.jlSignRow(a, 64).zip(qv).map { case (sg, x) => sg * x }.sum
    }
    assert(proj == expect)
  }

  test("sq8Quantize: constant vector has zero codes and zero error") {
    val df = vecs(Seq((7L, Seq.fill(64)(0.25f))))
    val r = Linalg.sq8Quantize(df, "vec_id", "embedding", dim = 64).collect()(0)
    assert(r.getLong(r.fieldIndex("code_sum")) == 0L)
    assert(r.getLong(r.fieldIndex("code_poly")) == 0L)
    assert(r.getLong(r.fieldIndex("abs_err")) == 0L)
  }

  test("sq8Quantize reconstruction error is bounded by one step per dim") {
    val df = vecs(Seq((1L, (0 until 64).map(i => (i * 0.007f - 0.2f)))))
    val r = Linalg.sq8Quantize(df, "vec_id", "embedding", dim = 64).collect()(0)
    val mn = r.getLong(r.fieldIndex("mn")); val mx = r.getLong(r.fieldIndex("mx"))
    val step = (mx - mn) / 255 + 1
    assert(r.getLong(r.fieldIndex("abs_err")) <= step * 64)
  }

  test("spatial proximityJoin equals the quadratic answer on a crafted grid") {
    import s.implicits._
    // points straddling cell boundaries at radius 4 (cells of width 4):
    // (3,3)-(5,5) cross a boundary at distance²=8 ≤ 16
    val pts = Seq((1L, 3L, 3L), (2L, 5L, 5L), (3L, 0L, 0L), (4L, 100L, 100L),
      (5L, 4L, 0L), (6L, 8L, 0L), (7L, 12L, 0L)).toDF("id", "x", "y")
    val got = Spatial.proximityJoin(pts, "id", "x", "y", radius = 4L)
      .select("id_a", "id_b", "dist2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rows = Seq((1L, 3L, 3L), (2L, 5L, 5L), (3L, 0L, 0L), (4L, 100L, 100L),
      (5L, 4L, 0L), (6L, 8L, 0L), (7L, 12L, 0L))
    val want = (for {
      (ia, xa, ya) <- rows; (ib, xb, yb) <- rows
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= 16
    } yield (ia, ib, d2)).toSet
    assert(got == want)
    assert(want.contains((1L, 2L, 8L)), "boundary-straddling pair present")
  }

  test("spatial proximityJoin emits each pair exactly once") {
    import s.implicits._
    // co-located points (same cell) must not duplicate through the 3×3
    // neighborhood expansion
    val pts = Seq((1L, 10L, 10L), (2L, 10L, 10L), (3L, 11L, 10L))
      .toDF("id", "x", "y")
    val got = Spatial.proximityJoin(pts, "id", "x", "y", radius = 5L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length && got.length == 3)
  }

  test("rendezvous rebalance: only the added node receives moved keys") {
    import s.implicits._
    val keys = s.range(5000).select(col("id").as("k"))
    val rep = Sharding.rebalanceReport(keys, "k", nFrom = 8, nTo = 9)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val moved = rep.filter { case (f, t, _) => f != t }
    assert(moved.nonEmpty, "a resize must move some keys")
    assert(moved.forall(_._2 == 8), "HRW: every moved key lands on node 8")
    val frac = moved.map(_._3).sum.toDouble / rep.map(_._3).sum
    assert(frac < 0.35, s"moved fraction $frac far above ~1/9")
  }

  test("rendezvous assign is stable across calls and within 8 nodes") {
    import s.implicits._
    val keys = s.range(200).select(col("id").as("k"))
    val a = Sharding.assign(keys, "k", 8).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Sharding.assign(keys, "k", 8).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
    assert(a.values.toSet.subsetOf((0 until 8).toSet))
  }

  test("LTOB keeps endpoints and the per-bucket max-area point") {
    import s.implicits._
    // one series: a flat line with one spike per bucket — the spike wins
    val rows = (0 until 20).map { i =>
      val v = if (i == 3 || i == 13) 1000L else 10L
      ("s", 1000L + i * 1000L, v, i.toLong)
    }
    val out = Downsample.ltob(rows.toDF("grp", "ts", "v", "id"),
        "grp", "ts", "v", "id", bucket = 10)
      .select("rid").collect().map(_.getLong(0)).toSet
    // endpoints 0 and 19 always kept; spikes 3 and 13 dominate their buckets
    assert(Set(0L, 19L, 3L, 13L).subsetOf(out))
    assert(out.size <= 6, s"LTOB emitted $out — more than bucket picks + endpoints")
  }

  test("late interaction ranks the doc sharing a token over a diffuse one") {
    // query doc 0: token0 = e1-direction. doc 1 copies that token exactly;
    // doc 2 spreads the same mass across dims orthogonal to every q token.
    def mk(tok0: Seq[Float], rest: Float): Seq[Float] =
      tok0 ++ Seq.fill(56)(rest)
    val df = vecs(Seq(
      (0L, mk(Seq(0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 0f)),
      (1L, mk(Seq(0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 0f)),
      (2L, mk(Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f, 0.1f), 0.01f))))
    val top = Similarity.lateInteractionTopK(df,
        df.filter(col("vec_id") === 0L), "vec_id", "embedding",
        tokens = 8, subDim = 8, k = 2, excludeSelf = true)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(top.head == (1L, 1), s"exact-token doc must rank 1, got ${top.toSeq}")
  }
  test("marginMine: a backward frame that misses the chosen b leaves the " +
      "pair unscored (null), never half-denominator scored") {
    import s.implicits._
    val a = vecs(Seq((0L, Seq.fill(64)(0.1f))))
    val b = vecs(Seq((100L, Seq.fill(64)(0.1f)), (101L, Seq.fill(64)(0.05f))))
    // pluggable neighbors: forward covers a->b fully; backward is EMPTY
    // (an approximate index that missed every b vector)
    val fwd = Similarity.bruteForceTopK(b, a, "vec_id", "embedding", 2)
    val emptyBwd = Similarity.bruteForceTopK(a, b, "vec_id", "embedding", 2)
      .filter(lit(false))
    val out = Similarity.marginMine(a, b, "vec_id", "embedding", k = 2,
      forward = Some(fwd), backward = Some(emptyBwd)).collect()
    assert(out.length == 1 && out(0).isNullAt(3) && !out(0).getBoolean(4))
    // covered backward: same pair scores non-null
    val bwd = Similarity.bruteForceTopK(a, b, "vec_id", "embedding", 2)
    val scored = Similarity.marginMine(a, b, "vec_id", "embedding", k = 2,
      forward = Some(fwd), backward = Some(bwd)).collect()
    assert(scored.length == 1 && !scored(0).isNullAt(3))
  }

}
