package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Edit-distance pairs, interval coalescing, RAG chunking, l-diversity,
  * lag features, split leakage, and the boilerplate-suffix audit:
  * semantic invariants beyond the oracle hash. */
class CurationSeriesSpec extends SparkSuite {

  private lazy val s = sqlc

  test("editDistancePairs finds in-block near pairs and respects the gate") {
    import s.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delxa"),   // 1 edit from doc 1, same tok0
      (3L, "omega beta gamma delta"),   // different first token: gated out
      (4L, "alpha " + ("x" * 60))       // same tok0 but len far outside band
    ).toDF("doc_id", "text")
    val pairs = Linkage.editDistancePairs(d, "doc_id", "text",
        prefixLen = 32, maxDist = 5, lenBand = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1L)))
  }

  test("coalesceIntervals merges overlaps and splits on true gaps") {
    import s.implicits._
    val iv = Seq(
      ("u", 0L, 10L), ("u", 5L, 12L),   // overlap → one island [0,12]
      ("u", 12L, 20L),                  // touching (s == prev end) → merged
      ("u", 30L, 40L),                  // gap → new island
      ("v", 0L, 1L)
    ).toDF("k", "s", "e")
    val out = graft.streaming.EventTimeOps.coalesceIntervals(iv, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("u", 1L, 0L, 20L, 3L), ("u", 2L, 30L, 40L, 1L),
      ("v", 1L, 0L, 1L, 1L)))
  }

  test("ragChunks covers every token and overlaps by chunk-stride") {
    import s.implicits._
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = TextAnalysis.ragChunks(d, "text", "doc_id",
        chunkTokens = 32, stride = 24)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // n=100: starts 0,24,48,72 — the last chunk reaches token 100 with 28
    // tokens, so every token is covered and no extra chunk is emitted
    assert(chunks.toSeq == Seq((0L, 32L), (1L, 32L), (2L, 32L), (3L, 28L)))
  }

  test("ragChunks: a short doc is exactly one whole-doc chunk") {
    import s.implicits._
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    val chunks = TextAnalysis.ragChunks(d, "text", "doc_id", 32, 24).collect()
    assert(chunks.length == 1 && chunks(0).getLong(2) == 3L)
  }

  test("lDiversity counts distinct sensitive values per quasi group") {
    import s.implicits._
    val rows = Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 1L, 2L),
      ("b", 1L, 5L), ("b", 1L, 5L)).toDF("q1", "q2", "sv")
    val out = Quality.lDiversity(rows, Seq("q1", "q2"), col("sv"), 2)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(("a", 2L, 3L, 0L), ("b", 1L, 2L, 1L)))
  }

  test("lagFeatures: lags are NULL without history, rolling mean is exact") {
    import s.implicits._
    val d = (1 to 10).map(i => ("g", i.toLong, i.toLong * 10))
      .toDF("g", "x", "y")
    val out = Stats.lagFeatures(d, "g", "x", "y", longLag = 7, window = 7)
      .collect()
    val r1 = out(0); val r10 = out(9)
    assert(r1.isNullAt(r1.fieldIndex("lag1")) &&
      r1.isNullAt(r1.fieldIndex("lag7")))
    assert(r10.getLong(r10.fieldIndex("lag1")) == 90L &&
      r10.getLong(r10.fieldIndex("lag7")) == 30L)
    // rows 4..10 → sum 10*(4+..+10)=490, n=7 → mean 70
    assert(r10.getLong(r10.fieldIndex("roll_sum")) == 490L &&
      r10.getLong(r10.fieldIndex("roll_mean")) == 70L)
  }

  test("splitLeakage flags only cross-split fingerprint collisions") {
    import s.implicits._
    // 10 docs per class; doc 100 and 101 share a fingerprint
    val d = (0L until 20L).map(i => (i, s"c${i % 2}",
        if (i == 4L || i == 17L) "DUP" else s"fp$i"))
      .toDF("id", "cls", "fp")
    val out = Sampling.splitLeakage(d, "cls", "id", col("fp"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val leaks = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    // whichever split the DUP docs landed in, a leak row exists iff they
    // crossed the train boundary; assert consistency with the split table
    val splits = Sampling.stratifiedSplit(d, "cls", "id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val expect = for {
      a <- Seq(4L, 17L); b <- Seq(4L, 17L)
      if splits(a) == "train" && splits(b) != "train"
    } yield (a, b)
    assert(leaks.toSet == expect.toSet)
  }

  test("boilerplateSuffix flags a shared footer, not unique endings") {
    import s.implicits._
    val d = Seq(
      (1L, "s1", "unique one copyright notice"),
      (2L, "s1", "unique two copyright notice"),
      (3L, "s1", "unique three copyright notice"),
      (4L, "s1", "something else entirely different"),
      (5L, "s2", "alone here copyright notice")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.boilerplateSuffix(d, "text", "doc_id", "source",
        suffixTokens = 2, minPct = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L))
  }

  test("dsirWeights ranks target-like raw docs above off-domain ones") {
    import s.implicits._
    val target = Seq(
      (1L, "spark query spark query join"),
      (2L, "spark table query join spark")
    ).toDF("doc_id", "text")
    val raw = Seq(
      (10L, "spark query join table"),   // in-domain: shares target features
      (11L, "cat dog fish bird"),        // off-domain: no target overlap
      (12L, "")                          // feature-less: must not vanish
    ).toDF("doc_id", "text")
    val out = Sampling.dsirWeights(target, raw, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // every raw doc present; 4 tokens → 4 unigrams + 3 bigrams = 7 feats
    assert(out.keySet == Set(10L, 11L, 12L))
    assert(out(10L)._1 == 7L && out(11L)._1 == 7L)
    assert(out(12L) == ((0L, 0L, 0L)))
    // the in-domain doc's per-feature log ratio beats the off-domain one's
    assert(out(10L)._3 > out(11L)._3)
    // truncating-divided average is consistent with the total (toward-zero
    // semantics for signed totals, matching DuckDB's `//`)
    Seq(10L, 11L).foreach { id =>
      val (n, w, avg) = out(id)
      assert(avg == w / n)
    }
  }

  test("luhnCardAudit validates the checksum, not just the digit shape") {
    import s.implicits._
    val d = Seq(
      (1L, "pay 4111111111111111 now"),          // classic valid test PAN
      (2L, "ref 4111111111111112 thanks"),       // off-by-one check digit
      (3L, "a 4111111111111111 b 1234567890123456 c"), // one of two valid
      (4L, "no digits here"),
      (5L, "short 411111111111111 run and long 41111111111111112 run")
    ).toDF("doc_id", "text")
    val out = Quality.luhnCardAudit(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((1L, 1L, true)))
    assert(out(2L) == ((1L, 0L, false)))
    assert(out(3L) == ((2L, 1L, true)))
    assert(out(4L) == ((0L, 0L, false)))
    // 15- and 17-digit runs are not candidates (the \b boundary holds)
    assert(out(5L) == ((0L, 0L, false)))
  }

  test("distillLinearGate: batch perceptron matches a serial re-derivation " +
      "and is partition-order invariant") {
    import s.implicits._
    val good = "This is a long and reasonably clean paragraph of text that " +
      "keeps going for a while so that it comfortably clears the hundred " +
      "character floor and contains the usual stopwords in it."
    val bad = "x!!! ??? ,,,"
    val d = (1L to 40L).map { i =>
      (i, if (i % 2 == 0) good + " extra " + ("pad " * (i.toInt % 7))
          else bad + ("!" * (i.toInt % 5)))
    }.toDF("doc_id", "text")
    val out = Quality.distillLinearGate(d, "text", "doc_id",
        seedMod = 5, epochs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // serial re-derivation of the same integer batch perceptron
    def feats(t: String): (Array[Long], Long) = {
      val chars = t.length.toLong
      val punct = t.count(".,;:!?".contains(_)).toLong
      val stops = Set("the", "a", "an", "and", "or", "of", "to", "in",
        "is", "it", "on", "for")
      val stop = t.trim.split("\\s+").count(w => w.nonEmpty && stops(w)).toLong
      val ok = chars >= 100 && punct * 10 <= chars && stop >= 1
      (Array(1L, chars, punct, stop), if (ok) 1L else -1L)
    }
    val rows = (1L to 40L).map { i =>
      val t = if (i % 2 == 0) good + " extra " + ("pad " * (i.toInt % 7))
        else bad + ("!" * (i.toInt % 5))
      (i, feats(t))
    }
    val seed = rows.filter(_._1 % 5 == 0)
    // seed-mean centering (bias untouched), truncating division
    val n = math.max(seed.size.toLong, 1L)
    val means = (0 until 4).map {
      case 0 => 0L
      case j => seed.map(_._2._1(j)).sum / n
    }
    def centered(x: Array[Long]): Array[Long] =
      Array(x(0), x(1) - means(1), x(2) - means(2), x(3) - means(3))
    var w = Array(0L, 0L, 0L, 0L)
    for (_ <- 1 to 3) {
      val upd = Array(0L, 0L, 0L, 0L)
      seed.foreach { case (_, (x0, y)) =>
        val x = centered(x0)
        val m = y * (0 until 4).map(j => w(j) * x(j)).sum
        if (m <= 0) (0 until 4).foreach(j => upd(j) += y * x(j))
      }
      (0 until 4).foreach(j => w(j) += upd(j))
    }
    rows.foreach { case (i, (x0, y)) =>
      val x = centered(x0)
      val score = (0 until 4).map(j => w(j) * x(j)).sum
      val pred = if (score > 0) 1L else -1L
      assert(out(i) == ((score, pred, if (pred == y) 1L else 0L)), s"doc $i")
    }
    // order/partitioning invariance: batch updates have no row order
    val shuffled = Quality.distillLinearGate(d.repartition(7), "text",
        "doc_id", seedMod = 5, epochs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(shuffled == out)
    // the distilled scorer learns the rule's signal (3 batch epochs need
    // not perfectly separate — the serial-equality loop above is the
    // correctness contract; this is the sanity floor)
    assert(out.values.count(_._3 == 1L) >= 30, s"agreement too low: " +
      out.values.count(_._3 == 1L))
  }

  test("distillLinearGate with an empty seed scores everything 0 / pred -1") {
    import s.implicits._
    val d = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    // seedMod = 3 matches no doc_id in {1, 2} except none → w stays 0
    val out = Quality.distillLinearGate(d, "text", "doc_id",
        seedMod = 3, epochs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == Set((1L, 0L, -1L), (2L, 0L, -1L)))
  }
}
