package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Distributed linear algebra over quantized embedding columns: the
 * co-moment (scaled covariance) matrix, its top eigenvector by integer
 * power iteration, Johnson–Lindenstrauss ±1 random projection, and
 * per-vector SQ8 scalar quantization.
 *
 * These are the feature-engineering / compression primitives a training
 * pipeline runs over an embedding corpus (PCA whitening decisions, cheap
 * dimensionality reduction before pair mining, int8 storage). The engines
 * the reference ecosystem pairs with (dsbulk-style bulk analyzers) have no
 * analogue — this is net-new capability, same determinism contract as
 * [[Similarity]]: quantize floats once (`floor(x·1000)` — exact in any
 * engine), then int64-only arithmetic so the DuckDB oracle reproduces every
 * bit.
 *
 * Scale notes (100 TB):
 *  - [[comomentMatrix]] never joins and never shuffles vectors: each row
 *    expands to its dim·(dim+1)/2 upper-triangle products IN THE MAP STAGE
 *    and Spark's partial hash aggregation collapses them to one running sum
 *    per (i,j) per partition before the (tiny, ≤dim²-row) shuffle. This is
 *    the treeAggregate Gramian shape, expressed declaratively.
 *  - [[powerIterationTop]] collects the dim×dim co-moment matrix to the
 *    driver — BOUNDED by dimension (64 → 2080 longs), independent of corpus
 *    size — and iterates in exact BigInt there. The corpus-scaling part
 *    (the matrix build) stays distributed.
 *  - int64 bounds: with |x|≤xmax milli-units, the co-moment `n·Σxy − Σx·Σy`
 *    needs n²·xmax² < 2⁶³ — at xmax = 4000 that holds to n ≈ 7.6e8 rows.
 *    Past that, pre-scale the quantization (q=100) or shard the corpus;
 *    the BigInt iteration itself never overflows.
 */
object Linalg {

  /**
   * Upper-triangle co-moment matrix of a quantized embedding column:
   * one row per (i ≤ j) with `comoment = n·Σ(x_i·x_j) − Σx_i·Σx_j`
   * (= n²·cov, exactly, in integer milli-units²). Dimensions are 1-based
   * to match SQL array subscripts.
   */
  def comomentMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    // rows with null or wrong-length vectors must not reach n: posexplode
    // silently drops them from the sums, and an n that counts them skews
    // n·Σxy − Σx·Σy for every cell
    val q = df.select(Similarity.quantize(col(vecCol)).as("qv"))
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
    // map-side expansion to per-row products; partial agg collapses each
    // partition to ≤ dim² running sums before any shuffle
    val prod = q
      .select(posexplode(col("qv")).as(Seq("i0", "x")), col("qv"))
      .select(col("i0"), col("x"), posexplode(col("qv")).as(Seq("j0", "y")))
      .filter(col("i0") <= col("j0"))
      .groupBy(col("i0"), col("j0"))
      .agg(sum(col("x") * col("y")).as("sxy"))
    val sums = q
      .select(posexplode(col("qv")).as(Seq("i0", "x")))
      .groupBy(col("i0"))
      .agg(sum(col("x")).as("sx"))
    val n = q.count()
    prod
      .join(sums.select(col("i0"), col("sx").as("sxi")), "i0")
      .join(sums.select(col("i0").as("j0"), col("sx").as("sxj")), "j0")
      .select(
        (col("i0") + 1).cast(IntegerType).as("i"),
        (col("j0") + 1).cast(IntegerType).as("j"),
        (lit(n) * col("sxy") - col("sxi") * col("sxj")).as("comoment"))
  }

  /**
   * Top eigenvector of the co-moment matrix by fixed-iteration integer
   * power iteration. Start vector is all-10⁶; each step multiplies by the
   * full (mirrored) matrix in exact BigInt, then rescales so the largest
   * |component| is 10⁶ again, truncating toward zero — every step is
   * integer-exact, so the result is engine-independent (no FP drift, no
   * convergence tolerance). Returns one row per dimension: (i, comp) with
   * comp in [−10⁶, 10⁶].
   *
   * The matrix collect is bounded by dim² (the corpus-sized work happened
   * in [[comomentMatrix]]); iters is a fixed small constant.
   */
  def powerIterationTop(df: DataFrame, vecCol: String, dim: Int,
      iters: Int): DataFrame = {
    val spark = df.sparkSession
    val tri = comomentMatrix(df, vecCol, dim).collect() // ≤ dim(dim+1)/2 rows
    val c = Array.ofDim[BigInt](dim, dim)
    tri.foreach { r =>
      val i = r.getInt(0) - 1; val j = r.getInt(1) - 1
      val v = BigInt(r.getLong(2))
      c(i)(j) = v; c(j)(i) = v
    }
    val scale = BigInt(1000000)
    var v = Array.fill[BigInt](dim)(scale)
    (1 to iters).foreach { _ =>
      val w = Array.tabulate(dim) { i =>
        var acc = BigInt(0); var j = 0
        while (j < dim) { acc += c(i)(j) * v(j); j += 1 }
        acc
      }
      val m = w.map(_.abs).max
      // BigInt `/` truncates toward zero — matches the oracle's trunc-div
      v = if (m == 0) w else w.map(x => x * scale / m)
    }
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => (i + 1, x.toLong) }
      .toSeq.toDF("i", "comp")
  }

  /** Deterministic JL sign for (output dim a, input dim j), both 1-based:
    * parity of `((a·1000003 + j) · 2654435761) mod (2³¹−1)`. */
  private def jlSign(a: Int, j: Int): Long =
    if (((a.toLong * 1000003L + j) * 2654435761L) % 2147483647L % 2L == 0L) 1L
    else -1L

  /** The ±1 sign row for output dimension `a` over `dim` input dims. */
  def jlSignRow(a: Int, dim: Int): Seq[Long] =
    (1 to dim).map(j => jlSign(a, j))

  /**
   * Johnson–Lindenstrauss ±1 projection of a quantized embedding to k
   * dims: y_a = Σ_j sign(a,j)·x_j. The sign matrix is compile-time
   * deterministic, so each output dim is ONE codegen'd integer dot product
   * against a literal array — the projection is map-only, no shuffle, no
   * stored matrix. Output: (idCol, proj array<long> of length k).
   */
  def jlProject(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int): DataFrame = {
    val qv = Similarity.quantize(col(vecCol))
    val comps: Seq[Column] = (1 to k).map { a =>
      Similarity.dotQ(qv, typedlit(jlSignRow(a, dim)))
    }
    df.select(col(idCol), array(comps: _*).as("proj"))
  }

  /**
   * JL distortion report over the pair set of a bounded id prefix
   * (`idCol < sampleIds`): per pair, exact original and projected squared
   * L2 distances and the ppm ratio `d2_proj·10⁶ / (k·d2_orig)` (≈10⁶ when
   * the projection preserves the metric; ±1 JL gives E[d2_proj] = k·d2_orig).
   * The sample side is broadcast — corpus-size-independent.
   */
  def jlDistortion(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, sampleIds: Long): DataFrame = {
    val base = jlProject(df, idCol, vecCol, dim, k)
      .join(df.select(col(idCol), Similarity.quantize(col(vecCol)).as("qv")), idCol)
      .filter(col(idCol) < sampleIds)
      .select(col(idCol).as("id"), col("qv"), col("proj"))
    val a = base.select(col("id").as("u_id"), col("qv").as("qa"), col("proj").as("pa"))
    val b = base.select(col("id").as("v_id"), col("qv").as("qb"), col("proj").as("pb"))
    val d2 = (x: Column, y: Column) =>
      Similarity.norm2Q(x) + Similarity.norm2Q(y) - lit(2L) * Similarity.dotQ(x, y)
    a.join(broadcast(b), col("u_id") < col("v_id"))
      .select(col("u_id"), col("v_id"),
        d2(col("qa"), col("qb")).as("d2_orig"),
        d2(col("pa"), col("pb")).as("d2_proj"))
      .select(col("u_id"), col("v_id"), col("d2_orig"), col("d2_proj"),
        when(col("d2_orig") === 0L, 0L)
          .otherwise(IntMath.idiv(col("d2_proj") * lit(1000000L),
            col("d2_orig") * lit(k.toLong))).as("ratio_ppm"))
  }

  /**
   * Per-vector SQ8 scalar quantization report: each quantized vector is
   * mapped to codes `⌊(x−min)·255/(max−min)⌋ ∈ [0,255]` (all-zero when the
   * vector is constant), reconstructed as `min + ⌊code·(max−min)/255⌋`, and
   * summarized per vector: (id, mn, mx, code_sum, code_poly = Σ code_j·j,
   * and total |x − recon|). Map-only; the code arrays themselves stay
   * implicit (a storage layer would write them) — the summary is the
   * verifiable contract. All divisions have non-negative operands, so
   * truncating DIV = floor on both engines.
   */
  def sq8Quantize(df: DataFrame, idCol: String, vecCol: String,
      dim: Int): DataFrame = {
    val q = df.select(col(idCol), Similarity.quantize(col(vecCol)).as("qv"))
      .withColumn("mn", array_min(col("qv")))
      .withColumn("mx", array_max(col("qv")))
      .withColumn("rng", col("mx") - col("mn"))
    val code = (x: Column) =>
      when(col("rng") === 0L, 0L)
        .otherwise(IntMath.idiv((x - col("mn")) * 255L, col("rng")))
    val recon = (x: Column) =>
      col("mn") + IntMath.idiv(code(x) * col("rng"), lit(255L))
    val idx = sequence(lit(1L), lit(dim.toLong))
    q.select(
        col(idCol),
        col("mn"), col("mx"),
        aggregate(transform(col("qv"), x => code(x)), lit(0L),
          (acc, c) => acc + c).as("code_sum"),
        aggregate(zip_with(transform(col("qv"), x => code(x)), idx,
          (c, j) => c * j), lit(0L), (acc, v) => acc + v).as("code_poly"),
        aggregate(transform(col("qv"), x => abs(x - recon(x))), lit(0L),
          (acc, e) => acc + e).as("abs_err"))
  }
}
