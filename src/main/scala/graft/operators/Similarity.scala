package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Two paths:
 *  - [[bruteForceTopK]]: exact top-k by quantized dot product. Correctness
 *    baseline; O(n·q) — fine for a broadcast-able query set, never for
 *    all-pairs at scale.
 *  - [[lshBuckets]] / [[lshCandidates]]: random-hyperplane LSH with fixed
 *    ±1 planes: sign of an integer dot product per plane → bucket bits.
 *    The scale path — candidates meet only inside a bucket, so the shuffle
 *    carries (id, bucket) pairs, not vectors.
 *
 * Determinism: embeddings are quantized (`floor(x·1000)` per element —
 * float→double widening is exact, so the same parquet bits give the same
 * longs in any engine) and all scoring is int64 — the oracle reproduces
 * results bit-for-bit, no FP-associativity drift.
 */
object Similarity {

  /** Quantize an array<float> to exact long milli-units. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x * 1000d).cast(LongType))

  /** Integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Squared L2 norm of a quantized vector (for cosine post-filtering). */
  def norm2Q(a: Column): Column =
    aggregate(a, lit(0L), (acc, x) => acc + x * x)

  /** Double-precision cosine similarity (non-oracle path; FP). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y),
      lit(0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0d), (acc, x) => acc + x.cast(DoubleType) * x))
    val nb = sqrt(aggregate(b, lit(0d), (acc, x) => acc + x.cast(DoubleType) * x))
    dot / (na * nb)
  }

  /**
   * Exact top-k neighbors for each query vector by quantized dot product.
   * Query side is broadcast (a query set is small by construction); ties
   * break on neighbor id, so results are total-ordered and reproducible.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), quantize(col(vecCol)).as("qv"))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qq"))
    val scored = c.join(broadcast(q), col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"), dotQ(col("qv"), col("qq")).as("dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("item_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplane element: plane j, dimension i. */
  private def planeSign(planeId: Column, dim: Column): Column =
    when(((planeId * 37L + dim * 13L) % 5L) < 3L, lit(1L)).otherwise(lit(-1L))

  /**
   * Bucket id per (vector, plane-set): bit j = [dot(vec, plane_j) > 0].
   * `numPlanes` bits → up to 2^numPlanes buckets.
   */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
      numPlanes: Int = 8): DataFrame = {
    val qv = quantize(col(vecCol))
    // signed dot with plane j, computed per plane via an int fold over dims
    val bits = (0 until numPlanes).map { j =>
      val signedSum = aggregate(
        zip_with(qv, sequence(lit(0), size(qv) - 1),
          (x, i) => x * planeSign(lit(j.toLong), i.cast(LongType))),
        lit(0L), (acc, v) => acc + v)
      when(signedSum > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }
    df.select(col(idCol).as("item_id"),
      bits.reduce(_ + _).as("bucket"))
  }

  /**
   * IVF-style coarse quantization with FIXED coarse centroids: the first
   * `nCells` corpus vectors act as cell centroids (deterministic — no
   * training pass), every vector lands in the cell of its nearest centroid
   * by exact integer squared-L2 (‖a−c‖² = ‖a‖² + ‖c‖² − 2a·c). A real IVF
   * swaps in k-means centroids; the partitioning, assignment join, and
   * probe shapes are identical. Centroids broadcast — assignment is a
   * map-only stage at any corpus size.
   */
  def ivfCells(df: DataFrame, idCol: String, vecCol: String, nCells: Int = 8): DataFrame = {
    val v = df.select(col(idCol).as("item_id"), quantize(col(vecCol)).as("qv"),
      norm2Q(quantize(col(vecCol))).as("n2"))
    val cents = v.filter(col("item_id") < nCells)
      .select(col("item_id").as("cell_id"), col("qv").as("cv"), col("n2").as("cn2"))
    v.join(broadcast(cents))
      .select(col("item_id"),
        col("cell_id"),
        (col("n2") + col("cn2") - lit(2L) * dotQ(col("qv"), col("cv"))).as("dist2"))
      .groupBy(col("item_id"))
      .agg(min_by(struct(col("dist2"), col("cell_id")), struct(col("dist2"), col("cell_id")))
        .as("best"))
      .select(col("item_id"), col("best.cell_id").as("cell_id"),
        col("best.dist2").as("dist2"))
  }

  /** IVF probe: exact top-k within each query's own cell (single-probe). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 8): DataFrame = {
    val cells = ivfCells(corpus, idCol, vecCol, nCells)
    val qv = corpus.select(col(idCol).as("item_id"), quantize(col(vecCol)).as("qv"))
    val c = cells.join(qv, "item_id")
    val q = c.join(queries.select(col(idCol).as("item_id")), "item_id")
      .select(col("item_id").as("query_id"), col("cell_id").as("qcell"),
        col("qv").as("qq"))
    val scored = c.join(broadcast(q),
        col("cell_id") === col("qcell") && col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"), dotQ(col("qv"), col("qq")).as("dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Candidate pairs sharing a bucket (a < b). */
  def lshCandidates(buckets: DataFrame): DataFrame = {
    val l = buckets.alias("l"); val r = buckets.alias("r")
    l.join(r, col("l.bucket") === col("r.bucket") &&
        col("l.item_id") < col("r.item_id"))
      .select(col("l.item_id").as("item_a"), col("r.item_id").as("item_b"),
        col("l.bucket").as("bucket"))
  }
}
