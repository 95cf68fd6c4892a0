package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Product quantization (Jégou et al., "Product Quantization for Nearest
 * Neighbor Search", TPAMI 2011) — the vector-compression path for
 * embedding search at 100 TB: each vector is split into `numSubspaces`
 * contiguous sub-vectors, each sub-vector replaced by the id of its
 * nearest sub-codebook centroid. A 64-dim float vector (256 bytes)
 * compresses to 8 one-byte codes; distance queries run against the codes
 * via an asymmetric distance computation (ADC) table without ever
 * decompressing the corpus.
 *
 * Everything is integer-exact on the quantized (milli-unit long) vectors:
 * sub-codebooks come from the same deterministic all-integer k-means as
 * the IVF path ([[Similarity.kmeansOnQuantized]] — truncating-DIV means,
 * exact squared-L2 assignment), so training, encoding, and ADC scoring are
 * bit-reproducible and the DuckDB oracle checks them from templated
 * codebook literals.
 *
 * Scale shape:
 *  - training: `numSubspaces` independent k-means runs, each over
 *    (item, d/m longs) — map-only assignment against broadcast centroids
 *    per iteration, partial-agg means; centroids collected per iteration
 *    (m·k·d/m longs — tiny).
 *  - encoding: one slice + broadcast-join + per-(item, sub) min_by —
 *    map-only at any corpus size; output is m small ints per vector.
 *  - ADC: the per-query distance table is |queries|·m·k rows (tiny,
 *    broadcast); the scan joins it to the exploded code column — linear
 *    in corpus size with 8-byte rows, never touching raw vectors.
 */
object Pq {

  /** Train per-subspace codebooks: (sub_id, cell_id, cv array<long>, cn2).
    * `dims` must divide evenly into `numSubspaces` sub-vectors. */
  def trainCodebooks(train: DataFrame, idCol: String, vecCol: String,
      numSubspaces: Int = 8, cellsPerSub: Int = 16, iters: Int = 3): DataFrame = {
    val v = train.select(col(idCol).as("item_id"),
      Similarity.quantize(col(vecCol)).as("qv")).localCheckpoint()
    val dims = v.select(size(col("qv"))).head().getInt(0)
    require(dims % numSubspaces == 0,
      s"dims=$dims not divisible into $numSubspaces subspaces")
    val d = dims / numSubspaces
    (0 until numSubspaces).map { sub =>
      val sv = v.select(col("item_id"),
        slice(col("qv"), sub * d + 1, d).as("qv")).localCheckpoint()
      Similarity.kmeansOnQuantized(sv, cellsPerSub, iters)
        .select(lit(sub).as("sub_id"), col("cell_id"), col("cv"), col("cn2"))
    }.reduce(_ unionByName _)
  }

  /** Encode each vector as one code per subspace (nearest sub-centroid by
    * exact integer L2, ties to the smaller cell). Output: one row per
    * (item_id, sub_id, code) — the exploded form of the m-byte code word. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, numSubspaces: Int = 8): DataFrame = {
    val v = df.select(col(idCol).as("item_id"),
      Similarity.quantize(col(vecCol)).as("qv"))
    val d = dimsPerSub(v, numSubspaces)
    val cb = broadcast(codebooks.select(col("sub_id"), col("cell_id"),
      col("cv"), col("cn2")))
    v.join(cb)
      .select(col("item_id"), col("sub_id"), col("cell_id"),
        subDist2(col("qv"), col("sub_id"), d, col("cv"), col("cn2")).as("dist2"))
      .groupBy(col("item_id"), col("sub_id"))
      .agg(min_by(col("cell_id"), struct(col("dist2"), col("cell_id"))).as("code"))
      .select(col("item_id"), col("sub_id"), col("code"))
  }

  /**
   * ADC top-k: score every encoded corpus vector against each query by the
   * summed per-subspace distance between the query's sub-vector and the
   * corpus vector's assigned sub-centroid. Queries carry RAW vectors
   * (asymmetric — only the corpus is compressed). Ties on total distance
   * break on item id. Output: (query_id, item_id, adist2, rank).
   */
  def adcTopK(codes: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, codebooks: DataFrame, k: Int = 5,
      numSubspaces: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      Similarity.quantize(col(vecCol)).as("qv"))
    val d = dimsPerSub(q, numSubspaces)
    // distance table: |queries| × m × k rows — tiny, broadcast. Keys are
    // RENAMED (dt_sub/dt_cell): codes and dt both descend from the same
    // codebooks plan, so joining on same-named columns would be ambiguous
    // (identical expression ids on both sides).
    val dt = broadcast(q.join(broadcast(codebooks))
      .select(col("query_id"), col("sub_id").as("dt_sub"),
        col("cell_id").as("dt_cell"),
        subDist2(col("qv"), col("sub_id"), d, col("cv"), col("cn2")).as("dt")))
    val scored = codes
      .join(dt, col("sub_id") === col("dt_sub") && col("code") === col("dt_cell"))
      .filter(col("item_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("item_id"))
      .agg(sum(col("dt")).as("adist2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist2").asc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def dimsPerSub(v: DataFrame, numSubspaces: Int): Int = {
    val dims = v.select(size(col("qv"))).head().getInt(0)
    require(dims % numSubspaces == 0,
      s"dims=$dims not divisible into $numSubspaces subspaces")
    dims / numSubspaces
  }

  /** ‖q_sub − c‖² = ‖q_sub‖² + ‖c‖² − 2·q_sub·c on the sliced sub-vector
    * (slice start is a COLUMN — sub_id comes from the codebook row). */
  private def subDist2(qv: org.apache.spark.sql.Column,
      subId: org.apache.spark.sql.Column, d: Int,
      cv: org.apache.spark.sql.Column,
      cn2: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val sq = slice(qv, subId * d + 1, lit(d))
    Similarity.norm2Q(sq) + cn2 - lit(2L) * Similarity.dotQ(sq, cv)
  }
}
