package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot diff for incremental corpus maintenance: a 100 TB training
 * corpus is rebuilt in snapshots (new crawl, re-filtered, re-deduped), and
 * the downstream pipeline wants to reprocess only what changed. Classifies
 * every doc id across two snapshots as added / removed / changed /
 * unchanged by comparing content hashes.
 *
 * Shape at scale: each side reduces to (id, md5) FIRST, so the full-outer
 * join shuffles 16-byte hashes — document text never moves. The join key
 * is the id, so both sides partition identically and AQE can size the
 * shuffle; the summary form is one further partial-agg groupBy.
 */
object Snapshot {

  /**
   * Per-id status between snapshot `a` (old) and `b` (new).
   *
   * Output: (doc_id, status) with status ∈ added (in b only), removed
   * (in a only), changed (both, different content hash), unchanged.
   * `contentCol` must be non-null (hash of null would classify as
   * added/removed); ids must be unique per snapshot.
   */
  def diff(a: DataFrame, b: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val ha = a.select(col(idCol).as("doc_id"),
      md5(col(contentCol)).as("hash_a"))
    val hb = b.select(col(idCol).as("doc_id"),
      md5(col(contentCol)).as("hash_b"))
    ha.join(hb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("hash_a").isNull, lit("added"))
          .when(col("hash_b").isNull, lit("removed"))
          .when(col("hash_a") === col("hash_b"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The 4-row report form: status → count. */
  def diffSummary(a: DataFrame, b: DataFrame, idCol: String,
      contentCol: String): DataFrame =
    diff(a, b, idCol, contentCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
