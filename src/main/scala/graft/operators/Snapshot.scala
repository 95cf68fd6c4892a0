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

  /**
   * Column-level drill-down for ids present in BOTH snapshots: which
   * columns actually changed, and how much — the read that turns
   * [[diff]]'s "12M rows changed" into "one upstream job rewrote
   * `status`, everything else is stable". Null-safe comparison (`<=>`),
   * so null→value and value→null count as changes and null→null does
   * not.
   *
   * Shape: one id-keyed inner join (both sides project ONLY the compared
   * columns), one 1-row aggregate of the per-column change flags, then a
   * |cols|-row stack — nothing after the join scales with input.
   *
   * Output: (col_name, n_changed, n_common, changed_ppm) per compared
   * column, ordered by col_name.
   */
  def columnDiff(a: DataFrame, b: DataFrame, idCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "pass at least one column to compare")
    import org.apache.spark.sql.types.LongType
    // positional aliases throughout: a user column name is DATA here
    // (it may contain dots, spaces, quotes) and must never round-trip
    // through a parsed identifier or SQL string; input references are
    // backtick-escaped so a dotted name resolves as one column
    def raw(df: DataFrame, c: String) =
      df.col("`" + c.replace("`", "``") + "`")
    val idx = cols.zipWithIndex
    val ha = a.select((raw(a, idCol).as("__id") +:
      idx.map { case (c, i) => raw(a, c).as(s"__a_$i") }): _*)
    val hb = b.select((raw(b, idCol).as("__id") +:
      idx.map { case (c, i) => raw(b, c).as(s"__b_$i") }): _*)
    val flags = idx.map { case (_, i) =>
      (!(col(s"__a_$i") <=> col(s"__b_$i"))).cast(LongType).as(s"__chg_$i")
    }
    val aggd = ha.join(hb, "__id")
      .select(flags: _*)
      .agg(count(lit(1)).as("n_common"),
        idx.map { case (_, i) =>
          coalesce(sum(col(s"__chg_$i")), lit(0L)).as(s"__s_$i") }: _*)
    val pairs = array(idx.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"__s_$i").as("n_changed")) }: _*)
    aggd.select(col("n_common"), explode(pairs).as("kv"))
      .select(col("kv.col_name").as("col_name"),
        col("kv.n_changed").as("n_changed"), col("n_common"),
        when(col("n_common") === 0L, 0L)
          .otherwise(IntMath.idiv(col("kv.n_changed") * 1000000L,
            col("n_common"))).as("changed_ppm"))
  }
}
