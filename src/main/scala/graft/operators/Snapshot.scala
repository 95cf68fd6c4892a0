package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /**
   * rsync-style range-checksum diff: split the key space into `nRanges`
   * equal-width key ranges, reduce each side to an order-invariant
   * per-range checksum (XOR of row content hashes + a row count), and
   * report which ranges differ — the 100 TB sync verifier that moves
   * range-sized summaries instead of rows, narrowing a re-transfer to the
   * ranges that actually changed. XOR is commutative/associative with no
   * overflow, so the checksum is identical on any partitioning and in the
   * DuckDB mirror.
   *
   * Caveat (inherent to XOR folding): a range differing by an EVEN number
   * of copies of the same row hash XORs out — the row COUNT beside it
   * catches the common cases (pure adds/removes); treat equality as
   * high-probability, not proof.
   *
   * Output per range (ordered): (range_id, n_a, n_b, checksum_a,
   * checksum_b, differs).
   */
  def rangeChecksums(a: DataFrame, b: DataFrame, idCol: String,
      contentCol: String, nRanges: Int = 64): DataFrame = {
    require(nRanges >= 1, s"nRanges must be >= 1, got $nRanges")
    val mm = a.select(col(idCol).cast(LongType).as("k"))
      .unionByName(b.select(col(idCol).cast(LongType).as("k")))
      .agg(min("k"), max("k")).head()
    if (mm.isNullAt(0))
      return a.sparkSession.emptyDataFrame
        .select(lit(0L).as("range_id"), lit(0L).as("n_a"), lit(0L).as("n_b"),
          lit(0L).as("checksum_a"), lit(0L).as("checksum_b"),
          lit(false).as("differs")).limit(0)
    val lo = mm.getLong(0)
    val width = math.max(1L, (mm.getLong(1) - lo) / nRanges + 1)
    def side(df: DataFrame, nm: String): DataFrame =
      df.select(IntMath.idiv(col(idCol).cast(LongType) - lo, lit(width))
          .as("range_id"),
        TextAnalysis.stringHash(
          concat_ws("|", col(idCol).cast(
            org.apache.spark.sql.types.StringType),
            col(contentCol).cast(
              org.apache.spark.sql.types.StringType))).as("h"))
        .groupBy("range_id")
        .agg(count(lit(1)).as(s"n_$nm"),
          expr("bit_xor(h)").as(s"checksum_$nm"))
    side(a, "a").join(side(b, "b"), Seq("range_id"), "full_outer")
      .select(col("range_id"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("checksum_a"), lit(0L)).as("checksum_a"),
        coalesce(col("checksum_b"), lit(0L)).as("checksum_b"))
      .withColumn("differs",
        col("n_a") =!= col("n_b") ||
          col("checksum_a") =!= col("checksum_b"))
      .orderBy("range_id")
  }

  /**
   * Slowly-changing-dimension (type 2) build from an event log: collapse
   * each key's state stream into validity intervals. Consecutive events
   * with the SAME state extend the current interval (no spurious
   * versions); a state change opens a new one. Output per (key, version):
   * the state, `valid_from` (first event of the run), `valid_to` (start
   * of the next run — null on the live interval), `is_current`, and
   * `n_events` collapsed into the run.
   *
   * Events are ordered by (`tsCol`, `tieCol`) within a key; `tieCol` must
   * break ties deterministically (an event id). Scale shape: two keyed
   * window passes plus one partial-agg groupBy, all partitioned by the
   * key — one shuffle, reused across the window and the groupBy, no
   * unpartitioned window anywhere (the 100 TB event log sorts per key,
   * never globally).
   */
  def scd2(events: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    val versioned = events
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .withColumn("version",
        sum(when(col("__prev").isNull ||
          col("__prev") =!= col(stateCol), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
    val runs = versioned.groupBy(col(keyCol), col("version"))
      .agg(min(col(stateCol)).as("status"),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wv = Window.partitionBy(keyCol).orderBy("version")
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("version"), col("status"),
        col("valid_from"), col("valid_to"), col("is_current"),
        col("n_events"))
  }

  /**
   * INCREMENTAL [[scd2]]: fold a batch of new events into an existing
   * dimension without touching closed history. Contract (spec-pinned and
   * oracled end to end): `scd2Merge(scd2(events < T), events ≥ T) ==
   * scd2(all events)` — provided every new event is at or after its key's
   * current `valid_from` (no late data behind the open interval; route
   * late events to a backfill rebuild instead).
   *
   * Only AFFECTED keys (those with new events) recompute, and only their
   * OPEN interval: the current row re-enters the run-builder as a seed
   * pseudo-event carrying its `n_events` weight (so an unchanged state
   * extends the run and the counts add up), closed rows and untouched
   * keys pass through by anti-/semi-join. At 100 TB that is the
   * difference between a micro-batch touching this hour's active keys
   * and re-sorting years of event log.
   */
  def scd2Merge(dim: DataFrame, newEvents: DataFrame, keyCol: String,
      stateCol: String, tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = newEvents.select(col(keyCol)).distinct()
    val untouched = dim.join(keys, Seq(keyCol), "left_anti")
    val affected = dim.join(keys, Seq(keyCol), "left_semi")
    val closed = affected.filter(!col("is_current"))
    val cur = affected.filter(col("is_current"))
      .select(col(keyCol), col("version").as("__v0"), col("status"),
        col("valid_from"), col("n_events"))
    val tieType = newEvents.schema(tieCol).dataType
    // seed sorts before any same-timestamp new event (__ord 0, null tie)
    val seed = cur.select(col(keyCol), col("status").as(stateCol),
      col("valid_from").as(tsCol), lit(null).cast(tieType).as(tieCol),
      col("n_events").as("__w"), lit(0).as("__ord"))
    val incoming = newEvents.select(col(keyCol), col(stateCol),
      col(tsCol), col(tieCol), lit(1L).as("__w"), lit(1).as("__ord"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__ord"), col(tieCol))
    val versioned = seed.unionByName(incoming)
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .withColumn("__local",
        sum(when(col("__prev").isNull ||
          col("__prev") =!= col(stateCol), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
    val runs = versioned.groupBy(col(keyCol), col("__local"))
      .agg(min(col(stateCol)).as("status"),
        min(col(tsCol)).as("valid_from"),
        sum(col("__w")).as("n_events"))
    // the seed run's local version 1 IS the existing current version
    val base = cur.select(col(keyCol), (col("__v0") - 1L).as("__base"))
    val wv = Window.partitionBy(keyCol).orderBy("version")
    val rebuilt = runs.join(base, Seq(keyCol), "left")
      .withColumn("version",
        col("__local") + coalesce(col("__base"), lit(0L)))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("version"), col("status"),
        col("valid_from"), col("valid_to"), col("is_current"),
        col("n_events"))
    untouched.unionByName(closed).unionByName(rebuilt)
  }
}
