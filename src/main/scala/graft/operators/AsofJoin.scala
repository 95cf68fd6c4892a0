package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * As-of join: for every left row, the single right row with the greatest
 * `timeCol` ≤ the left row's time, per join key — "the latest state known
 * at event time" (feature lookups, slowly-changing enrichment, trade/quote
 * alignment). Spark has no native as-of join; the standard workarounds are
 * a range join (quadratic blowup per key) or a per-key `collect_list` UDF
 * (memory-unbounded). Neither survives 100 TB.
 *
 * This one does, including under KEY SKEW. Tag both sides, UNION them, and
 * run a keyed window — `last(struct, ignoreNulls)` over rows ≤ current in
 * (time, side) order carries the most recent right row forward onto every
 * left row. A single window per key would put one hot key's ENTIRE history
 * (one symbol carrying most of a trade stream) into one task's sort, so
 * the window is TIME-SLICED instead, the same bucket-entropy idea as
 * [[RangeJoin.bucketed]]:
 *
 *   1. slice time into `nSlices` buckets (one cheap min/max agg picks the
 *      width; pass `sliceWidth` to skip that extra scan);
 *   2. per (key, slice), one partial-aggregated `max_by` finds the slice's
 *      LAST right row — map-side combined, so the full data shuffles once;
 *   3. a window over the (key, slice) AGGREGATE rows (≤ nSlices+1 rows per
 *      key, trivially small) carries each slice's boundary right-row into
 *      the next slice as a synthetic `__side = -1` row;
 *   4. the carry rows union back in and the as-of window runs per
 *      (key, slice) — a hot key's rows spread across `nSlices` tasks.
 *
 * Cost is O(|L| + |R|) shuffled bytes regardless of how many right rows
 * precede each left row, and the largest single task sort is ~1/nSlices of
 * the hottest key. The right row rides as ONE struct, so all joined values
 * come from the SAME matched row. A right row at exactly the left row's
 * timestamp is included (side order puts the right row first at equal
 * times; a carried boundary row's time is strictly before every row in any
 * later slice, so `__side = -1` never competes at equal true times) —
 * matching DuckDB's `ASOF JOIN ... ON l.t >= r.t`, which the oracle uses.
 *
 * `right` must be unique per (key, time) — pre-compact with
 * [[Upserts.lwwCompact]] or an aggregate if it is not; with duplicates the
 * surviving row at a tied timestamp would be partitioning-dependent.
 */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCols: Seq[String], nSlices: Int = 64,
      sliceWidth: Option[Double] = None): DataFrame = {
    val leftCols = left.columns
    val rStructType = struct(valueCols.map(col): _*)
    val lTagged = left
      .select(Seq(col("*"), lit(1).as("__side"),
        lit(null).cast(right.select(rStructType).schema.head.dataType)
          .as("__r")): _*)
    val rTagged = right
      .select(
        Seq(col(keyCol), col(timeCol), lit(0).as("__side"),
          rStructType.as("__r")) ++
          leftCols.filterNot(c => c == keyCol || c == timeCol)
            .map(c => lit(null).as(c)): _*)
    val unioned = lTagged.unionByName(rTagged)

    // slice width: caller-provided (origin 0), or derived from the observed
    // time range (one column-pruned min/max scan). Bucketing only needs a
    // MONOTONE map of time → slice, so the double cast is safe even where
    // it loses integer precision; ORDERING below always uses the original
    // typed time column.
    val (origin, width) = sliceWidth match {
      case Some(w) => (0.0, math.max(w, java.lang.Double.MIN_NORMAL))
      case None =>
        val mm = unioned
          .agg(min(col(timeCol).cast(DoubleType)),
            max(col(timeCol).cast(DoubleType))).head()
        if (mm.isNullAt(0)) (0.0, 1.0)
        else {
          val span = mm.getDouble(1) - mm.getDouble(0)
          (mm.getDouble(0), if (span > 0) span / nSlices else 1.0)
        }
    }
    val bucketed = unioned.withColumn("__tb",
      floor((col(timeCol).cast(DoubleType) - lit(origin)) / lit(width)))

    // stage 1: each (key, slice)'s last right row — partial-aggregated, so
    // the hot key's rows combine map-side; left rows have a null ordering
    // key and never win (groups with no right rows aggregate to null)
    val lastPerBucket = bucketed
      .groupBy(col(keyCol), col("__tb"))
      .agg(max_by(struct(col(timeCol).as("t"), col("__r").as("r")),
        when(col("__side") === 0, col(timeCol))).as("__last_r"))

    // carry each slice's boundary into all later slices: a window over the
    // AGGREGATE rows only (≤ slices-per-key rows, never the raw data)
    val wCarry = Window.partitionBy(col(keyCol)).orderBy(col("__tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = lastPerBucket
      .withColumn("__carry", last(col("__last_r"), ignoreNulls = true).over(wCarry))
      .filter(col("__carry").isNotNull)
      .select(
        Seq(col(keyCol), col("__carry.t").as(timeCol), lit(-1).as("__side"),
          col("__carry.r").as("__r"), col("__tb")) ++
          leftCols.filterNot(c => c == keyCol || c == timeCol)
            .map(c => lit(null).as(c)): _*)

    // stage 2: the as-of window, now per (key, slice) — carried boundary
    // rows sort first (their time is strictly before the slice's rows; at
    // a degenerate double-collision tie, __side -1 < 0 < 1 keeps carried <
    // genuine right < left, which still resolves to the true latest row)
    val w = Window.partitionBy(col(keyCol), col("__tb"))
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.unionByName(carries)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        valueCols.map(v => col(s"__asof.$v").as(s"asof_$v"))).toIndexedSeq: _*)
  }

  /**
   * FORWARD as-of join: for every left row, the single right row with the
   * SMALLEST `timeCol` ≥ the left row's time, per key — "the next state
   * change after the event" (next maintenance window, next price revision,
   * time-to-next-action labeling). Pure reuse: negate time on both sides,
   * run the backward [[asofJoin]] (greatest −t ≤ −t_l ⇔ smallest t ≥ t_l,
   * equal times still included), negate back — every scale property
   * (time-sliced windows, skew spreading, O(|L|+|R|) shuffle) carries over
   * verbatim. A `valueCols` entry equal to `timeCol` is re-negated in the
   * output so joined times read correctly.
   */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCols: Seq[String], nSlices: Int = 64,
      sliceWidth: Option[Double] = None): DataFrame = {
    def neg(df: DataFrame): DataFrame =
      df.withColumn(timeCol, -col(timeCol))
    val joined = asofJoin(neg(left), neg(right), keyCol, timeCol,
      valueCols, nSlices, sliceWidth)
      .withColumn(timeCol, -col(timeCol))
    if (valueCols.contains(timeCol))
      joined.withColumn(s"asof_$timeCol", -col(s"asof_$timeCol"))
    else joined
  }

  /**
   * NEAREST as-of join: for every left row, the right row minimizing
   * |t_r − t_l| per key, ties resolved BACKWARD (the earlier right row) —
   * sensor alignment, "closest reading to the event", nearest-snapshot
   * enrichment. Composed from one backward and one forward pass (both
   * inherit the time-sliced O(|L|+|R|) scale shape) stitched by
   * `idCol`, a unique left-row id; right rows must be unique per
   * (key, time) — pre-aggregate duplicates like q74 does, or the winner
   * among equal-time rows is undefined.
   *
   * Output: every left column, `asof_<v>` for each requested value
   * column (null when the key has no right rows at all), and `asof_dt` =
   * chosen t_r − t_l (≤ 0 when the backward match won).
   */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, idCol: String, valueCols: Seq[String],
      nSlices: Int = 64, sliceWidth: Option[Double] = None): DataFrame = {
    val vcs = (valueCols :+ timeCol).distinct
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col(idCol) +:
        vcs.map(v => col(s"asof_$v").as(s"__${tag}_$v")): _*)
    val b = side(asofJoin(left, right, keyCol, timeCol, vcs,
      nSlices, sliceWidth), "b")
    val f = side(asofJoinForward(left, right, keyCol, timeCol, vcs,
      nSlices, sliceWidth), "f")
    val db = col(timeCol) - col(s"__b_$timeCol") // ≥ 0, null if no match
    val df_ = col(s"__f_$timeCol") - col(timeCol)
    val useB = col(s"__f_$timeCol").isNull ||
      (col(s"__b_$timeCol").isNotNull && db <= df_)
    val leftCols = left.columns.toSeq
    left.join(b, Seq(idCol), "left").join(f, Seq(idCol), "left")
      .select(leftCols.map(col) ++
        vcs.map(v =>
          when(useB, col(s"__b_$v")).otherwise(col(s"__f_$v"))
            .as(s"asof_$v")) :+
        when(useB, -db).otherwise(df_).as("asof_dt"): _*)
  }
}
