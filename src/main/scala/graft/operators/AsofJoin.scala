package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row, the single right row with the greatest
 * `timeCol` ≤ the left row's time, per join key — "the latest state known
 * at event time" (feature lookups, slowly-changing enrichment, trade/quote
 * alignment). Spark has no native as-of join; the standard workarounds are
 * a range join (quadratic blowup per key) or a per-key `collect_list` UDF
 * (memory-unbounded). Neither survives 100 TB.
 *
 * This one does: tag both sides, UNION them, and run ONE keyed window —
 * `last(struct, ignoreNulls)` over rows ≤ current in (time, side) order
 * carries the most recent right row forward onto every left row. One
 * shuffle on the join key, a keyed sort within partitions, no fan-out:
 * cost is O(|L| + |R|) shuffled bytes regardless of how many right rows
 * precede each left row. The right row rides as ONE struct, so all joined
 * values come from the SAME matched row. A right row at exactly the left
 * row's timestamp is included (side order puts the right row first at
 * equal times) — matching DuckDB's `ASOF JOIN ... ON l.t >= r.t`, which
 * the oracle uses.
 *
 * `right` must be unique per (key, time) — pre-compact with
 * [[Upserts.lwwCompact]] or an aggregate if it is not; with duplicates the
 * surviving row at a tied timestamp would be partitioning-dependent.
 */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCols: Seq[String]): DataFrame = {
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
    // right row sorts BEFORE a left row at the same (key, time): equal
    // timestamps match, per ASOF `>=` semantics
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col(s"__asof.$v").as(s"asof_$v")): _*)
  }
}
