package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed EXACT statistics. Spark's `percentile_approx` answers fast but
 * differently on every partitioning — useless for an oracle or a
 * reproducible data card. These are exact and deterministic: quantile =
 * value at rank ⌈n·q/100⌉ in sorted order (percentile_disc semantics),
 * computed with a KEYED window (one sort per class, classes in parallel)
 * plus one partial-agg pick — no global sort, no approx sketch. Ranks are
 * pure integer arithmetic, so any engine reproduces them bit-for-bit.
 */
object Stats {

  /** One row per class: `p<q>` columns for each requested integer percent
    * (e.g. Seq(50, 90, 99)), over an integer value column. */
  def groupQuantiles(df: DataFrame, classCol: String, valueCol: String,
      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(q => q >= 1 && q <= 100),
      "percents must be integers in [1, 100]")
    val w = Window.partitionBy(col(classCol)).orderBy(col(valueCol))
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(classCol))))
    // rank ⌈n·q/100⌉ = (n·q + 99) DIV 100; ties among equal values permute
    // only equal values, so the picked value is partitioning-independent
    val picks = percents.map(q =>
      max(when(col("__rn") === expr(s"(__n * $q + 99) DIV 100"),
        col(valueCol))).as(s"p$q"))
    ranked.groupBy(col(classCol))
      .agg(picks.head, picks.tail: _*)
  }
}
