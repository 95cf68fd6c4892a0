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

  /**
   * Hot-key diagnostic — the report you run over a join/aggregation key
   * BEFORE committing a 100 TB shuffle to it, to decide whether salting or
   * a skew-join hint is needed. Top-K keys by exact count, with the key's
   * share of all rows (parts-per-million) and its load relative to the
   * mean key (×1000; 1000 = perfectly uniform).
   *
   * Shape: one partial-agg groupBy (map-side combined), a 1-row global
   * aggregate broadcast back over the key counts, and a bounded top-K —
   * nothing driver-side, no window over the full key set. All arithmetic
   * is truncating int64 (`vs_mean_x1000` is derived from the already-
   * bounded `share_ppm`, keeping every product under 2^63 even at
   * trillion-row, trillion-key scale).
   *
   * Output: (key, n, share_ppm, vs_mean_x1000), ordered n desc then key.
   */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    val counts = df
      .groupBy(col(keyCol).cast(org.apache.spark.sql.types.StringType)
        .as("key"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("n"),
        IntMath.idiv(col("n") * lit(1000000L), col("total")).as("share_ppm"),
        col("n_keys"))
      .withColumn("vs_mean_x1000",
        IntMath.idiv(col("share_ppm") * col("n_keys"), lit(1000L)))
      .drop("n_keys")
      .orderBy(col("n").desc, col("key").asc)
      .limit(topK)
  }
}
