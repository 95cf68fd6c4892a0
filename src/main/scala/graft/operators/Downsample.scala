package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * LTOB (Largest-Triangle-One-Bucket) time-series downsampling: per key,
 * points are ranked by time, split into fixed-size buckets, and each
 * bucket keeps the point with the largest doubled triangle area against
 * its immediate neighbors — the standard perceptual downsampler for
 * plotting/alerting pipelines (Steinarsson's thesis family; the
 * one-bucket variant is chosen over LTTB because its effective area uses
 * only lag/lead, so it parallelizes as plain windows with NO sequential
 * dependency between buckets).
 *
 * Series endpoints are always kept (their area is undefined → sentinel
 * −1, they enter via the rank-1/rank-n rule like LTOB prescribes). Area
 * is exact int64: `|(x₋−x)(y₊−y) − (x₊−x)(y₋−y)|` over (ms, milli-value)
 * — no FP, oracle-reproducible.
 *
 * Scale: all windows partition by the series key; a key's series sorts
 * within its partition only (the usual per-key time-series contract, same
 * as [[graft.streaming.EventTimeOps]]); cross-key parallelism is free.
 */
object Downsample {

  /**
   * @param df      input
   * @param keyCol  series key
   * @param tsCol   epoch-millis long timestamp (caller normalizes units)
   * @param valCol  value, already integer-quantized by the caller
   * @param idCol   unique row id for deterministic tie-breaks
   * @param bucket  points per bucket
   */
  def ltob(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      idCol: String, bucket: Int): DataFrame = {
    require(bucket >= 2, "bucket must be >= 2")
    val s = df.select(col(keyCol).as("grp"),
        col(tsCol).cast(LongType).as("x"),
        col(valCol).cast(LongType).as("y"), col(idCol).as("rid"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("x"), col("rid"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("grp"))))
    val wRn = Window.partitionBy(col("grp")).orderBy(col("rn"))
    val a = s
      .withColumn("px", lag(col("x"), 1).over(wRn))
      .withColumn("py", lag(col("y"), 1).over(wRn))
      .withColumn("nx", lead(col("x"), 1).over(wRn))
      .withColumn("ny", lead(col("y"), 1).over(wRn))
      .withColumn("bucket", IntMath.idiv(col("rn") - 1, lit(bucket.toLong)))
      .withColumn("area2",
        when(col("px").isNull || col("nx").isNull, lit(-1L))
          .otherwise(abs((col("px") - col("x")) * (col("ny") - col("y")) -
            (col("nx") - col("x")) * (col("py") - col("y")))))
    val wPick = Window.partitionBy(col("grp"), col("bucket"))
      .orderBy(col("area2").desc, col("rid").asc)
    a.withColumn("pr", row_number().over(wPick))
      .filter(col("pr") === 1 || col("rn") === 1 || col("rn") === col("n"))
      .select(col("grp"), col("bucket").cast(LongType).as("bucket"),
        col("rid"), col("x").as("ts_ms"), col("y").as("v_milli"),
        col("area2").cast(LongType).as("area2"))
      .orderBy("grp", "bucket", "rid")
  }
}
