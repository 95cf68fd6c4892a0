package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Kafka-source-shaped frames built from the deterministic `events` table —
 * the test/bench stand-in for `spark.read[Stream].format("kafka")`, exposing
 * the exact column contract of Spark's Kafka source (and of the reference's
 * record adapter: key / value / headers / timestamp / topic / partition /
 * offset, reference: sink/src/main/.../KafkaSinkRecordAdapter.java:38-75).
 *
 * In production this module is swapped for the real Kafka source; every
 * operator downstream only sees the column contract.
 */
object KafkaLike {

  val NumPartitions = 8

  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  /**
   * events → Kafka record frame:
   *   topic     = event_type
   *   partition = user_id % 8   (keyed partitioning, like a keyed producer)
   *   offset    = event_id
   *   key       = user_id as string
   *   value     = props JSON text
   *   headers   = [(h_etype, event_type), (h_uid, user_id)]
   *   timestamp = ts
   */
  def frame(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("event_type").as("topic"),
      (col("user_id") % NumPartitions).cast(IntegerType).as("partition"),
      col("event_id").as("offset"),
      col("user_id").cast(StringType).as("key"),
      col("props").as("value"),
      array(
        struct(lit("h_etype").as("key"), col("event_type").as("value")),
        struct(lit("h_uid").as("key"), col("user_id").cast(StringType).as("value"))
      ).as("headers"),
      // ts is read as a nanos BIGINT (spark.sql.legacy.parquet.nanosAsLong);
      // integer DIV keeps the µs truncation exact (no double rounding)
      expr("timestamp_micros(ts DIV 1000)").as("timestamp"))

  /**
   * Same frame, but records of topic `error` carry a null value — the
   * Kafka tombstone convention that drives the reference's delete inference
   * (reference: sink/src/it/.../DeleteCCMIT.java:39-82 — null value → DELETE).
   */
  def frameWithTombstones(spark: SparkSession, sfDir: String): DataFrame =
    frame(spark, sfDir).withColumn("value",
      when(col("topic") === "error", lit(null).cast(StringType))
        .otherwise(col("value")))
}
