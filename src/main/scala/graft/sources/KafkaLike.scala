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

  /**
   * events table loader. The driver's parquet has carried `ts` as
   * TIMESTAMP(NANOS) in some testdata generations (Spark reads it as a
   * nanos BIGINT under `nanosAsLong`) and TIMESTAMP(MICROS) in others —
   * normalize on load to the canonical in-engine contract, epoch **nanos**
   * as BIGINT, so every downstream integer-DIV truncation stays exact
   * regardless of the file's physical type. NTZ values are interpreted in
   * the session timezone (UTC in every graft entrypoint), matching DuckDB's
   * naive-timestamp `epoch_ms`.
   */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (expected nanos BIGINT " +
          "or a timestamp)")
    }
  }

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

  /**
   * Real Kafka subscription config, mirroring the reference connector's
   * surface (reference: sink/src/main/.../CassandraSinkConnector.java:72-88
   * and dist/conf/cassandra-sink-standalone.properties.sample:33-36 —
   * `topics` / topic regex / starting offsets). Exactly one of `subscribe`
   * (comma-separated topic list) or `subscribePattern` (regex) must be set.
   */
  case class KafkaSubscription(
      bootstrapServers: String,
      subscribe: Option[String] = None,
      subscribePattern: Option[String] = None,
      startingOffsets: String = "earliest") {
    require(subscribe.isDefined ^ subscribePattern.isDefined,
      "exactly one of subscribe / subscribePattern must be set")
    require(startingOffsets == "earliest" || startingOffsets == "latest" ||
      startingOffsets.trim.startsWith("{"),
      s"startingOffsets must be earliest, latest, or a JSON offset map")
  }

  /**
   * The real `format("kafka")` wiring: builds a streaming reader with the
   * subscription options and normalizes its output to THE SAME column
   * contract as [[frame]] (key/value cast binary→string for the JSON
   * mapping path; headers stay array<struct<key,value:binary>>, which is
   * the typed-binary header route in RecordMapper). Everything downstream
   * — SinkPipeline.start, RecordMapper, the sink tables — is agnostic to
   * which source produced the frame.
   *
   * INERT IN THIS CONTAINER: there is no broker and no spark-sql-kafka jar,
   * so `.load()` fails with DATA_SOURCE_NOT_FOUND — the construction path
   * up to that boundary is what the spec covers. On a cluster with the
   * kafka connector on the classpath this method is the production entry.
   */
  def kafkaStream(spark: SparkSession, sub: KafkaSubscription): DataFrame = {
    val reader = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", sub.bootstrapServers)
      .option("startingOffsets", sub.startingOffsets)
      .option("includeHeaders", "true")
    val subscribed = sub.subscribe match {
      case Some(topics) => reader.option("subscribe", topics)
      case None => reader.option("subscribePattern", sub.subscribePattern.get)
    }
    subscribed.load().select(
      col("topic"), col("partition"), col("offset"),
      col("key").cast(StringType).as("key"),
      col("value").cast(StringType).as("value"),
      col("headers"),
      col("timestamp"))
  }
}
