package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for environment probes (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.selectExpr("ts", "ts DIV 1000000 AS ms", "timestamp_micros(ts DIV 1000) AS tstamp").show(3, false)
    spark.sql("SELECT aggregate(transform(split('abc',''), ch -> CAST(ascii(ch) AS BIGINT)), CAST(0 AS BIGINT), (acc, x) -> (acc*31 + x) % 2147483647) h").show()
    spark.sql("SELECT CAST(floor(CAST(0.123456 AS FLOAT)*1000d) AS BIGINT) q").show()
    import graft.functions.TimeUuid
    ev.limit(3).select(col("event_id"), TimeUuid.now_timeuuid().as("u1"), TimeUuid.now_timeuuid().as("u2")).show(false)
    spark.stop()
  }
}
