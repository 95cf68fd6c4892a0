package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan-hygiene check: prints formatted plans for the load-bearing paths so
  * pushdown / broadcast / codegen / shuffle shape can be audited. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.001")

    println("======== merge path (state ⋈ batch on pk) ========")
    SparkEntry.entry(spark).explain("formatted")

    println("======== minhash signatures ========")
    SparkEntry.queries("q24_minhash_signatures")(spark, dir).explain("formatted")

    println("======== ingest pipeline scale probe ========")
    // union the events table 10× to measure sustained mapped-ingest rate
    val base = graft.sources.KafkaLike.frameWithTombstones(spark, dir)
    val big = (1 to 10).map(_ => base).reduce(_ unionByName _)
    val b = graft.mapping.SinkConfig.parse(Map(
      "topic.purchase.ks1.t.mapping" -> "my_pk=key, my_value=value.k")).bindings.head
    val table = graft.sink.SinkTable("ks1", "t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("my_pk", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("my_value", org.apache.spark.sql.types.LongType))),
      Seq("my_pk"))
    val mapped = operators.RecordMapper.compile(b, table, big)
    val n = big.count()
    val t0 = System.nanoTime()
    operators.Upserts.lwwCompact(mapped, Seq("my_pk"),
      Seq(col(operators.RecordMapper.WritetimeCol)))
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"scale probe: $n records in $sec%.2f s = ${n / sec}%.0f rec/s")
    spark.stop()
  }
}
