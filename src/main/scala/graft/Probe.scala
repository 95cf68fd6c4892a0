package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan-hygiene check: prints formatted plans for the load-bearing queries so
  * pushdown / broadcast / codegen can be audited (not part of the library). */
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
    val dir = "/root/testdata/sf0.001"
    def show(name: String): Unit = {
      println(s"\n======== $name ========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    Seq("q20_tpch_q1", "q21_join_enrich", "q23_dedup_exact",
      "q24_minhash_signatures", "q32_jaccard_pairs", "q02_map_json_fields")
      .foreach(show)
    spark.stop()
  }
}
