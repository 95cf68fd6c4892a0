package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Empty/degenerate-input contracts of the round-7 report operators: a
  * 100 TB pipeline hits empty partitions-of-the-day and single-class
  * slices constantly — each operator must either produce a sane empty/zero
  * report or refuse loudly, never emit nulls or divide-by-zero garbage. */
class EdgeCasesSpec extends SparkSuite {

  private lazy val s = sqlc

  private def longs(name: String, vs: Long*) = {
    val l = new java.util.ArrayList[Row]()
    vs.foreach(v => l.add(Row(v)))
    s.createDataFrame(l, StructType(Seq(StructField(name, LongType))))
  }

  private val emptyLV = {
    val l = new java.util.ArrayList[Row]()
    s.createDataFrame(l, StructType(Seq(
      StructField("lbl", StringType), StructField("v", LongType))))
  }

  test("histDriftReport: an empty side reports zero fractions, not nulls") {
    val out = Stats.histDriftReport(longs("v", 1L, 2L), longs("v"), "v")
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => !r.anyNull))
    // empty side: c_b = 0 everywhere, frac_b 0, delta = frac_a
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("benfordReport: no positive values still yields the 9-digit frame") {
    val out = Stats.benfordReport(longs("v", 0L, -3L), "v").collect()
    assert(out.length == 9)
    assert(out.forall(r => !r.anyNull))
    assert(out.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
  }

  test("joinAudit: an empty right side recommends broadcast, zero output") {
    val r = Stats.joinAudit(longs("k", 1L, 2L), longs("k"), "k").head()
    assert(!r.anyNull)
    assert(r.getLong(5) == 0L)               // est_output_rows
    assert(r.getString(9) == "broadcast_right")
  }

  test("rocAucReport: a single-class frame reports no rows (not garbage)") {
    val l = new java.util.ArrayList[Row]()
    Seq(1L, 2L, 3L).foreach(v => l.add(Row("only", v)))
    val df = s.createDataFrame(l, StructType(Seq(
      StructField("lbl", StringType), StructField("v", LongType))))
    assert(Stats.rocAucReport(df, "lbl", "v").count() == 0L)
  }

  test("temperatureWeights / classBalanceReport: empty input → empty report") {
    assert(Sampling.temperatureWeights(emptyLV, "lbl", 500).count() == 0L)
    assert(Stats.classBalanceReport(emptyLV, "lbl").count() == 0L)
  }

  test("empty-refusing operators refuse loudly, not wrongly") {
    intercept[IllegalArgumentException] {
      Stats.globalRank(longs("v"), "v", "v")
    }
    intercept[IllegalArgumentException] {
      graft.streaming.EventTimeOps.cusumReport(
        emptyLV.withColumn("ts", col("v")).withColumn("id", col("v")),
        "lbl", "ts", "id", "v")
    }
  }

  test("savingsReport / clusterSizeHistogram: empty corpus → empty report") {
    val empty = s.createDataFrame(new java.util.ArrayList[Row](),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("src", StringType))))
    assert(Dedup.savingsReport(empty, "text", "doc_id", "src").count() == 0L)
    assert(Dedup.clusterSizeHistogram(empty, "text", "doc_id").count() == 0L)
  }
}
