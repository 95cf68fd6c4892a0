package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite

class TwsOpsSpec extends SparkSuite {

  private lazy val s = sqlc
  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("ts", TimestampType)))

  private def write(dir: String, rows: (String, Long)*): Unit = {
    val l = new java.util.ArrayList[Row]()
    rows.foreach { case (k, sec) =>
      l.add(Row(k, new java.sql.Timestamp(sec * 1000L))) }
    s.createDataFrame(l, schema).coalesce(1).write.parquet(dir)
  }

  test("transformWithState sessionizer: watermark-driven closes, " +
      "re-armed timers, replay-deterministic extents") {
    val src = Files.createTempDirectory("graft-tws-src").toString
    val ckpt = Files.createTempDirectory("graft-tws-ckpt").toString
    // u's first session [1s, 2s] (gap 5s → closes at 7s), v's [3s, 3s];
    // the 60s event re-arms u with a NEW session; far-future rows advance
    // the watermark so earlier timers fire in subsequent batches
    write(src + "/f1", ("u", 1L), ("u", 2L), ("v", 3L))
    write(src + "/f2", ("u", 60L))
    write(src + "/f3", ("u", 1000L))
    write(src + "/f4", ("u", 2000L))
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src + "/*")
      val q = TwsOps.sessionizeTws(stream, "k", "ts", gapMs = 5000L,
          delay = "0 seconds")
        .writeStream.outputMode("append")
        .format("memory").queryName("tws_out")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val got = s.table("tws_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      // u's sessions 1–3 close on the DATA path (each next event proves
      // the gap); v's lone session closes on the TIMER path once the
      // watermark passes 8s; u's 2000s session stays open at stream end
      // (watermark never passes its close) — exactly four emissions
      assert(got.sorted == Seq(
        ("u", 1000L, 2000L, 2L),
        ("u", 60000L, 60000L, 1L),
        ("u", 1000000L, 1000000L, 1L),
        ("v", 3000L, 3000L, 1L)).sorted, s"sessions: $got")
    } finally {
      prev match {
        case Some(p) =>
          s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
