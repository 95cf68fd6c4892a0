package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite

class StreamingDedupSpec extends SparkSuite {

  private lazy val s = sqlc
  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def write(dir: String, rows: (Long, String)*): Unit = {
    val l = new java.util.ArrayList[Row]()
    rows.foreach { case (id, t) => l.add(Row(id, t)) }
    s.createDataFrame(l, schema).coalesce(1).write.parquet(dir)
  }

  test("streaming dedup emits first-seen docs once across micro-batches") {
    import s.implicits._
    val src = Files.createTempDirectory("graft-sd-src").toString
    val ckpt = Files.createTempDirectory("graft-sd-ckpt").toString
    // batch 1: two copies of "aaa" (min id wins) + one "bbb"
    write(src + "/f1", (2L, "aaa"), (1L, "aaa"), (3L, "bbb"))
    // batch 2: a late "aaa" copy (dropped — hash already in state) + new "ccc"
    write(src + "/f2", (4L, "aaa"), (5L, "ccc"))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src + "/*")
    val q = StreamingDedup.dedupStream(stream, "text", "doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("sd_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = s.table("sd_out").collect()
      .map(r => r.getAs[Long]("docId")).sorted
    // one winner per distinct text; doc 4's "aaa" never re-emits
    assert(out.toSeq == Seq(1L, 3L, 5L))
  }

  test("streaming and batch exact dedup keep the same documents") {
    val l = new java.util.ArrayList[Row]()
    Seq((2L, "x y z"), (9L, "x y z"), (5L, "q"), (7L, "q"), (8L, "solo"))
      .foreach { case (id, t) => l.add(Row(id, t)) }
    val df = s.createDataFrame(l, schema)
    val batchKept = graft.operators.Dedup.exact(df, "text", "doc_id")
      .collect().map(_.getAs[Long]("keep_id")).sorted
    // firstSeen on a bounded stream of one batch ≡ batch exact dedup
    import s.implicits._
    val streamed = StreamingDedup.firstSeen(
      df.select(col("doc_id").as("docId"),
        StreamingDedup.contentHash(col("text")).as("h"))
        .as[StreamingDedup.HashedDoc])
    // flatMapGroupsWithState on a batch Dataset runs as a plain groupBy
    val streamKept = streamed.collect().map(_.docId).sorted
    assert(streamKept.toSeq == batchKept.toSeq)
    assert(batchKept.toSeq == Seq(2L, 5L, 8L))
  }
}
