package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite
import EventTimeOps._

class EventTimeOpsSpec extends SparkSuite {

  private lazy val s = sqlc

  private val schema = StructType(Seq(
    StructField("topic", StringType), StructField("offset", LongType),
    StructField("key", StringType), StructField("timestamp", TimestampType)))

  private def events(rows: (String, Long, String, Long)*) = {
    val l = new java.util.ArrayList[Row]()
    rows.foreach { case (t, o, k, ms) =>
      l.add(Row(t, o, k, java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(ms))))
    }
    s.createDataFrame(l, schema)
  }

  test("batch tumbling buckets are exact integer floors") {
    val df = events(
      ("a", 0L, "u", 0L), ("a", 1L, "u", 3599999L), // bucket 0
      ("a", 2L, "u", 3600000L),                      // bucket 1
      ("b", 3L, "u", 7200001L))                      // bucket 2
    val out = tumblingCounts(df, 3600000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(out.toSeq == Seq((0L, "a", 2L), (3600000L, "a", 1L), (7200000L, "b", 1L)))
  }

  test("sliding windows: each event lands in exactly width/slide windows") {
    // width 1000, slide 500 → 2 windows per event
    val df = events(
      ("a", 0L, "u", 0L),     // windows -500, 0
      ("a", 1L, "u", 499L),   // windows -500, 0
      ("a", 2L, "u", 500L),   // windows 0, 500
      ("b", 3L, "u", 1700L))  // windows 1000, 1500
    val out = slidingCounts(df, 1000L, 500L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    assert(out.toSeq == Seq((-500L, "a", 2L), (0L, "a", 3L),
      (500L, "a", 1L), (1000L, "b", 1L), (1500L, "b", 1L)))
    // width == slide degenerates to tumbling
    val tum = slidingCounts(df, 1000L, 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val ref = tumblingCounts(df, 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(tum == ref)
    intercept[IllegalArgumentException] { slidingCounts(df, 1000L, 300L) }
  }

  test("batch sessionization splits on gaps > threshold") {
    val df = events(
      ("a", 0L, "u1", 1000L), ("a", 1L, "u1", 2000L),   // session 1
      ("a", 2L, "u1", 4000000L),                         // session 2 (gap > 30min)
      ("a", 3L, "u2", 500L))                             // other key
    val out = sessionize(df, 1800000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(out.toSeq == Seq(("u1", 1L, 2L), ("u1", 2L, 1L), ("u2", 1L, 1L)))
  }

  test("streaming watermarked tumbling window over a file stream") {
    val src = Files.createTempDirectory("graft-et-src").toString
    val ckpt = Files.createTempDirectory("graft-et-ckpt").toString
    events(("a", 0L, "u", 0L), ("a", 1L, "u", 1000L), ("b", 2L, "u", 3600000L))
      .write.mode("overwrite").parquet(src)
    val stream = s.readStream.schema(schema).parquet(src)
    val q = tumblingCountsStreaming(stream, "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("et_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = s.table("et_out").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((0L, "a", 2L), (3600000L, "b", 1L)))
  }

  test("funnel: strictly-after steps, ties excluded, monotone counts") {
    import s.implicits._
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "view"), (2L, 5L, "click"),          // click before view
      (3L, 10L, "view"), (3L, 10L, "click"),         // tie: not strictly after
      (3L, 50L, "purchase"),
      (4L, 1L, "click"), (4L, 2L, "purchase"))       // never viewed
      .toDF("user_id", "ts", "event_type")
    val out = funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1, "view", 3L), (2, "click", 1L),
      (3, "purchase", 1L)))
  }

  test("rolling agg: trailing range frame, tie rows share the frame") {
    import s.implicits._
    val ev = Seq(
      ("a", 0L, 1L), ("a", 1000L, 2L), ("a", 3600000L, 3L),
      ("a", 3600500L, 4L), ("a", 7300000L, 5L),
      ("b", 100L, 10L), ("b", 100L, 20L))
      .toDF("k", "ts", "v")
    val out = rollingAgg(ev, "k", "ts", "v", windowMs = 3600000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(out(("a", 0L, 1L)) == ((1L, 1L)))
    assert(out(("a", 1000L, 2L)) == ((2L, 3L)))
    assert(out(("a", 3600000L, 3L)) == ((3L, 6L)))   // 0 is in-range
    assert(out(("a", 3600500L, 4L)) == ((3L, 9L)))   // 0 aged out
    assert(out(("a", 7300000L, 5L)) == ((1L, 5L)))
    assert(out(("b", 100L, 10L)) == ((2L, 30L)))     // RANGE: ties share
    assert(out(("b", 100L, 20L)) == ((2L, 30L)))
  }

  test("cohort retention: first-week cohorts, distinct weekly activity") {
    import s.implicits._
    val W = 604800000L
    val ev = Seq((1L, 0L * W + 5), (1L, 1L * W + 9), (1L, 3L * W + 1),
      (2L, 1L * W + 2), (2L, 1L * W + 7), (2L, 2L * W + 3),
      (3L, 0L * W + 8)).toDF("user_id", "ts_ms")
    val out = cohortRetention(ev, "user_id", "ts_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("transition matrix: id tie-break order, row-normalized ppm") {
    import s.implicits._
    val ev = Seq(
      ("u", 1L, 1L, "v"), ("u", 2L, 2L, "c"), ("u", 2L, 3L, "p"),
      ("u", 5L, 4L, "v"),   // ties at ts=2 order by id: c then p
      ("w", 1L, 5L, "v"), ("w", 2L, 6L, "p"))
      .toDF("k", "ts", "id", "et")
    val out = transitionMatrix(ev, "k", "ts", "id", "et")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      ("v", "c") -> ((1L, 500000L)), ("v", "p") -> ((1L, 500000L)),
      ("c", "p") -> ((1L, 1000000L)), ("p", "v") -> ((1L, 1000000L))))
  }

  test("decayed counts: shift-exact halving, future clamp, max half-lives") {
    import s.implicits._
    val ev = Seq(("u", 100L), ("u", 90L), ("u", 85L), ("u", 0L),
      ("u", 150L)).toDF("k", "ts")
    val out = decayedCounts(ev, "k", "ts", nowMs = 100L, halfLifeMs = 10L)
      .collect().head
    // 2^20 + 2^19 + 2^19 + (2^20 >> 10) + 2^20 (future age clamps to 0)
    assert((out.getLong(1), out.getLong(2)) == ((5L, 3146752L)))
    val capped = decayedCounts(ev.filter(col("ts") === 0L), "k", "ts",
      nowMs = 100L, halfLifeMs = 10L, maxHalfLives = 3)
      .collect().head
    assert(capped.getLong(2) == 131072L)  // min(10, 3) shifts
  }

  test("streaming sessionization closes sessions across batches, keeps last open") {
    import s.implicits._
    val src = Files.createTempDirectory("graft-ss-src").toString
    val ckpt = Files.createTempDirectory("graft-ss-ckpt").toString
    // one file = one batch under AvailableNow with maxFilesPerTrigger
    events(("a", 0L, "u1", 1000L), ("a", 1L, "u1", 2000L), ("a", 2L, "u1", 4000000L))
      .coalesce(1).write.parquet(src + "/f1")
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src + "/*")
    val sess = sessionizeStreaming(
      stream.select(col("key"), unix_millis(col("timestamp")).as("ms"))
        .as[SessionEvent], 1800000L)
    val q = sess.writeStream.outputMode("append")
      .format("memory").queryName("ss_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val closed = s.table("ss_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // first session (1000..2000, n=2) closed by the 4000000 event; the
    // 4000000 session stays open in state
    assert(closed.toSeq == Seq(("u1", 1000L, 2000L, 2L)))
  }

  test("streaming SCD2: runs close across batches, open run survives") {
    import s.implicits._
    val src = Files.createTempDirectory("graft-si-src").toString
    val ckpt = Files.createTempDirectory("graft-si-ckpt").toString
    // batch 1: a,a then b → run a closes at b's start; batch 2: a →
    // run b (carried in STATE across the batch boundary) closes at 4000
    events(("a", 0L, "u1", 1000L), ("a", 1L, "u1", 2000L),
      ("b", 2L, "u1", 3000L)).coalesce(1).write.parquet(src + "/f1")
    events(("a", 3L, "u1", 4000L)).coalesce(1).write.parquet(src + "/f2")
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src + "/*")
    val runs = statusIntervalsStreaming(
      stream.select(col("key"), unix_millis(col("timestamp")).as("ms"),
        col("topic").as("status")).as[StatusEvent])
    val q = runs.writeStream.outputMode("append")
      .format("memory").queryName("si_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val closed = s.table("si_out").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._3)
    assert(closed.toSeq == Seq(
      ("u1", "a", 1000L, 3000L, 2L), ("u1", "b", 3000L, 4000L, 1L)))
  }

  test("funnelWindowed: the gap bound drops late conversions") {
    import s.implicits._
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"),      // in-window chain
      (2L, 10L, "view"), (2L, 5000L, "click"),    // click too late
      (3L, 10L, "view"))
      .toDF("user_id", "ts", "event_type")
    val out = EventTimeOps.funnelWindowed(ev, "user_id", "ts",
      "event_type", Seq("view", "click"), maxGapMs = 100L)
      .collect().map(r => (r.getInt(0), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1, 3L), (2, 1L))) // plain funnel would say 2
  }

  test("rateChangeReport: day-over-day ratios with gap carry") {
    val schema2 = StructType(Seq(
      StructField("k", StringType), StructField("ts_ms", LongType)))
    val l = new java.util.ArrayList[Row]()
    val day = 86400000L
    // day 1: 2 events, day 2: 4, day 4: 2 (day 3 silent)
    Seq(day + 1, day + 2, 2 * day + 1, 2 * day + 2, 2 * day + 3,
      2 * day + 4, 4 * day + 1, 4 * day + 2)
      .foreach(t => l.add(Row("u", t)))
    val out = EventTimeOps.rateChangeReport(
      s.createDataFrame(l, schema2), "k", "ts_ms")
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == (2L, 0L, 0L))       // first observation
    assert(out(2L) == (4L, 2L, 2000L))    // doubled
    assert(out(4L) == (2L, 4L, 500L))     // vs previous ACTIVE day
  }

  test("churnLabels: horizon cutoff from the corpus max") {
    val schema2 = StructType(Seq(
      StructField("k", StringType), StructField("ts", LongType)))
    val l = new java.util.ArrayList[Row]()
    Seq(("a", 10L), ("a", 60L), ("b", 80L), ("b", 100L))
      .foreach { case (k, t) => l.add(Row(k, t)) }
    val out = EventTimeOps.churnLabels(
      s.createDataFrame(l, schema2), "k", "ts", horizonMs = 30L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // cutoff = 100 − 30 = 70: a's last activity 60 < 70 → churned
    assert(out("a") == (2L, 60L, true))
    assert(out("b") == (2L, 100L, false))
  }

  test("streamIntervalJoin: watermarked lookback join matches the batch") {
    val srcL = Files.createTempDirectory("graft-ssj-l").toString
    val srcR = Files.createTempDirectory("graft-ssj-r").toString
    val ckpt = Files.createTempDirectory("graft-ssj-ckpt").toString
    val ls = StructType(Seq(StructField("k", StringType),
      StructField("lid", LongType), StructField("lts", TimestampType)))
    val rs = StructType(Seq(StructField("k", StringType),
      StructField("rid", LongType), StructField("rts", TimestampType)))
    def ts(ms: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(ms))
    val ll = new java.util.ArrayList[Row]()
    ll.add(Row("u", 1L, ts(5000L))); ll.add(Row("u", 2L, ts(20000L)))
    val rl = new java.util.ArrayList[Row]()
    Seq(Row("u", 10L, ts(1000L)), Row("u", 11L, ts(5000L)),
      Row("u", 12L, ts(19000L)), Row("v", 13L, ts(5000L)))
      .foreach(rl.add)
    s.createDataFrame(ll, ls).write.mode("overwrite").parquet(srcL)
    s.createDataFrame(rl, rs).write.mode("overwrite").parquet(srcR)
    val q = EventTimeOps.streamIntervalJoin(
      s.readStream.schema(ls).parquet(srcL),
      s.readStream.schema(rs).parquet(srcR),
      "k", "lts", "rts", lookbackMs = 4000L, watermark = "0 seconds")
      .select("lid", "rid")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = s.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // left 1 @5s looks back to 1s: rts 1000 (exactly at bound) + 5000
    // (tie) match, key v does not; left 2 @20s catches only 19000
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 12L)))
  }

  test("streamIntervalJoin leftOuter: unmatched left rows emit final nulls") {
    val srcL = Files.createTempDirectory("graft-ssjo-l").toString
    val srcR = Files.createTempDirectory("graft-ssjo-r").toString
    val ckpt = Files.createTempDirectory("graft-ssjo-ckpt").toString
    val ls = StructType(Seq(StructField("k", StringType),
      StructField("lid", LongType), StructField("lts", TimestampType)))
    val rs = StructType(Seq(StructField("k", StringType),
      StructField("rid", LongType), StructField("rts", TimestampType)))
    def ts(ms: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(ms))
    def writeL(dir: String, rows: Row*): Unit = {
      val l = new java.util.ArrayList[Row](); rows.foreach(l.add)
      s.createDataFrame(l, ls).coalesce(1).write.parquet(dir)
    }
    def writeR(dir: String, rows: Row*): Unit = {
      val l = new java.util.ArrayList[Row](); rows.foreach(l.add)
      s.createDataFrame(l, rs).coalesce(1).write.parquet(dir)
    }
    // batch 1: lid 1 matches rid 11; lid 2's window [16s, 20s] has no
    // right rows. Watermark after b1 = min(20s, 5s) = 5s.
    writeL(srcL + "/f1", Row("u", 1L, ts(5000L)), Row("u", 2L, ts(20000L)))
    writeR(srcR + "/f1", Row("u", 11L, ts(5000L)))
    // batch 2: far-future rows on BOTH sides (global watermark is the MIN
    // across inputs) push the watermark past lid 2's window
    writeL(srcL + "/f2", Row("u", 3L, ts(500000L)))
    writeR(srcR + "/f2", Row("x", 99L, ts(500000L)))
    // batch 3: one more left row so a batch runs UNDER the advanced
    // watermark — that is when closed-window unmatched state flushes
    writeL(srcL + "/f3", Row("u", 4L, ts(501000L)))
    val q = EventTimeOps.streamIntervalJoin(
      s.readStream.schema(ls).option("maxFilesPerTrigger", "1")
        .parquet(srcL + "/*"),
      s.readStream.schema(rs).option("maxFilesPerTrigger", "1")
        .parquet(srcR + "/*"),
      "k", "lts", "rts", lookbackMs = 4000L, watermark = "0 seconds",
      joinType = "leftOuter")
      .select("lid", "rid")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssjo_out").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = s.table("ssjo_out").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    // lid 2 emits exactly once, with a FINAL null right side (its window
    // closed under the watermark, so the null cannot be retracted)
    assert(got.contains((1L, Some(11L))))
    assert(got.contains((2L, None)))
    assert(got.count(_._1 == 2L) == 1)
  }

  test("attribution: last-touch asof + first-touch-in-window, nulls kept") {
    val schema2 = StructType(Seq(
      StructField("k", StringType), StructField("ts", LongType),
      StructField("id", LongType)))
    def f(rows: (String, Long, Long)*) = {
      val l = new java.util.ArrayList[Row]()
      rows.foreach { case (k, t, i) => l.add(Row(k, t, i)) }
      s.createDataFrame(l, schema2)
    }
    val convs = f(("u", 50L, 1L), ("u", 9L, 2L))
    val touches = f(("u", 10L, 100L), ("u", 50L, 101L))
    val out = EventTimeOps.attribution(convs, touches, "k", "ts", "id",
      windowMs = 30L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    // conv 1 @50: last = touch 101 (tie at 50 inclusive); window [20, 50]
    // holds only ts 50 → first = 101. conv 2 @9: nothing at or before.
    assert(out(1L) == (101L, 101L))
    assert(out(2L) == (-1L, -1L))
  }

  test("sessionStats: per-key session shape over the gap sessionizer") {
    val df = events(
      ("a", 0L, "u1", 1000L), ("a", 1L, "u1", 2000L),   // session 1 (1s span)
      ("a", 2L, "u1", 4000000L),                         // session 2 (0 span)
      ("a", 3L, "u2", 500L))
    val out = EventTimeOps.sessionStats(df, 1800000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("u1") == (2L, 3L, 2L, 500L)) // (1000+0) DIV 2 sessions
    assert(out("u2") == (1L, 1L, 1L, 0L))
  }

  test("behaviorEntropy: qlog2-exact transition entropy; constant key = 0") {
    val schema2 = StructType(Seq(
      StructField("k", StringType), StructField("ts", LongType),
      StructField("id", LongType), StructField("t", StringType)))
    val l = new java.util.ArrayList[Row]()
    // u1: a b a b → transitions ab, ba, ab (c={ab:2, ba:1}, n=3)
    Seq(("u1", 1L, 1L, "a"), ("u1", 2L, 2L, "b"),
      ("u1", 3L, 3L, "a"), ("u1", 4L, 4L, "b"),
      // u2: a a a → one transition kind, entropy 0
      ("u2", 1L, 5L, "a"), ("u2", 2L, 6L, "a"), ("u2", 3L, 7L, "a"))
      .foreach { case (k, t, i, e) => l.add(Row(k, t, i, e)) }
    val out = EventTimeOps.behaviorEntropy(s.createDataFrame(l, schema2),
      "k", "ts", "id", "t")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // qlog2(3)=1536, qlog2(2)=1024, qlog2(1)=0 →
    // (2·512 + 1·1536) DIV 3 = 853
    assert(out("u1") == (3L, 2L, 853L))
    assert(out("u2") == (2L, 1L, 0L))
  }

  test("windowedHllSketchStreaming: registers equal the batch sketch") {
    val src = Files.createTempDirectory("graft-hll-src").toString
    val ckpt = Files.createTempDirectory("graft-hll-ckpt").toString
    val schema2 = StructType(Seq(
      StructField("ts", TimestampType), StructField("h", LongType)))
    val l = new java.util.ArrayList[Row]()
    (1L to 300L).foreach { i =>
      val ms = if (i % 2 == 0) 1000L else 3600000L + 1000L // two windows
      l.add(Row(java.sql.Timestamp.from(
        java.time.Instant.ofEpochMilli(ms)), i * 104729L))
    }
    val batch = s.createDataFrame(l, schema2)
    batch.write.mode("overwrite").parquet(src)
    val q = EventTimeOps.windowedHllSketchStreaming(
      s.readStream.schema(schema2).parquet(src), "ts", "h",
      width = "1 hour", watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("hll_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = s.table("hll_out").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2)))
      .toSet
    val expected = graft.operators.Stats.hllSketch(
      batch.withColumn("w", graft.operators.IntMath.idiv(
        unix_millis(col("ts")), lit(3600000L)) * 3600000L),
      "w", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // append mode emits a window only once the watermark passes its end:
    // the final watermark (max event time) closes window 0 but leaves the
    // second window open in state — exactly-once, never partial
    assert(streamed == expected.filter(_._1 == 0L)) // register-exact
    assert(streamed.nonEmpty)
    assert(!streamed.exists(_._1 == 3600000L))
  }

  test("temporalProfile: integer epoch dow/hour and class shares") {
    val schema = StructType(Seq(
      StructField("cls", StringType), StructField("ts_ms", LongType)))
    val l = new java.util.ArrayList[Row]()
    // epoch 0 = Thursday 00:00 UTC → dow 4, hour 0
    Seq(("a", 0L), ("a", 3600000L), ("a", 3600000L + 1L),
      ("b", 86400000L * 3L)) // +3 days → Sunday → dow 0
      .foreach { case (c, t) => l.add(Row(c, t)) }
    val out = EventTimeOps.temporalProfile(
      s.createDataFrame(l, schema), "ts_ms", "cls")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(out(("a", 4L, 0L)) == (1L, 333333L))
    assert(out(("a", 4L, 1L)) == (2L, 666666L))
    assert(out(("b", 0L, 0L)) == (1L, 1000000L))
  }

  test("cusumReport: excursion peak, its timestamp, and the zero return") {
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("ts", LongType),
      StructField("id", LongType), StructField("v", LongType)))
    val l = new java.util.ArrayList[Row]()
    // global mean = 2; k1 front-loads (+2 +2 −2 −2), k2 mirrors
    Seq(("k1", 10L, 1L, 4L), ("k1", 20L, 2L, 4L),
      ("k1", 30L, 3L, 0L), ("k1", 40L, 4L, 0L),
      ("k2", 10L, 5L, 0L), ("k2", 20L, 6L, 0L),
      ("k2", 30L, 7L, 4L), ("k2", 40L, 8L, 4L))
      .foreach { case (k, t, i, v) => l.add(Row(k, t, i, v)) }
    val out = EventTimeOps.cusumReport(s.createDataFrame(l, schema),
      "k", "ts", "id", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // peak |cusum| = 4 at the SECOND event (earliest ts achieving it),
    // and the walk returns to 0 by the end
    assert(out("k1") == (4L, 4L, 20L, 0L))
    assert(out("k2") == (4L, 4L, 20L, 0L))
  }

  test("partitionCompleteness: zero-filled hole flags, intact days pass, " +
      "first day has no trailing history") {
    val l = new java.util.ArrayList[Row]()
    val day0 = 19000L * 86400000L
    // days 0..9, 100 events each — except day 5 absent and day 7 partial
    (0 to 9).foreach { d =>
      val per = d match { case 5 => 0; case 7 => 10; case _ => 100 }
      (0 until per).foreach(i =>
        l.add(Row(day0 + d * 86400000L + i)))
    }
    val df = s.createDataFrame(l, StructType(Seq(
      StructField("ms", LongType))))
    val out = partitionCompleteness(df, "ms", lookbackDays = 3,
      minRatioPpm = 500000L)
      .collect().map(r => (r.getLong(0) - 19000L).toInt ->
        ((r.getLong(1), r.isNullAt(2), r.getBoolean(4)))).toMap
    assert(out(0) == ((100L, true, true)))  // no history → passes
    assert(out(5) == ((0L, false, false)))  // the hole flags
    assert(out(7) == ((10L, false, false))) // partial day flags
    assert(out(9) == ((100L, false, true))) // recovered day passes
    // day 8's trailing window is [0, 10, 100] → median 10; 100 ≥ 50% of 10
    assert(out(8)._3)
  }

  test("streaming heavy hitters: SpaceSaving eviction with deterministic " +
      "ties, error bounds carried, state survives batches") {
    import s.implicits._
    val src = Files.createTempDirectory("graft-hh-src").toString
    val ckpt = Files.createTempDirectory("graft-hh-ckpt").toString
    // capacity 2: batch 1 = a,a,b,c → c evicts b (min count, lex-smallest)
    // and inherits err 1; batch 2 = c,c → c overtakes a
    events(("a", 0L, "u1", 0L), ("a", 1L, "u1", 1L), ("b", 2L, "u1", 2L),
      ("c", 3L, "u1", 3L)).coalesce(1).write.parquet(src + "/f1")
    events(("c", 4L, "u1", 4L), ("c", 5L, "u1", 5L))
      .coalesce(1).write.parquet(src + "/f2")
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src + "/*")
    val out = heavyHittersStreaming(
      stream.select(col("key"), col("topic").as("item")).as[HHEvent],
      capacity = 2, k = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("hh_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val finalSnap = s.table("hh_out").collect()
      .filter(_.getLong(1) == 6L)
      .map(r => (r.getInt(2), r.getString(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(finalSnap.toSeq == Seq((1, "c", 4L, 1L), (2, "a", 2L, 0L)))
    // intermediate snapshot after batch 1: a leads, c carries err 1
    val mid = s.table("hh_out").collect().filter(_.getLong(1) == 4L)
      .map(r => (r.getInt(2), r.getString(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(mid.toSeq == Seq((1, "a", 2L, 0L), (2, "c", 2L, 1L)))
  }

  test("streaming rate limiter: quota per window, budget survives the " +
      "batch boundary, late closed-window events reject") {
    import s.implicits._
    val src = Files.createTempDirectory("graft-rl-src").toString
    val ckpt = Files.createTempDirectory("graft-rl-ckpt").toString
    // window = 100ms, limit 2. batch 1: ms 0,10,20 in window 0 →
    // admit, admit, reject. batch 2: ms 30 (window 0 again, STATE carries
    // the exhausted budget → reject), ms 110 (window 1 → admit), then
    // ms 50 arrives after the key moved to window 1 → late, reject.
    events(("a", 0L, "u1", 0L), ("a", 1L, "u1", 10L), ("a", 2L, "u1", 20L))
      .coalesce(1).write.parquet(src + "/f1")
    events(("a", 3L, "u1", 30L), ("a", 4L, "u1", 110L))
      .coalesce(1).write.parquet(src + "/f2")
    events(("a", 5L, "u1", 50L))
      .coalesce(1).write.parquet(src + "/f3")
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src + "/*")
    val out = rateLimitStreaming(
      stream.select(col("key"), unix_millis(col("timestamp")).as("ms"))
        .as[RateEvent], limit = 2, windowMs = 100L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("rl_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = s.table("rl_out").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0L, true), (10L, 0L, true),
      (20L, 0L, false), (30L, 0L, false), (50L, 0L, false),
      (110L, 1L, true)))
  }
}
