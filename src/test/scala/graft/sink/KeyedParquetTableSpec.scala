package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.operators.RecordMapper

/** Bucketed state behavior: merges touch only the buckets a batch's keys
  * hash to; untouched buckets keep their old version directories. */
class KeyedParquetTableSpec extends SparkSuite {

  private lazy val s = sqlc

  private val table = SinkTable("ks", "bt", StructType(Seq(
    StructField("my_pk", LongType), StructField("my_value", LongType))),
    Seq("my_pk"))

  private def mapped(rows: (Long, Long, Long)*) = {
    val l = new java.util.ArrayList[Row]()
    rows.foreach { case (pk, v, wt) =>
      l.add(Row(pk, v, wt, RecordMapper.ModeUpsert))
    }
    s.createDataFrame(l, StructType(Seq(
      StructField("my_pk", LongType), StructField("my_value", LongType),
      StructField(RecordMapper.WritetimeCol, LongType),
      StructField(RecordMapper.ModeCol, StringType))))
  }

  test("merge touches only the batch's buckets; untouched buckets keep their version") {
    val root = Files.createTempDirectory("graft-bucket").toString
    val t = new KeyedParquetTable(s, table, root, numBuckets = 8)

    // batch 1: many keys spread over (almost) all buckets
    t.applyBatch(mapped((1L to 64L).map(k => (k, k * 10, 100L)): _*), batchId = 1L)
    assert(t.state().count() == 64)
    assert(Files.exists(Paths.get(root, "v1")))

    // batch 2: a single key — only that key's bucket moves to v2
    t.applyBatch(mapped((1L, 999L, 200L)), batchId = 2L)
    val st = t.state().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st(1L) == 999L && st(2L) == 20L && st.size == 64)
    // v2 holds exactly one bucket partition; v1 still owns the rest
    val v2Parts = Files.list(Paths.get(root, "v2")).toArray.map(_.toString)
      .filter(_.contains("__bucket="))
    assert(v2Parts.length == 1)
    assert(Files.exists(Paths.get(root, "v1")))

    // replayed batch id is a no-op (exactly-once)
    t.applyBatch(mapped((1L, 111L, 300L)), batchId = 2L)
    assert(t.state().filter(col("my_pk") === 1L).head().getLong(1) == 999L)
  }

  test("state stays correct and disk-bounded over many micro-batches; manifest survives restart") {
    val root = Files.createTempDirectory("graft-endure").toString
    val t = new KeyedParquetTable(s, table, root, numBuckets = 4)
    // 30 overlapping batches: key k gets its last write at batch (k % 30)
    (1 to 30).foreach { b =>
      t.applyBatch(mapped((0 until 10).map { i =>
        val k = (b + i * 3) % 40
        (k.toLong, b * 1000L + k, b.toLong)
      }: _*), batchId = b.toLong)
    }
    // expected: per key, the row from its highest-writetime batch (LWW)
    val st = t.state().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (1 to 30).flatMap { b =>
      (0 until 10).map(i => ((b + i * 3) % 40, b))
    }.groupBy(_._1).map { case (k, hits) =>
      val b = hits.map(_._2).max
      k.toLong -> (b * 1000L + k)
    }
    assert(st == expected)
    // vacuum keeps only referenced versions: ≤ numBuckets live dirs
    val liveDirs = Files.list(java.nio.file.Paths.get(root)).toArray
      .map(_.toString).count(_.matches(".*v\\d+$"))
    assert(liveDirs <= 4, s"$liveDirs version dirs survived vacuum")
    // a fresh instance over the same root reloads the manifest (restart)
    val t2 = new KeyedParquetTable(s, table, root, numBuckets = 4)
    assert(t2.lastAppliedBatchId == 30L)
    assert(t2.state().count() == expected.size)
    // and a replayed old batch is still a no-op after restart
    t2.applyBatch(mapped((0L, 999999L, 1L)), batchId = 30L)
    assert(t2.state().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expected)
  }

  test("reopening state with a different numBuckets fails fast (manifest pins it)") {
    val root = Files.createTempDirectory("graft-nbuckets").toString
    val t = new KeyedParquetTable(s, table, root, numBuckets = 8)
    t.applyBatch(mapped((1L, 1L, 100L)), batchId = 1L)
    // re-hashing keys into a different bucket count would silently read the
    // wrong partitions — must refuse, not corrupt
    val t2 = new KeyedParquetTable(s, table, root, numBuckets = 16)
    val e = intercept[IllegalArgumentException] { t2.state() }
    assert(e.getMessage.contains("numBuckets=8"))
    // the original bucket count still opens fine
    val t3 = new KeyedParquetTable(s, table, root, numBuckets = 8)
    assert(t3.state().count() == 1)
  }

  test("unreferenced versions are vacuumed once every bucket moves past them") {
    val root = Files.createTempDirectory("graft-vacuum").toString
    val t = new KeyedParquetTable(s, table, root, numBuckets = 2)
    t.applyBatch(mapped((1L, 1L, 100L), (2L, 2L, 100L), (3L, 3L, 100L),
      (4L, 4L, 100L)), batchId = 1L)
    // touch every key again: all buckets move to v2, v1 becomes garbage
    t.applyBatch(mapped((1L, 11L, 200L), (2L, 22L, 200L), (3L, 33L, 200L),
      (4L, 44L, 200L)), batchId = 2L)
    assert(!Files.exists(Paths.get(root, "v1")))
    assert(t.state().count() == 4)
  }

  test("X2 compression: state written with the configured parquet codec") {
    import graft.mapping.SinkConfig
    // reference name → parquet codec mapping, invalid values rejected
    def cfg(c: String) = SinkConfig.parse(Map(
      "topic.t.ks.bt.mapping" -> "my_pk=key, my_value=value.k",
      "compression" -> c))
    assert(cfg("None").parquetCodec == "uncompressed")
    assert(cfg("Snappy").parquetCodec == "snappy")
    assert(cfg("LZ4").parquetCodec == "lz4_raw")
    intercept[IllegalArgumentException](cfg("Gzip"))

    val root = Files.createTempDirectory("graft-lz4").toString
    val t = new KeyedParquetTable(s, table, root, compression = "lz4_raw")
    t.applyBatch(mapped((1L, 10L, 100L), (2L, 20L, 100L)), batchId = 1L)
    // round-trips, and the data files carry the codec suffix
    assert(t.state().count() == 2)
    val files = Files.walk(Paths.get(root)).iterator()
    val names = Iterator.continually(files).takeWhile(_.hasNext)
      .map(_.next().getFileName.toString).toList
    assert(names.exists(_.endsWith(".lz4raw.parquet")),
      s"expected lz4raw parquet files, saw: ${names.filter(_.endsWith("parquet"))}")
  }
}
