package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.multimodal.Multimodal

class AviSpec extends SparkSuite {

  private lazy val s = sqlc

  private def frame(px: Seq[Long], w: Long) = {
    import s.implicits._
    Seq((w, px)).toDF("w", "ps")
      .select(Multimodal.bmpEncode(col("w"), col("ps")))
      .head().getAs[Array[Byte]](0)
  }

  test("AVI mux → meta + frame demux round-trips each frame exactly") {
    import s.implicits._
    val f0 = Seq(0xff0000L, 0x00ff00L, 0x0000ffL, 0x111111L)
    val f1 = Seq(0x010101L, 0x020202L, 0x030303L, 0x040404L)
    val df = Seq((40000L, Seq(frame(f0, 2), frame(f1, 2))))
      .toDF("usec", "frames")
      .withColumn("avi", Multimodal.aviEncode(col("usec"), col("frames")))
      .withColumn("m", Multimodal.aviMeta(col("avi")))
    val r = df.select(col("m.width"), col("m.height"), col("m.n_frames"),
        col("m.duration_ms"), col("m.movi_bytes")).head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 2)
    assert(r.getLong(2) == 2L && r.getLong(3) == 80L)
    assert(r.getLong(4) == 2L * (8 + 8 * 2)) // stride(2)=8, 2 rows
    // each demuxed frame decodes to its own pixels (checksum is
    // order-sensitive, so frame order and byte layout are both pinned)
    def ck(px: Seq[Long]) = px.zipWithIndex
      .map { case (p, i) => (i + 1L) * p }.sum
    val cks = df.select(
        Multimodal.bmpMeta(Multimodal.aviFrame(col("avi"), lit(0)))
          .getField("pos_checksum"),
        Multimodal.bmpMeta(Multimodal.aviFrame(col("avi"), lit(1)))
          .getField("pos_checksum"),
        Multimodal.aviFrame(col("avi"), lit(2)).isNull).head()
    assert(cks.getLong(0) == ck(f0))
    assert(cks.getLong(1) == ck(f1))
    assert(cks.getBoolean(2)) // out-of-range frame → null
  }

  test("mux rejects dim mismatches; demux nulls malformed containers") {
    import s.implicits._
    val bad = Seq((40000L, Seq(frame(Seq(1L, 2L, 3L, 4L), 2),
        frame(Seq(1L, 2L, 3L, 4L, 5L, 6L), 3))))
      .toDF("usec", "frames")
      .select(Multimodal.aviEncode(col("usec"), col("frames")).isNull)
      .head().getBoolean(0)
    assert(bad)
    val avi = Seq((40000L, Seq(frame(Seq(1L, 2L, 3L, 4L), 2))))
      .toDF("usec", "frames")
      .select(Multimodal.aviEncode(col("usec"), col("frames")))
      .head().getAs[Array[Byte]](0)
    val trunc = avi.dropRight(3)
    val badMagic = avi.clone(); badMagic(8) = 'X'.toByte
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    Seq(("good", avi), ("trunc", trunc), ("badMagic", badMagic),
      ("text", "movie night".getBytes("UTF-8")))
      .foreach { case (n, b) => rows.add(org.apache.spark.sql.Row(n, b)) }
    val out = s.createDataFrame(rows,
        StructType(Seq(StructField("name", StringType),
          StructField("payload", BinaryType))))
      .select(col("name"), Multimodal.aviMeta(col("payload")).isNull)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out == Map("good" -> false, "trunc" -> true,
      "badMagic" -> true, "text" -> true))
  }
}
