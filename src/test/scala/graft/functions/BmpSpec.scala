package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.multimodal.Multimodal

class BmpSpec extends SparkSuite {

  private lazy val s = sqlc

  test("BMP 24bpp round trip: bottom-up rows, BGR order, row padding") {
    import s.implicits._
    // 3×2 top-left row-major: red green blue / white black gray.
    // width 3 → 9 pixel bytes + 3 pad bytes per row (the padding trap).
    val pixels = Seq(0xff0000L, 0x00ff00L, 0x0000ffL,
      0xffffffL, 0x000000L, 0x808080L)
    val df = Seq((3L, pixels)).toDF("w", "ps")
      .withColumn("payload", Multimodal.bmpEncode(col("w"), col("ps")))
      .withColumn("meta", Multimodal.bmpMeta(col("payload")))
    val r = df.select(length(col("payload")), col("meta.width"),
        col("meta.height"), col("meta.n_pixels"), col("meta.sum_r"),
        col("meta.sum_g"), col("meta.sum_b"), col("meta.first_pixel"),
        col("meta.pos_checksum")).head()
    assert(r.getInt(0) == 54 + 12 * 2) // stride(3)=12
    assert(r.getInt(1) == 3 && r.getInt(2) == 2)
    assert(r.getLong(3) == 6L)
    assert(r.getLong(4) == 255L + 255 + 128) // red + white + gray
    assert(r.getLong(5) == 255L + 255 + 128)
    assert(r.getLong(6) == 255L + 255 + 128)
    assert(r.getLong(7) == 0xff0000L) // top-left is RED (bottom-up undone)
    assert(r.getLong(8) == pixels.zipWithIndex
      .map { case (p, i) => (i + 1L) * p }.sum)
    // raw bytes: the FILE's first pixel row is the LOGICAL LAST row, BGR
    val raw = df.select(col("payload")).head().getAs[Array[Byte]](0)
    assert((raw(54) & 0xff, raw(55) & 0xff, raw(56) & 0xff) ==
      ((255, 255, 255))) // white = logical (1,0) stored first
    assert((raw(54 + 12) & 0xff, raw(55 + 12) & 0xff, raw(56 + 12) & 0xff) ==
      ((0, 0, 255))) // red as B=0 G=0 R=255 in the second stored row
  }

  test("resize 2x: exact truncating block means, output re-decodable") {
    import s.implicits._
    // 2×2 block → 1×1: means are truncating per channel
    val pixels = Seq(0x0a141eL, 0x0b151fL, 0x0c1620L, 0x0d1721L)
    val r = Seq((2L, pixels)).toDF("w", "ps")
      .withColumn("payload", Multimodal.bmpEncode(col("w"), col("ps")))
      .withColumn("small", Multimodal.bmpResize(col("payload"), lit(2)))
      .withColumn("meta", Multimodal.bmpMeta(col("small")))
      .select(col("meta.width"), col("meta.height"),
        col("meta.first_pixel")).head()
    assert(r.getInt(0) == 1 && r.getInt(1) == 1)
    // R mean = (10+11+12+13)/4 = 11; G = (20..23)/4 = 21; B = 31
    assert(r.getLong(2) == ((11L << 16) | (21L << 8) | 31L))
    // factor larger than the image → null, not an exception
    val tooSmall = Seq((2L, pixels)).toDF("w", "ps")
      .select(Multimodal.bmpResize(
        Multimodal.bmpEncode(col("w"), col("ps")), lit(4)).isNull)
      .head().getBoolean(0)
    assert(tooSmall)
  }

  test("encode rejects ragged pixel counts; decode nulls malformed blobs") {
    import s.implicits._
    val ragged = Seq((3L, Seq(1L, 2L, 3L, 4L))).toDF("w", "ps")
      .select(Multimodal.bmpEncode(col("w"), col("ps")).isNull.as("bad"))
      .head().getBoolean(0)
    assert(ragged)
    val good = Seq((2L, Seq(1L, 2L, 3L, 4L))).toDF("w", "ps")
      .select(Multimodal.bmpEncode(col("w"), col("ps")).as("payload"))
      .head().getAs[Array[Byte]](0)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val badBpp = good.clone(); badBpp(28) = 8.toByte
    val truncated = good.dropRight(1)
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    Seq(("good", good), ("badMagic", badMagic), ("badBpp", badBpp),
      ("truncated", truncated), ("text", "not a bmp".getBytes("UTF-8")))
      .foreach { case (n, b) => rows.add(org.apache.spark.sql.Row(n, b)) }
    val out = s.createDataFrame(rows,
        StructType(Seq(StructField("name", StringType),
          StructField("payload", BinaryType))))
      .select(col("name"), Multimodal.bmpMeta(col("payload")).isNull)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out == Map("good" -> false, "badMagic" -> true,
      "badBpp" -> true, "truncated" -> true, "text" -> true))
  }
}
