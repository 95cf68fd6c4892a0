package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.multimodal.Multimodal

class WavPcmSpec extends SparkSuite {

  private lazy val s = sqlc

  test("WAV PCM16 encode → decode round-trips header and exact stats") {
    import s.implicits._
    val df = Seq((1L, 8000L, Seq(0L, 100L, -100L, 32767L, -32768L)))
      .toDF("id", "rate", "samples")
      .withColumn("payload",
        Multimodal.wavEncode(col("rate"), col("samples")))
      .withColumn("meta", Multimodal.wavMeta(col("payload")))
    val r = df.select(length(col("payload")), col("meta.sample_rate"),
        col("meta.channels"), col("meta.bits_per_sample"),
        col("meta.n_samples"), col("meta.duration_ms"), col("meta.peak"),
        col("meta.sum_abs"), col("meta.sum_sq")).head()
    assert(r.getInt(0) == 44 + 10) // header + 5 samples × 2 bytes
    assert(r.getInt(1) == 8000 && r.getInt(2) == 1 && r.getInt(3) == 16)
    assert(r.getLong(4) == 5L && r.getLong(5) == 0L) // 5 samples @8kHz < 1ms
    assert(r.getLong(6) == 32768L)
    assert(r.getLong(7) == 0L + 100L + 100L + 32767L + 32768L)
    assert(r.getLong(8) ==
      100L * 100 + 100L * 100 + 32767L * 32767 + 32768L * 32768)
  }

  test("decode returns null (not an exception) for malformed payloads") {
    import s.implicits._
    val wav = Seq((8000L, Seq(1L, 2L, 3L))).toDF("rate", "samples")
      .select(Multimodal.wavEncode(col("rate"), col("samples"))
        .as("payload"))
      .head().getAs[Array[Byte]](0)
    val truncated = wav.dropRight(2) // data length no longer matches
    val badMagic = wav.clone(); badMagic(0) = 'X'.toByte
    val cases = Seq(
      ("text", "hello world".getBytes("UTF-8")),
      ("short", Array[Byte](1, 2, 3)),
      ("truncated", truncated),
      ("badMagic", badMagic),
      ("good", wav))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    cases.foreach { case (n, b) => rows.add(org.apache.spark.sql.Row(n, b)) }
    val dfc = s.createDataFrame(rows,
      StructType(Seq(StructField("name", StringType),
        StructField("payload", BinaryType))))
    val out = dfc.select(col("name"),
        Multimodal.wavMeta(col("payload")).isNull.as("bad"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out == Map("text" -> true, "short" -> true,
      "truncated" -> true, "badMagic" -> true, "good" -> false))
  }
}
