package graft.functions

import java.util.concurrent.TimeUnit

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.mapping.SinkConfig.CodecSettings

class CodecsSpec extends SparkSuite {

  private lazy val s = sqlc
  import s.implicits._

  test("unit conversion truncates like TimeUnit.convert") {
    val df = Seq(1234L, -1000L, 999L).toDF("v")
    val out = df.select(
      Codecs.convertUnits(col("v"), TimeUnit.MILLISECONDS, TimeUnit.SECONDS).as("s"),
      Codecs.convertUnits(col("v"), TimeUnit.SECONDS, TimeUnit.MICROSECONDS).as("us"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, -1L, 0L))
    assert(out.map(_.getLong(1)).toSeq == Seq(1234000000L, -1000000000L, 999000000L))
  }

  test("locale-aware date parsing (C3: pattern + locale)") {
    // 2024-08-14 is a Wednesday — "mercredi" in fr_FR
    val codec = CodecSettings(date = "cccc, d MMMM uuuu", locale = "fr_FR")
    val df = Seq("mercredi, 14 août 2024", "not a date").toDF("d")
    val out = df.select(Codecs.parseDate(col("d"), codec).as("parsed")).collect()
    assert(out(0).getDate(0).toString == "2024-08-14")
    assert(out(1).isNullAt(0))
  }

  test("UNITS_SINCE_EPOCH timestamp codec") {
    val codec = CodecSettings(timestamp = "UNITS_SINCE_EPOCH", unit = "SECONDS")
    val df = Seq(7L).toDF("t")
    val out = df.select(unix_micros(Codecs.parseTimestamp(col("t"), codec)).as("us"))
      .collect()
    assert(out.head.getLong(0) == 7000000L)
  }

  test("WKT / DateRange carrier validation (C7)") {
    val df = Seq(
      ("POINT (36.5 -90)", "POINT"),
      ("POINT (bogus)", "POINT"),
      ("LINESTRING (30 10, 10 30, 40 40)", "LINESTRING"),
      ("POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10))", "POLYGON"),
      ("[* TO 2014-12-01]", "DATERANGE"),
      ("not a range", "DATERANGE")).toDF("s", "kind")
    def check(kind: String, expectValid: Seq[Boolean]): Unit = {
      val rows = df.filter(col("kind") === kind)
      val (v, e) = Codecs.validateWkt(col("s"), kind)
      val out = rows.select(v.as("v"), e.as("e")).collect()
      assert(out.map(!_.isNullAt(0)).toSeq == expectValid)
      assert(out.map(_.isNullAt(1)).toSeq == expectValid.map(x => x))
    }
    check("POINT", Seq(true, false))
    check("LINESTRING", Seq(true))
    check("POLYGON", Seq(true))
    check("DATERANGE", Seq(true, false))
  }

  test("tryCast captures the failing raw value (C5)") {
    val df = Seq("12", "bad key", null).toDF("raw")
    val (v, e) = Codecs.tryCast(col("raw"), LongType)
    val out = df.select(v.as("v"), e.as("e")).collect()
    assert(out(0).getLong(0) == 12L && out(0).isNullAt(1))
    assert(out(1).isNullAt(0) && out(1).getString(1) == "Could not parse 'bad key'")
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
  }

  test("codec.timeZone shifts zone-less patterned timestamps (JsonEndToEndCCMIT.java:302-372)") {
    val codec = CodecSettings(timestamp = "yyyy-MM-dd HH:mm:ss", timeZone = "+02:00")
    val df = Seq("1970-01-01 02:00:00").toDF("t")
    val out = df.select(unix_micros(Codecs.parseTimestamp(col("t"), codec)).as("us"))
      .collect()
    // 02:00 wall clock in +02:00 is the epoch instant
    assert(out.head.getLong(0) == 0L)
    // default UTC zone leaves the parse unshifted
    val utc = CodecSettings(timestamp = "yyyy-MM-dd HH:mm:ss")
    val out2 = df.select(unix_micros(Codecs.parseTimestamp(col("t"), utc)).as("us"))
      .collect()
    assert(out2.head.getLong(0) == 7200000000L)
  }

  test("locale-aware TIMESTAMP parsing (C3: month names + locale + timeZone)") {
    // French month name + zone-less pattern: wall clock interpreted in
    // codec.timeZone (+02:00) → UTC instant
    val codec = CodecSettings(timestamp = "d MMMM uuuu HH:mm:ss",
      locale = "fr_FR", timeZone = "+02:00")
    val df = Seq("14 août 2024 10:00:00", "not a timestamp").toDF("t")
    val out = df.select(unix_micros(Codecs.parseTimestamp(col("t"), codec)).as("us"))
      .collect()
    val want = java.time.Instant.parse("2024-08-14T08:00:00Z")
    assert(out(0).getLong(0) == want.getEpochSecond * 1000000L)
    assert(out(1).isNullAt(0))
    // locale text day-of-week parses too (cccc, like the reference's sample)
    val codec2 = CodecSettings(timestamp = "cccc, d MMMM uuuu HH:mm:ss",
      locale = "fr_FR")
    val out2 = Seq("mercredi, 14 août 2024 10:00:00").toDF("t")
      .select(unix_micros(Codecs.parseTimestamp(col("t"), codec2)).as("us"))
      .collect()
    assert(out2.head.getLong(0) ==
      java.time.Instant.parse("2024-08-14T10:00:00Z").getEpochSecond * 1000000L)
  }

  test("quoted literal Z in a pattern is not a zone token: timeZone still applies") {
    // 'Z' is literal text, so the pattern is zone-less and +05:30 applies
    val codec = CodecSettings(timestamp = "yyyy-MM-dd'T'HH:mm:ss'Z'",
      timeZone = "+05:30")
    val df = Seq("1970-01-01T05:30:00Z").toDF("t")
    val out = df.select(unix_micros(Codecs.parseTimestamp(col("t"), codec)).as("us"))
      .collect()
    assert(out.head.getLong(0) == 0L)
    assert(!Codecs.patternHasZone("yyyy-MM-dd'T'HH:mm:ss'Z'"))
    assert(Codecs.patternHasZone("yyyy-MM-dd HH:mm:ssX"))
    assert(!Codecs.patternLocaleSensitive("yyyy-MM-dd HH:mm:ss"))
    assert(Codecs.patternLocaleSensitive("d MMMM uuuu"))
  }

  test("codec.time pattern parses to nanos-of-day") {
    val codec = CodecSettings(time = "HH.mm.ss")
    val df = Seq("01.02.03").toDF("t")
    val out = df.select(Codecs.parseTimeNanos(col("t"), codec).as("n")).collect()
    assert(out.head.getLong(0) == (1L * 3600 + 2 * 60 + 3) * 1000000000L)
    // default ISO_LOCAL_TIME still accepts colon form with millis
    val iso = df.select(Codecs.parseTimeNanos(lit("10:15:30.123")).as("n")).collect()
    assert(iso.head.getLong(0) == ((10L * 3600 + 15 * 60 + 30) * 1000 + 123) * 1000000L)
  }

  test("BASE64 decimal: unscaled big-endian bytes incl. negatives (AvroJsonConvertersTest.java:80-158)") {
    def b64(bytes: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(bytes)
    val codec = CodecSettings(decimal = "BASE64")
    val df = Seq(
      b64(Array(0x05.toByte)),                       // 5 → 0.05
      b64(Array(0xff.toByte, 0x85.toByte)),          // -123 → -1.23
      b64(Array(0x01.toByte, 0x86.toByte, 0xa0.toByte)), // 100000 → 1000.00
      "!!!not-base64!!!").toDF("raw")
    val out = df.select(
      Codecs.parseDecimal(col("raw"), DecimalType(9, 2), codec).as("d")).collect()
    assert(out(0).getDecimal(0) == new java.math.BigDecimal("0.05"))
    assert(out(1).getDecimal(0) == new java.math.BigDecimal("-1.23"))
    assert(out(2).getDecimal(0) == new java.math.BigDecimal("1000.00"))
    assert(out(3).isNullAt(0))
    // NUMERIC (default) still parses decimal strings
    val n = Seq("3.14").toDF("raw")
      .select(Codecs.parseDecimal(col("raw"), DecimalType(9, 2), CodecSettings()).as("d"))
      .collect()
    assert(n.head.getDecimal(0) == new java.math.BigDecimal("3.14"))
  }

  test("big-endian byte conversions: sign extension and round trips") {
    val df = Seq(0L, 1L, -1L, 255L, -123L, Long.MaxValue, Long.MinValue).toDF("v")
    val rt = df.select(
      BigEndian.bytes_to_long(BigEndian.long_to_bytes(col("v"), 8)).as("r8"))
      .collect().map(_.getLong(0))
    assert(rt.toSeq == Seq(0L, 1L, -1L, 255L, -123L, Long.MaxValue, Long.MinValue))
    // 4-byte round trip for int-range values (Kafka int serializer width)
    val rt4 = Seq(7L, -7L, Int.MaxValue.toLong).toDF("v")
      .select(BigEndian.bytes_to_long(BigEndian.long_to_bytes(col("v"), 4)).as("r"))
      .collect().map(_.getLong(0))
    assert(rt4.toSeq == Seq(7L, -7L, Int.MaxValue.toLong))
    // IEEE-754 double through 8 bytes
    val d = java.lang.Double.doubleToLongBits(3.5d)
    val dd = Seq(d).toDF("bits")
      .select(BigEndian.bytes_to_double(BigEndian.long_to_bytes(col("bits"), 8)).as("d"))
      .collect()
    assert(dd.head.getDouble(0) == 3.5d)
  }

  test("castToStruct: map, array, struct-by-name, and JSON text into UDT/tuple (C1)") {
    val target = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    // map<string,string> → UDT by key; missing key → null field
    val m = Seq(Map("a" -> "7", "b" -> "x"), Map("a" -> "8")).toDF("m")
      .select(Codecs.castToStruct(col("m"), MapType(StringType, StringType), target).as("u"))
      .collect()
    assert(m(0).getStruct(0) == org.apache.spark.sql.Row(7L, "x"))
    assert(m(1).getStruct(0) == org.apache.spark.sql.Row(8L, null))
    // array → tuple positionally; short array → trailing nulls
    val tup = StructType(Seq(StructField("t1", LongType), StructField("t2", LongType)))
    val a = Seq(Seq("1", "2"), Seq("9")).toDF("arr")
      .select(Codecs.castToStruct(col("arr"), ArrayType(StringType), tup).as("u"))
      .collect()
    assert(a(0).getStruct(0) == org.apache.spark.sql.Row(1L, 2L))
    assert(a(1).getStruct(0) == org.apache.spark.sql.Row(9L, null))
    // struct → UDT by NAME, not position (extra source fields ignored)
    val src = Seq(("x", 7L, 1)).toDF("b", "a", "z")
      .select(struct(col("b"), col("a"), col("z")).as("s"))
    val st = src.schema.fields.head.dataType
    val sOut = src.select(Codecs.castToStruct(col("s"), st, target).as("u")).collect()
    assert(sOut.head.getStruct(0) == org.apache.spark.sql.Row(7L, "x"))
    // JSON text → UDT via one from_json; malformed → null struct
    val j = Seq("""{"a": 5, "b": "y"}""", "{nope").toDF("j")
      .select(Codecs.castToStruct(col("j"), StringType, target).as("u")).collect()
    assert(j(0).getStruct(0) == org.apache.spark.sql.Row(5L, "y"))
    assert(j(1).isNullAt(0))
    // null structural input stays a null struct, not a struct of nulls
    val nm = Seq(Option.empty[Map[String, String]]).toDF("m")
      .select(Codecs.castToStruct(col("m"), MapType(StringType, StringType), target).as("u"))
      .collect()
    assert(nm.head.isNullAt(0))
  }
}
