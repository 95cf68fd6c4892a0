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
}
