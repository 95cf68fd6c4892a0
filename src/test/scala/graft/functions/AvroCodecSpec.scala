package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Avro wire codec: schema conversion, encode→decode round trips, malformed
  * capture (reference Struct-record mode: StructEndToEndCCMIT.java:64-281,
  * perf/dse-sink-avro.json:5-11). */
class AvroCodecSpec extends SparkSuite {

  private lazy val s = sqlc
  import s.implicits._

  private val schemaJson =
    """{"type":"record","name":"Payload","fields":[
      |{"name":"uid","type":"long"},
      |{"name":"etype","type":"string"},
      |{"name":"opt","type":["null","long"],"default":null},
      |{"name":"udt","type":{"type":"record","name":"U","fields":[
      |  {"name":"a","type":"long"},{"name":"b","type":"string"}]}},
      |{"name":"arr","type":{"type":"array","items":"long"}},
      |{"name":"m","type":{"type":"map","values":"long"}},
      |{"name":"color","type":{"type":"enum","name":"C","symbols":["RED","BLUE"]}},
      |{"name":"dec","type":{"type":"bytes","logicalType":"decimal","precision":9,"scale":2}}
      |]}""".stripMargin

  test("schema conversion: records, unions, arrays, maps, enums, decimals") {
    val st = AvroCodec.toSparkType(
      new org.apache.avro.Schema.Parser().parse(schemaJson)).asInstanceOf[StructType]
    assert(st.fieldNames.toSeq ==
      Seq("uid", "etype", "opt", "udt", "arr", "m", "color", "dec"))
    assert(st("uid").dataType == LongType)
    assert(st("opt").dataType == LongType) // (null, long) union unwraps
    assert(st("udt").dataType ==
      StructType(Seq(StructField("a", LongType), StructField("b", StringType))))
    assert(st("arr").dataType == ArrayType(LongType))
    assert(st("m").dataType == MapType(StringType, LongType))
    assert(st("color").dataType == StringType)
    assert(st("dec").dataType == DecimalType(9, 2))
  }

  test("encode → decode round trip over the full nested type matrix") {
    val df = Seq((7L, "x", 1L, 2L, "y", Seq(1L, 2L, 3L), "RED", "12.34"))
      .toDF("uid", "etype", "opt", "a", "b", "arr", "color", "dec")
      .select(struct(
        col("uid"), col("etype"), col("opt"),
        struct(col("a"), col("b")).as("udt"),
        col("arr"),
        map(lit("k1"), lit(5L)).as("m"),
        col("color"),
        col("dec").cast(DecimalType(9, 2)).as("dec")).as("payload"))
    val bytes = df.select(
      AvroCodec.to_avro_binary(col("payload"), schemaJson).as("b"))
    val back = bytes.select(
      AvroCodec.from_avro_binary(col("b"), schemaJson).as("p"))
      .select("p.*").collect().head
    assert(back.getLong(0) == 7L && back.getString(1) == "x" && back.getLong(2) == 1L)
    assert(back.getStruct(3) == Row(2L, "y"))
    assert(back.getSeq[Long](4) == Seq(1L, 2L, 3L))
    assert(back.getMap[String, Long](5) == Map("k1" -> 5L))
    assert(back.getString(6) == "RED")
    assert(back.getDecimal(7) == new java.math.BigDecimal("12.34"))
  }

  test("null union field and malformed bytes decode to null, not a throw") {
    val nullOpt = Seq((1L, "e"))
      .toDF("uid", "etype")
      .select(struct(col("uid"), col("etype"),
        lit(null).cast(LongType).as("opt"),
        struct(lit(2L).as("a"), lit("y").as("b")).as("udt"),
        array(lit(1L)).as("arr"),
        map(lit("k"), lit(1L)).as("m"),
        lit("BLUE").as("color"),
        lit("0.01").cast(DecimalType(9, 2)).as("dec")).as("payload"))
      .select(AvroCodec.from_avro_binary(
        AvroCodec.to_avro_binary(col("payload"), schemaJson), schemaJson).as("p"))
      .collect().head
    assert(nullOpt.getStruct(0).isNullAt(2))
    // garbage bytes → null struct (a capturable failure, never a task crash)
    val bad = Seq(Array[Byte](0x7f, 0x00, 0x01)).toDF("b")
      .select(AvroCodec.from_avro_binary(col("b"), schemaJson).as("p"))
      .collect().head
    assert(bad.isNullAt(0))
  }
}
