package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.mapping.SinkConfig
import graft.sink.SinkTable

/** Replicates the reference's per-record mapping/routing behavior on tiny
  * in-memory batches (reference: DeleteCCMIT, WriteTimestampAndTtlCCMIT,
  * NowFunctionCCMIT, KeyValueRecordTest). */
class RecordMapperSpec extends SparkSuite {

  private lazy val s = sqlc
  import RecordMapper._

  private val kafkaSchema = StructType(Seq(
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("key", StringType),
    StructField("value", StringType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType), StructField("value", StringType))))),
    StructField("timestamp", TimestampType)))

  private def records(rows: (Long, String, String)*) = {
    val data = rows.map { case (off, key, value) =>
      Row("t", 0, off, key, value,
        Seq(Row("h1", "hv1")),
        java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(153000987L)))
    }
    s.createDataFrame(new java.util.ArrayList[Row](data.asJavaLike), kafkaSchema)
  }

  implicit class SeqRowOps(rows: Seq[Row]) {
    def asJavaLike: java.util.List[Row] = {
      val l = new java.util.ArrayList[Row]()
      rows.foreach(l.add)
      l
    }
  }

  private val pkValue = SinkTable("ks", "pk_value",
    StructType(Seq(StructField("my_pk", LongType), StructField("my_value", BooleanType))),
    Seq("my_pk"))

  private def bind(props: (String, String)*) =
    SinkConfig.parse(props.toMap).bindings.head

  test("null value routes to DELETE when mapping covers the table (DeleteCCMIT.java:39-60)") {
    val b = bind("topic.t.ks.pk_value.mapping" -> "my_pk=key, my_value=value.my_value")
    val out = compile(b, pkValue, records((0L, "1234567", null)))
      .select("my_pk", "my_value", ModeCol).collect()
    assert(out.toSeq == Seq(Row(1234567L, null, ModeDelete)))
  }

  test("non-null value routes to UPSERT") {
    val b = bind("topic.t.ks.pk_value.mapping" -> "my_pk=key, my_value=value.my_value")
    val out = compile(b, pkValue, records((0L, "42", """{"my_value": true}""")))
      .select("my_pk", "my_value", ModeCol).collect()
    assert(out.toSeq == Seq(Row(42L, true, ModeUpsert)))
  }

  test("deletesEnabled=false inserts nulls instead (DeleteCCMIT.java:84-114)") {
    val b = bind(
      "topic.t.ks.pk_value.mapping" -> "my_pk=key, my_value=value.my_value",
      "topic.t.ks.pk_value.deletesEnabled" -> "false")
    val out = compile(b, pkValue, records((0L, "1", null)))
      .select(ModeCol).collect()
    assert(out.head.getString(0) == ModeUpsert)
  }

  test("partial mapping (not covering all columns) never deletes (DeleteCCMIT)") {
    val t3 = SinkTable("ks", "t3", StructType(Seq(
      StructField("my_pk", LongType), StructField("a", LongType),
      StructField("b", LongType))), Seq("my_pk"))
    val b = bind("topic.t.ks.t3.mapping" -> "my_pk=key, a=value.a")
    val out = compile(b, t3, records((0L, "1", null))).select(ModeCol).collect()
    assert(out.head.getString(0) == ModeUpsert)
  }

  test("record timestamp becomes writetime in µs (WriteTimestampAndTtlCCMIT.java:45-70)") {
    val b = bind("topic.t.ks.pk_value.mapping" -> "my_pk=key, my_value=value.my_value")
    val out = compile(b, pkValue, records((0L, "1", """{"my_value": false}""")))
      .select(WritetimeCol).collect()
    assert(out.head.getLong(0) == 153000987000L)
  }

  test("__timestamp field with unit conversion (WriteTimestampAndTtlCCMIT.java:295-416)") {
    val b = bind(
      "topic.t.ks.pk_value.mapping" ->
        "my_pk=key, my_value=value.my_value, __timestamp=value.w",
      "topic.t.ks.pk_value.timestampTimeUnit" -> "SECONDS")
    val out = compile(b, pkValue, records((0L, "1", """{"my_value": true, "w": 7}""")))
      .select(WritetimeCol).collect()
    assert(out.head.getLong(0) == 7000000L)
  }

  test("__ttl conversion truncates and clamps negatives (WriteTimestampAndTtlCCMIT.java:138-160)") {
    val b = bind(
      "topic.t.ks.pk_value.mapping" ->
        "my_pk=key, my_value=value.my_value, __ttl=value.t",
      "topic.t.ks.pk_value.ttlTimeUnit" -> "MILLISECONDS")
    val out = compile(b, pkValue, records(
      (0L, "1", """{"my_value": true, "t": 1234}"""),
      (1L, "2", """{"my_value": true, "t": -1000}""")))
      .select(TtlCol).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 0L))
  }

  test("header access (HeadersCCMIT.java:120-226)") {
    val t = SinkTable("ks", "th", StructType(Seq(
      StructField("my_pk", LongType), StructField("h", StringType))), Seq("my_pk"))
    val b = bind("topic.t.ks.th.mapping" -> "my_pk=key, h=header.h1")
    val out = compile(b, t, records((0L, "9", "{}"))).select("h").collect()
    assert(out.head.getString(0) == "hv1")
  }

  test("typed binary headers: numeric, string, struct, __ttl (HeadersCCMIT.java:120-226)") {
    import graft.functions.BigEndianHelper.longToBytes
    val binHeaderSchema = StructType(Seq(
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("key", StringType),
      StructField("value", StringType),
      StructField("headers", ArrayType(StructType(Seq(
        StructField("key", StringType), StructField("value", BinaryType))))),
      StructField("timestamp", TimestampType)))
    val rows = Seq(Row("t", 0, 0L, "9", "{}",
      Seq(
        Row("h_int", longToBytes(1234L, 4)),
        Row("h_str", "hello".getBytes("UTF-8")),
        Row("h_obj", """{"a": 7, "b": "x"}""".getBytes("UTF-8")),
        Row("h_ttl", longToBytes(120L, 8))),
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(153000987L))))
    val df = s.createDataFrame(rows.asJavaLike, binHeaderSchema)
    val t = SinkTable("ks", "tb", StructType(Seq(
      StructField("my_pk", LongType), StructField("n", LongType),
      StructField("st", StringType),
      StructField("u", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType)))))), Seq("my_pk"))
    val b = bind("topic.t.ks.tb.mapping" ->
      "my_pk=key, n=header.h_int, st=header.h_str, u=header.h_obj, __ttl=header.h_ttl")
    val out = compile(b, t, df)
      .select(col("n"), col("st"), col("u"), col(TtlCol)).collect()
    assert(out.head.getLong(0) == 1234L)
    assert(out.head.getString(1) == "hello")
    assert(out.head.getStruct(2) == Row(7L, "x"))
    assert(out.head.getLong(3) == 120L)
  }

  test("wide Json mapping parses the document once via json_tuple") {
    val t = SinkTable("ks", "tw", StructType(Seq(
      StructField("my_pk", LongType), StructField("a", LongType),
      StructField("b", StringType), StructField("c", LongType))), Seq("my_pk"))
    val b = bind("topic.t.ks.tw.mapping" ->
      "my_pk=key, a=value.a, b=value.b, c=value.missing")
    val df = compile(b, t, records((0L, "7", """{"a": 5, "b": "x"}""")))
    // one json_tuple generator, zero per-field get_json_object parses
    val plan = df.queryExecution.analyzed.toString
    assert(plan.contains("json_tuple") && !plan.contains("get_json_object"))
    val out = df.select("my_pk", "a", "b", "c").collect()
    assert(out.head == Row(7L, 5L, "x", null))
  }

  test("now() yields distinct, v1, time-ordered uuids per column (NowFunctionCCMIT.java:421-441)") {
    val t = SinkTable("ks", "tu", StructType(Seq(
      StructField("my_pk", LongType), StructField("u1", StringType),
      StructField("u2", StringType))), Seq("my_pk"))
    val b = bind("topic.t.ks.tu.mapping" -> "my_pk=key, u1=now(), u2=now()")
    val rows = compile(b, t, records((0L, "1", "{}"), (1L, "2", "{}")))
      .select("u1", "u2").collect()
    val all = rows.flatMap(r => Seq(r.getString(0), r.getString(1)))
    assert(all.distinct.length == all.length)
    all.foreach { u => assert(java.util.UUID.fromString(u).version() == 1) }
  }

  test("now() targets do not block delete inference (NowFunctionCCMIT.java:467-491)") {
    val t = SinkTable("ks", "pvu", StructType(Seq(
      StructField("my_pk", LongType), StructField("my_value", BooleanType),
      StructField("loaded_at", StringType))), Seq("my_pk"))
    val b = bind("topic.t.ks.pvu.mapping" ->
      "my_pk=key, my_value=value.my_value, loaded_at=now()")
    val out = compile(b, t, records((0L, "5", null))).select(ModeCol).collect()
    assert(out.head.getString(0) == ModeDelete)
  }

  test("missing field maps to null (KeyValueRecordTest.java:406)") {
    val b = bind("topic.t.ks.pk_value.mapping" -> "my_pk=key, my_value=value.nope")
    val out = compile(b, pkValue, records((0L, "1", """{"my_value": true}""")))
      .select("my_value").collect()
    assert(out.head.isNullAt(0))
  }

  test("struct records: field access + struct→UDT-style cast (StructToUDTCodec.java:48-90)") {
    // pre-decoded struct value (the shape from_avro produces)
    val structValueSchema = StructType(Seq(
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("key", StringType),
      StructField("value", StructType(Seq(
        StructField("bigint", LongType),
        StructField("udt", StructType(Seq(
          StructField("udtmem1", IntegerType), StructField("udtmem2", StringType))))))),
      StructField("headers", ArrayType(StructType(Seq(
        StructField("key", StringType), StructField("value", StringType))))),
      StructField("timestamp", TimestampType)))
    val l = new java.util.ArrayList[Row]()
    l.add(Row("t", 0, 0L, "1", Row(1234567L, Row(47, "ninety")), Seq.empty[Row],
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(1000L))))
    val recs = s.createDataFrame(l, structValueSchema)

    val udtTable = SinkTable("ks", "types", StructType(Seq(
      StructField("bigintcol", LongType),
      StructField("udtcol", StructType(Seq(
        StructField("udtmem1", LongType), StructField("udtmem2", StringType)))))),
      Seq("bigintcol"))
    val b = bind("topic.t.ks.types.mapping" -> "bigintcol=value.bigint, udtcol=value.udt")
    val out = compile(b, udtTable, recs, valueFormat = Format.Struct)
      .select("bigintcol", "udtcol").collect()
    assert(out.head.getLong(0) == 1234567L)
    // int udtmem1 widened to long by the codec cast, names preserved
    assert(out.head.getStruct(1) == Row(47L, "ninety"))
  }

  test("Format.Avro decodes value bytes once and feeds the Struct path (perf/dse-sink-avro.json:5-11)") {
    val avroSchema =
      """{"type":"record","name":"V","fields":[
        |{"name":"bigint","type":"long"},
        |{"name":"udt","type":{"type":"record","name":"U","fields":[
        |  {"name":"udtmem1","type":"int"},{"name":"udtmem2","type":"string"}]}},
        |{"name":"opt","type":["null","string"],"default":null}
        |]}""".stripMargin
    // produce the wire bytes with the encode expression, then map them back
    val binSchema = StructType(kafkaSchema.fields.map {
      case f if f.name == "value" => StructField("value", BinaryType)
      case f => f
    })
    val l = new java.util.ArrayList[Row]()
    l.add(Row("t", 0, 0L, "1", null, Seq.empty[Row],
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(1000L))))
    val recs = s.createDataFrame(l, binSchema)
      .withColumn("value", graft.functions.AvroCodec.to_avro_binary(
        struct(lit(1234567L).as("bigint"),
          struct(lit(47).as("udtmem1"), lit("ninety").as("udtmem2")).as("udt"),
          lit(null).cast(StringType).as("opt")), avroSchema))

    val udtTable = SinkTable("ks", "types", StructType(Seq(
      StructField("bigintcol", LongType),
      StructField("udtcol", StructType(Seq(
        StructField("udtmem1", LongType), StructField("udtmem2", StringType)))),
      StructField("optcol", StringType))),
      Seq("bigintcol"))
    val b = bind("topic.t.ks.types.mapping" ->
      "bigintcol=value.bigint, udtcol=value.udt, optcol=value.opt")
    val out = compile(b, udtTable, recs, valueFormat = Format.Avro(avroSchema))
      .select("bigintcol", "udtcol", "optcol").collect()
    assert(out.head.getLong(0) == 1234567L)
    assert(out.head.getStruct(1) == Row(47L, "ninety"))
    assert(out.head.isNullAt(2)) // null union branch stays null
  }

  test("JsonWithSchema decodes once via from_json, same results as dynamic JSON") {
    val t = SinkTable("ks", "tw", StructType(Seq(
      StructField("my_pk", LongType), StructField("a", LongType),
      StructField("b", StringType))), Seq("my_pk"))
    val b = bind("topic.t.ks.tw.mapping" -> "my_pk=key, a=value.a, b=value.b")
    val recs = records((0L, "7", """{"a": 5, "b": "x"}"""))
    val dynamic = compile(b, t, recs).select("my_pk", "a", "b").collect()
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val declared = compile(b, t, recs,
      valueFormat = Format.JsonWithSchema(schema)).select("my_pk", "a", "b").collect()
    assert(dynamic.toSeq == declared.toSeq)
    assert(dynamic.head == Row(7L, 5L, "x"))
  }

  test("schema defaults fill null optional fields (P8, StructEndToEndCCMIT.java:441-462)") {
    val meta = new MetadataBuilder().putString("default", "42").build()
    val structValueSchema = StructType(Seq(
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("key", StringType),
      StructField("value", StructType(Seq(
        StructField("req", LongType),
        StructField("opt", LongType, nullable = true, metadata = meta)))),
      StructField("headers", ArrayType(StructType(Seq(
        StructField("key", StringType), StructField("value", StringType))))),
      StructField("timestamp", TimestampType)))
    val l = new java.util.ArrayList[Row]()
    l.add(Row("t", 0, 0L, "1", Row(7L, null), Seq.empty[Row],
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(1000L))))
    val recs = s.createDataFrame(l, structValueSchema)
    val t = SinkTable("ks", "td", StructType(Seq(
      StructField("my_pk", LongType), StructField("req", LongType),
      StructField("opt", LongType))), Seq("my_pk"))
    val b = bind("topic.t.ks.td.mapping" -> "my_pk=key, req=value.req, opt=value.opt")
    val out = compile(b, t, recs, valueFormat = Format.Struct)
      .select("req", "opt").collect()
    assert(out.head == Row(7L, 42L))
  }

  test("counter tables route to COUNTER mode") {
    val ct = SinkTable("ks", "ctr", StructType(Seq(
      StructField("c1", LongType), StructField("c3", LongType))),
      Seq("c1"), counterCols = Seq("c3"))
    val b = bind("topic.t.ks.ctr.mapping" -> "c1=key, c3=value.f3")
    val out = compile(b, ct, records((0L, "1", """{"f3": 3}"""))).select(ModeCol).collect()
    assert(out.head.getString(0) == ModeCounter)
  }
}
