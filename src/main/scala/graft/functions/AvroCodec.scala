package graft.functions

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericFixed, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Avro wire codec for the mapping pipeline — the reference's second ingestion
 * mode (its perf rig drains 200M Avro records into UDT columns, reference:
 * perf/README.md:34-41, perf/dse-sink-avro.json:5-11; the Struct-record type
 * matrix is StructEndToEndCCMIT.java:64-281). The container has Avro core but
 * not the spark-avro module, so the decode is a self-contained Catalyst
 * expression: Avro schema → Spark type (including record/array/map/union
 * nesting, enums, fixed, and the decimal logical type), Avro datum →
 * Catalyst value. Decode output feeds the same Struct-format path the mapping
 * compiler already has — `Format.Avro(schemaJson)` is one decode stage in
 * front of `Format.Struct` semantics.
 *
 * CodegenFallback is the honest choice here: the work per row is the Avro
 * binary decoder itself; codegen around it would inline nothing.
 */
object AvroCodec {

  /** Avro schema → Spark type. Unions must be (null, T) or a single branch —
    * the nullable-field encoding; general unions have no Spark analogue and
    * are rejected at config time (like the reference's codec registry). */
  def toSparkType(schema: Schema): DataType = schema.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      schema.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _                       => BinaryType
      }
    case Schema.Type.RECORD =>
      StructType(schema.getFields.asScala.toSeq.map { f =>
        // P8 schema defaults ride in field metadata, same contract the JSON
        // schema path uses (RecordMapper.schemaDefault)
        val md = new MetadataBuilder()
        if (f.hasDefaultValue && f.defaultVal() != null &&
            f.defaultVal() != org.apache.avro.JsonProperties.NULL_VALUE)
          md.putString("default", f.defaultVal().toString)
        StructField(f.name, toSparkType(f.schema), nullable = true, md.build())
      })
    case Schema.Type.ARRAY =>
      ArrayType(toSparkType(schema.getElementType))
    case Schema.Type.MAP =>
      MapType(StringType, toSparkType(schema.getValueType))
    case Schema.Type.UNION =>
      toSparkType(nonNullBranch(schema))
    case Schema.Type.NULL => NullType
    case other =>
      throw new IllegalArgumentException(s"unsupported Avro type $other")
  }

  private def nonNullBranch(union: Schema): Schema = {
    val branches = union.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    require(branches.size == 1,
      s"only (null, T) unions are supported, got $union")
    branches.head
  }

  // ------------------------------------------------------- decode direction

  /** Converter from a decoded Avro datum to the Catalyst value of the
    * corresponding Spark type. Built once per expression, walked per row. */
  private[functions] def avroToCatalyst(schema: Schema): Any => Any =
    schema.getType match {
      case Schema.Type.UNION => avroToCatalyst(nonNullBranch(schema))
      case Schema.Type.BOOLEAN | Schema.Type.INT | Schema.Type.LONG |
           Schema.Type.FLOAT | Schema.Type.DOUBLE => identity
      case Schema.Type.STRING | Schema.Type.ENUM =>
        v => UTF8String.fromString(v.toString)
      case Schema.Type.BYTES =>
        schema.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            v => decimalFromBytes(byteBufferBytes(v), d)
          case _ => v => byteBufferBytes(v)
        }
      case Schema.Type.FIXED =>
        schema.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            v => decimalFromBytes(v.asInstanceOf[GenericFixed].bytes().clone(), d)
          case _ => v => v.asInstanceOf[GenericFixed].bytes().clone()
        }
      case Schema.Type.RECORD =>
        val fields = schema.getFields.asScala.toArray
        val convs = fields.map(f => avroToCatalyst(f.schema))
        v => {
          val rec = v.asInstanceOf[GenericRecord]
          val out = new Array[Any](fields.length)
          var i = 0
          while (i < fields.length) {
            val fv = rec.get(fields(i).pos)
            out(i) = if (fv == null) null else convs(i)(fv)
            i += 1
          }
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
        }
      case Schema.Type.ARRAY =>
        val conv = avroToCatalyst(schema.getElementType)
        v => new GenericArrayData(
          v.asInstanceOf[java.util.Collection[Any]].asScala
            .map(e => if (e == null) null else conv(e)).toArray)
      case Schema.Type.MAP =>
        val conv = avroToCatalyst(schema.getValueType)
        v => {
          val m = v.asInstanceOf[java.util.Map[Any, Any]].asScala
          ArrayBasedMapData(
            m.keys.map(k => UTF8String.fromString(k.toString)).toArray,
            m.values.map(e => if (e == null) null else conv(e)).toArray)
        }
      case Schema.Type.NULL => _ => null
      case other =>
        throw new IllegalArgumentException(s"unsupported Avro type $other")
    }

  private def byteBufferBytes(v: Any): Array[Byte] = v match {
    case bb: java.nio.ByteBuffer =>
      val dup = bb.duplicate()
      val out = new Array[Byte](dup.remaining())
      dup.get(out)
      out
    case arr: Array[Byte] => arr
  }

  private def decimalFromBytes(bytes: Array[Byte], d: LogicalTypes.Decimal): Decimal =
    Decimal(new java.math.BigDecimal(new java.math.BigInteger(bytes), d.getScale),
      d.getPrecision, d.getScale)

  // ------------------------------------------------------- encode direction

  /** Converter from a Catalyst value (of `spark` type) to the Avro datum the
    * writer expects. Used by [[AvroEncodeExpression]] — the test-harness /
    * produce side of the wire. */
  private[functions] def catalystToAvro(spark: DataType, schema: Schema): Any => Any =
    (spark, schema.getType) match {
      case (_, Schema.Type.UNION) => catalystToAvro(spark, nonNullBranch(schema))
      case (BooleanType | IntegerType | LongType | FloatType | DoubleType, _) =>
        identity
      case (StringType, Schema.Type.ENUM) =>
        v => new GenericData.EnumSymbol(schema, v.toString)
      case (StringType, _) => v => v.toString
      case (BinaryType, Schema.Type.FIXED) =>
        v => new GenericData.Fixed(schema, v.asInstanceOf[Array[Byte]])
      case (BinaryType, _) =>
        v => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case (dt: DecimalType, _) =>
        v => java.nio.ByteBuffer.wrap(
          v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue().toByteArray)
      case (st: StructType, Schema.Type.RECORD) =>
        val fields = schema.getFields.asScala.toArray
        val convs = st.fields.zip(fields).map { case (sf, af) =>
          catalystToAvro(sf.dataType, af.schema)
        }
        v => {
          val row = v.asInstanceOf[InternalRow]
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < fields.length) {
            val fv = if (row.isNullAt(i)) null
              else convs(i)(row.get(i, st.fields(i).dataType))
            rec.put(fields(i).pos, fv)
            i += 1
          }
          rec
        }
      case (at: ArrayType, Schema.Type.ARRAY) =>
        val conv = catalystToAvro(at.elementType, schema.getElementType)
        v => {
          val arr = v.asInstanceOf[ArrayData].toObjectArray(at.elementType)
          arr.map(e => if (e == null) null else conv(e)).toSeq.asJava
        }
      case (mt: MapType, Schema.Type.MAP) =>
        val conv = catalystToAvro(mt.valueType, schema.getValueType)
        v => {
          val m = v.asInstanceOf[MapData]
          val keys = m.keyArray().toObjectArray(StringType)
          val vals = m.valueArray().toObjectArray(mt.valueType)
          val out = new java.util.HashMap[String, Any](keys.length)
          var i = 0
          while (i < keys.length) {
            out.put(keys(i).toString,
              if (vals(i) == null) null else conv(vals(i)))
            i += 1
          }
          out
        }
      case (dt, at) =>
        throw new IllegalArgumentException(s"cannot encode $dt as Avro $at")
    }

  // ------------------------------------------------------------ column API

  def from_avro_binary(c: Column, schemaJson: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      AvroDecodeExpression(org.apache.spark.sql.GraftBridge.expression(c), schemaJson))

  def to_avro_binary(c: Column, schemaJson: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      AvroEncodeExpression(org.apache.spark.sql.GraftBridge.expression(c), schemaJson))
}

/**
 * Decode Avro-binary bytes against a (config-time constant) writer schema.
 * Malformed bytes → null (a capturable parse failure upstream, Codecs.tryCast
 * semantics — reference F3: bad records dead-letter, never throw the task).
 */
case class AvroDecodeExpression(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val avroSchema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader = new GenericDatumReader[Any](avroSchema)
  @transient private lazy val converter = AvroCodec.avroToCatalyst(avroSchema)
  @transient private lazy val sparkType = AvroCodec.toSparkType(avroSchema)

  override def dataType: DataType = sparkType
  override def nullable: Boolean = true
  override def prettyName: String = "from_avro_binary"

  override protected def nullSafeEval(input: Any): Any = {
    try {
      val decoder = DecoderFactory.get()
        .binaryDecoder(input.asInstanceOf[Array[Byte]], null)
      val datum = reader.read(null, decoder)
      if (datum == null) null else converter(datum)
    } catch { case NonFatal(_) => null }
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecodeExpression =
    copy(child = newChild)
}

/** Encode a (struct-typed) column as Avro binary under the given schema —
  * the produce side of the wire, used by specs and pipelines that re-emit. */
case class AvroEncodeExpression(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val avroSchema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val writer = new GenericDatumWriter[Any](avroSchema)
  @transient private lazy val converter =
    AvroCodec.catalystToAvro(child.dataType, avroSchema)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "to_avro_binary"

  override protected def nullSafeEval(input: Any): Any = {
    val baos = new ByteArrayOutputStream()
    val encoder = EncoderFactory.get().binaryEncoder(baos, null)
    writer.write(converter(input), encoder)
    encoder.flush()
    baos.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): AvroEncodeExpression =
    copy(child = newChild)
}
