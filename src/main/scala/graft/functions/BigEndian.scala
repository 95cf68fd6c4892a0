package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types._

/**
 * Big-endian byte-order conversions, the binary leg of two codec families:
 *
 *  - BASE64 decimal format (reference C8): a decimal arrives as the base64
 *    of its unscaled two's-complement big-endian bytes (Avro logical
 *    decimals; reference: sink/src/test/.../AvroJsonConvertersTest.java:80-158)
 *    — `unbase64` then [[BytesToDecimal]].
 *  - Typed header values (reference: sink/src/it/.../HeadersCCMIT.java:330-518):
 *    Kafka header bytes carry big-endian numbers (int 4, long 8, double 8
 *    IEEE-754) usable for any column including `__ttl`/`__timestamp`.
 *
 * [[BytesToLong]]/[[BytesToDouble]] are total functions over binary input
 * and stay inside whole-stage codegen (a static helper call — no UDF, no
 * interpreted lambda). [[BytesToDecimal]] can fail (overflow past the
 * target precision) and is config-rare, so it evaluates via
 * CodegenFallback with an explicit null on failure.
 */
object BigEndianHelper {

  /** Sign-extended big-endian → long. Empty → 0; if longer than 8 bytes the
    * low (trailing) 8 carry the value, like a narrowing integral cast. */
  def bytesToLong(b: Array[Byte]): Long = {
    if (b.isEmpty) return 0L
    val start = math.max(0, b.length - 8)
    var v: Long = if (b(start) < 0 && b.length <= 8) -1L else 0L
    var i = start
    while (i < b.length) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  /** 8-byte IEEE-754 big-endian → double (Kafka Serdes double layout). */
  def bytesToDouble(b: Array[Byte]): Double =
    java.lang.Double.longBitsToDouble(bytesToLong(b))

  /** Two's-complement unscaled big-endian bytes + scale → Decimal;
    * null on empty input or precision overflow. */
  def bytesToDecimal(b: Array[Byte], precision: Int, scale: Int): Decimal = {
    if (b == null || b.isEmpty) return null
    val bi = new java.math.BigInteger(b)
    val d = Decimal(new java.math.BigDecimal(bi, scale))
    if (d.changePrecision(precision, scale)) d else null
  }

  /** Long → big-endian bytes of the given width (value truncates to fit —
    * the encode twin of [[bytesToLong]], used by tests and benches). */
  def longToBytes(v: Long, width: Int): Array[Byte] = {
    val out = new Array[Byte](width)
    var i = width - 1
    var x = v
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }
}

case class BytesToLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "be_bytes_to_long"
  override protected def nullSafeEval(input: Any): Any =
    BigEndianHelper.bytesToLong(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigEndianHelper.bytesToLong($c)")
  override protected def withNewChildInternal(newChild: Expression): BytesToLong =
    copy(child = newChild)
}

case class BytesToDouble(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "be_bytes_to_double"
  override protected def nullSafeEval(input: Any): Any =
    BigEndianHelper.bytesToDouble(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigEndianHelper.bytesToDouble($c)")
  override protected def withNewChildInternal(newChild: Expression): BytesToDouble =
    copy(child = newChild)
}

case class BytesToDecimal(child: Expression, precision: Int, scale: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DecimalType(precision, scale)
  override def nullable: Boolean = true
  override def prettyName: String = "be_bytes_to_decimal"
  override protected def nullSafeEval(input: Any): Any =
    BigEndianHelper.bytesToDecimal(input.asInstanceOf[Array[Byte]], precision, scale)
  override protected def withNewChildInternal(newChild: Expression): BytesToDecimal =
    copy(child = newChild)
}

case class LongToBytes(child: Expression, width: Int) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "long_to_be_bytes"
  override protected def nullSafeEval(input: Any): Any =
    BigEndianHelper.longToBytes(input.asInstanceOf[Long], width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigEndianHelper.longToBytes($c, $width)")
  override protected def withNewChildInternal(newChild: Expression): LongToBytes =
    copy(child = newChild)
}

object BigEndian {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def bytes_to_long(c: Column): Column = column(BytesToLong(expression(c)))
  def bytes_to_double(c: Column): Column = column(BytesToDouble(expression(c)))
  def bytes_to_decimal(c: Column, precision: Int, scale: Int): Column =
    column(BytesToDecimal(expression(c), precision, scale))
  def long_to_bytes(c: Column, width: Int): Column =
    column(LongToBytes(expression(c), width))
}
