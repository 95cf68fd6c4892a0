package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, ShiftRight}

/** Exact integer Column arithmetic shared by the oracle-matched operators.
  * Spark's `/` on integral columns is DOUBLE division (a 53-bit mantissa
  * loses exactness right where the fixed-point scores live), so integral
  * division must go through Catalyst's `DIV`. */
object IntMath {

  /** `a DIV b` — truncating int64 division (= floor for the all-positive
    * operands the fixed-point score arithmetic uses). */
  def idiv(a: Column, b: Column): Column =
    GraftBridge.column(new IntegralDivide(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** `a >> bits` with a COLUMN bit count (`functions.shiftright` only takes
    * a literal). Arithmetic shift — equals floor division by 2^bits for the
    * non-negative operands used here. */
  def shr(a: Column, bits: Column): Column =
    GraftBridge.column(ShiftRight(
      GraftBridge.expression(a),
      GraftBridge.expression(bits.cast(org.apache.spark.sql.types.IntegerType))))

  /** `a << bits` with a COLUMN bit count — multiplication by 2^bits for
    * the small non-negative operands used here (caller bounds the shift). */
  def shl(a: Column, bits: Column): Column =
    GraftBridge.column(org.apache.spark.sql.catalyst.expressions.ShiftLeft(
      GraftBridge.expression(a),
      GraftBridge.expression(bits.cast(org.apache.spark.sql.types.IntegerType))))
}
