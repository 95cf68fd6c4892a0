package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.{LongArrayDotExpr, LongArrayNorm2Expr, StringFoldHashExpr, TimeUuidExpression}

/**
 * SparkSessionExtensions hook: registers graft's custom expressions as SQL
 * functions so `spark.sql` users get the same surface as the Column API —
 *
 *   now_timeuuid()        fresh RFC-4122 v1 TIMEUUID per row per call
 *   graft_fold_hash(s)    the engine's portable string hash
 *   graft_qdot(a, b)      codegen'd int64 dot product over array<long>
 *   graft_qnorm2(a)       codegen'd int64 squared norm over array<long>
 *
 * Wire up with:
 *   SparkSession.builder().withExtensions(new GraftExtensions) ...
 * or `--conf spark.sql.extensions=graft.GraftExtensions` on a cluster.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("now_timeuuid"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TimeUuidExpression].getName, "now_timeuuid"),
      (_: Seq[Expression]) => TimeUuidExpression()))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_fold_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[StringFoldHashExpr].getName, "graft_fold_hash"),
      (args: Seq[Expression]) => StringFoldHashExpr(args.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_qdot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LongArrayDotExpr].getName, "graft_qdot"),
      (args: Seq[Expression]) => LongArrayDotExpr(args.head, args(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_qnorm2"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LongArrayNorm2Expr].getName, "graft_qnorm2"),
      (args: Seq[Expression]) => LongArrayNorm2Expr(args.head)))
  }
}
