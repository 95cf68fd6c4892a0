package graft.functions

import java.time.LocalDate
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField
import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DateType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Locale-sensitive date parsing — the codec case Spark's builtin
 * `to_date(col, fmt)` cannot express (it always parses with the session
 * locale). The reference's codec settings accept locale-dependent patterns
 * like `cccc, d MMMM uuuu` + `locale=fr_FR` per topic (reference:
 * dist/conf/cassandra-sink-standalone.properties.sample:187-225;
 * sink/src/it/.../JsonEndToEndCCMIT.java:302-372 exercises pattern-driven
 * parsing).
 *
 * Formatter is built once per expression instance (config-time constant
 * pattern/locale, like the reference's prepare-once codec registry);
 * unparseable input → null (route to the dead letter with Codecs.tryCast
 * semantics upstream). CodegenFallback: called once per row on a string —
 * formatter cost dominates, codegen would not help.
 */
case class LocaleDateParse(child: Expression, pattern: String, localeTag: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val formatter: DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .appendPattern(pattern)
      .toFormatter(Locale.forLanguageTag(localeTag.replace('_', '-')))

  override def dataType: DataType = DateType
  override def nullable: Boolean = true
  override def prettyName: String = "locale_to_date"

  override protected def nullSafeEval(input: Any): Any = {
    try {
      val d = LocalDate.parse(input.asInstanceOf[UTF8String].toString, formatter)
      // DateType physical form: days since epoch
      java.lang.Integer.valueOf(d.getLong(ChronoField.EPOCH_DAY).toInt)
    } catch {
      case _: java.time.format.DateTimeParseException => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): LocaleDateParse =
    copy(child = newChild)
}

object LocaleDateParse {
  def locale_to_date(c: Column, pattern: String, locale: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      LocaleDateParse(org.apache.spark.sql.GraftBridge.expression(c), pattern, locale))
}
