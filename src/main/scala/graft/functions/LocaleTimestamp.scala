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

/**
 * Locale-sensitive TIMESTAMP parsing — the [[LocaleDateParse]] rule extended
 * to full instants (reference codec settings allow `codec.timestamp`
 * patterns with month/day names + `codec.locale`, reference:
 * dist/conf/cassandra-sink-standalone.properties.sample:187-225).
 *
 * Zone rule matches [[Codecs.parseTimestamp]]: a zone/offset the PATTERN
 * parses wins; otherwise the wall-clock time is interpreted in `zone`
 * (`codec.timeZone`, "UTC" default) and converted to the UTC instant.
 * Missing time-of-day fields default to 0 (a date-only pattern parses to
 * midnight), like the reference's temporal codec defaulting.
 */
case class LocaleTimestampParse(child: Expression, pattern: String,
    localeTag: String, zone: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val formatter: DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .appendPattern(pattern)
      .parseDefaulting(ChronoField.HOUR_OF_DAY, 0)
      .parseDefaulting(ChronoField.MINUTE_OF_HOUR, 0)
      .parseDefaulting(ChronoField.SECOND_OF_MINUTE, 0)
      .toFormatter(Locale.forLanguageTag(localeTag.replace('_', '-')))

  @transient private lazy val fallbackZone = java.time.ZoneId.of(zone)

  override def dataType: DataType = org.apache.spark.sql.types.TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "locale_to_timestamp"

  override protected def nullSafeEval(input: Any): Any = {
    try {
      val parsed = formatter.parse(input.asInstanceOf[UTF8String].toString)
      val ldt = java.time.LocalDateTime.from(parsed)
      val parsedZone = parsed.query(java.time.temporal.TemporalQueries.zone())
      val instant =
        ldt.atZone(if (parsedZone != null) parsedZone else fallbackZone).toInstant
      // TimestampType physical form: micros since epoch
      java.lang.Long.valueOf(
        Math.addExact(Math.multiplyExact(instant.getEpochSecond, 1000000L),
          instant.getNano / 1000L))
    } catch {
      case _: java.time.DateTimeException | _: ArithmeticException => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): LocaleTimestampParse =
    copy(child = newChild)
}

object LocaleTimestampParse {
  def locale_to_timestamp(c: Column, pattern: String, locale: String,
      zone: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      LocaleTimestampParse(org.apache.spark.sql.GraftBridge.expression(c),
        pattern, locale, zone))
}
