package graft.functions

import java.util.concurrent.TimeUnit

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mapping.SinkConfig.CodecSettings

/**
 * Scalar conversion layer: (source column, target type, codec settings) →
 * Column. Re-expresses the reference's implicit ConvertingCodec casts
 * (reference: sink/src/it/.../StructEndToEndCCMIT.java:65-79 — string/number
 * inputs accepted for every CQL scalar; sink/src/it/.../JsonEndToEndCCMIT.java:302-372
 * — pattern/unit-driven temporal parsing) as Catalyst column expressions, so
 * Catalyst codegen compiles the conversion once per batch instead of
 * dispatching per record.
 */
object Codecs {

  /** Number of target units in one source unit, as a decimal multiplier
    * pair (numerator, denominator) to keep integer arithmetic exact. */
  private def unitRatio(from: TimeUnit, to: TimeUnit): (Long, Long) = {
    val fromNanos = from.toNanos(1)
    val toNanos = to.toNanos(1)
    if (fromNanos >= toNanos) (fromNanos / toNanos, 1L) else (1L, toNanos / fromNanos)
  }

  /** Convert a numeric duration column between time units with truncation
    * (matches java.util.concurrent.TimeUnit.convert semantics used by the
    * reference for `__ttl` / `__timestamp`, reference:
    * sink/src/it/.../WriteTimestampAndTtlCCMIT.java:73-160). */
  def convertUnits(col: Column, from: TimeUnit, to: TimeUnit): Column = {
    val (num, den) = unitRatio(from, to)
    if (den == 1L) col.cast(LongType) * lit(num)
    else (col.cast(LongType) / lit(den)).cast(LongType) // integer division truncates
  }

  /** TTL codec: convert to seconds, clamp negatives to 0
    * (reference: WriteTimestampAndTtlCCMIT.java:138-160, negative → 0). */
  def ttlSeconds(col: Column, unit: TimeUnit): Column =
    greatest(convertUnits(col, unit, TimeUnit.SECONDS), lit(0L))

  /** Writetime codec: numeric field in `unit` → microseconds; fallback to the
    * Kafka record timestamp (milliseconds) × 1000
    * (reference: WriteTimestampAndTtlCCMIT.java:45-70 — record ts 153000987
    * ms becomes writetime 153000987000 µs). */
  def writetimeMicros(field: Option[Column], unit: TimeUnit, recordTsMillis: Column): Column = {
    val fallback = recordTsMillis.cast(LongType) * lit(1000L)
    field match {
      case Some(c) => coalesce(convertUnits(c, unit, TimeUnit.MICROSECONDS), fallback)
      case None    => fallback
    }
  }

  /** Temporal parse driven by codec settings: `UNITS_SINCE_EPOCH` uses the
    * configured unit; `CQL_TIMESTAMP`/ISO default parses ISO-8601; any other
    * value is a DateTimeFormatter pattern (reference:
    * JsonEndToEndCCMIT.java:302-372; dist/conf/...properties.sample:187-225).
    *
    * `codec.timeZone` (reference: ...properties.sample:187-225 — "the time
    * zone to use when parsing temporals that do not carry one") applies to
    * explicit patterns with no zone token: the parsed wall-clock time is
    * interpreted in that zone and converted to UTC. Patterns that parse a
    * zone (X/x/Z/z/V/O tokens) and the ISO forms keep their own offsets. */
  def parseTimestamp(col: Column, codec: CodecSettings): Column = codec.timestamp match {
    case "UNITS_SINCE_EPOCH" =>
      val micros = convertUnits(col, TimeUnit.valueOf(codec.unit), TimeUnit.MICROSECONDS)
      timestamp_micros(micros)
    case "CQL_TIMESTAMP" | "ISO_ZONED_DATE_TIME" | "ISO_INSTANT" =>
      to_timestamp(col)
    case pattern =>
      if (codec.locale != "en_US" && patternLocaleSensitive(pattern))
        // locale-dependent text fields (month/day names, am/pm): Spark's
        // to_timestamp always parses with the session locale — custom
        // expression handles locale AND the zone-less-pattern timeZone rule
        LocaleTimestampParse.locale_to_timestamp(col, pattern,
          codec.locale, codec.timeZone)
      else {
        val parsed = to_timestamp(col, pattern)
        if (codec.timeZone != "UTC" && !patternHasZone(pattern))
          to_utc_timestamp(parsed, codec.timeZone)
        else parsed
      }
  }

  /** Does the pattern parse its own zone/offset? Quoted literal sections are
    * stripped first — `yyyy-MM-dd'T'HH:mm:ss'Z'` carries a LITERAL Z, not a
    * zone field, and must still get `codec.timeZone` applied. */
  private[functions] def patternHasZone(pattern: String): Boolean =
    stripQuoted(pattern).exists("XxZzVO".contains(_))

  /** Does the pattern contain locale-dependent TEXT fields (month/day-of-week
    * names, am/pm, era)? Numeric-only patterns (MM, dd, …) parse identically
    * in every locale, so they stay on the codegen'd to_timestamp path. */
  private[functions] def patternLocaleSensitive(pattern: String): Boolean = {
    val p = stripQuoted(pattern)
    // MMM/LLL month names, ccc/QQQ/qqq text quarters & standalone days; E
    // (day-of-week), a (am/pm), G (era) are text at any repeat count
    Seq("MMM", "LLL", "ccc", "QQQ", "qqq").exists(p.contains) ||
      p.exists("EaG".contains(_))
  }

  /** Remove `'...'` literal sections (and `''` escaped quotes) from a
    * DateTimeFormatter pattern, leaving only live pattern letters. */
  private def stripQuoted(pattern: String): String =
    pattern.replace("''", "").replaceAll("'[^']*'", "")

  def parseDate(col: Column, codec: CodecSettings): Column = codec.date match {
    case "ISO_LOCAL_DATE" => to_date(col)
    case pattern if codec.locale != "en_US" =>
      // locale-dependent pattern (e.g. `cccc, d MMMM uuuu` + fr_FR): Spark's
      // to_date always uses the session locale — custom expression needed
      LocaleDateParse.locale_to_date(col, pattern, codec.locale)
    case pattern => to_date(col, pattern)
  }

  /** CQL `time` is a nanos-of-day long; `codec.time` drives the parse:
    * `ISO_LOCAL_TIME` (default) accepts HH:mm:ss[.SSS]; any other value is a
    * time-of-day DateTimeFormatter pattern (reference:
    * JsonEndToEndCCMIT.java:302-372 — `codec.time` patterns; time-of-day is
    * zone-less, so `codec.timeZone` does not apply). */
  def parseTimeNanos(col: Column, codec: CodecSettings = CodecSettings()): Column = {
    val t = codec.time match {
      case "ISO_LOCAL_TIME" => to_timestamp(concat(lit("1970-01-01 "), col))
      // time-only pattern: parsed onto the epoch date, so micros-since-epoch
      // IS micros-of-day
      case pattern => to_timestamp(col, pattern)
    }
    (unix_micros(t) * lit(1000L)).cast(LongType)
  }

  /** Decimal parse driven by `codec.decimal` (reference C8): `NUMERIC`
    * (default) parses decimal strings/numbers; `BASE64` decodes the base64
    * of the unscaled two's-complement big-endian bytes, scale taken from the
    * target type — the Avro logical-decimal wire form (reference:
    * sink/src/test/.../AvroJsonConvertersTest.java:80-158). */
  def parseDecimal(col: Column, target: DecimalType, codec: CodecSettings): Column =
    codec.decimal match {
      case "BASE64" =>
        // try_to_binary: malformed base64 → null (unbase64 throws)
        BigEndian.bytes_to_decimal(
          call_function("try_to_binary", col.cast(StringType), lit("base64")),
          target.precision, target.scale)
      case _ => tryCastCol(col, target)
    }

  // ------------------------------------------------------------ struct/UDT

  /** Source-type-aware cast: structural targets route through
    * [[castToStruct]]; everything else is a TRY-mode cast. */
  def castAny(c: Column, srcType: DataType, target: DataType): Column =
    (srcType, target) match {
      case (s, t) if s == t    => c
      case (s, t: StructType)  => castToStruct(c, s, t)
      case (_, t)              => tryCastCol(c, t)
    }

  /**
   * Struct-target codec (reference C1): a UDT/tuple column accepts
   *  - STRUCT input → by field name (missing source field → null),
   *  - MAP input → by key lookup,
   *  - ARRAY input → positional (the reference's ARRAY→UDT and ARRAY→tuple,
   *    reference: sink/src/it/.../StructEndToEndCCMIT.java:138,140,247-248;
   *    tuple DDL EndToEndCCMITBase.java:77),
   *  - JSON text → one `from_json` with the target schema (JSON-doc→UDT).
   * Spark's `Cast` cannot express map→struct or array→struct, so the struct
   * is built field-wise with per-field TRY casts; a null input stays a null
   * struct (not a struct of nulls).
   */
  def castToStruct(c: Column, srcType: DataType, target: StructType): Column = {
    val built = srcType match {
      case st: StructType =>
        struct(target.fields.toSeq.map { f =>
          st.fields.find(_.name == f.name)
            .map(sf => castAny(c.getField(f.name), sf.dataType, f.dataType))
            .getOrElse(lit(null).cast(f.dataType))
            .as(f.name)
        }: _*)
      case mt: MapType =>
        struct(target.fields.toSeq.map { f =>
          castAny(try_element_at(c, lit(f.name).cast(mt.keyType)),
            mt.valueType, f.dataType).as(f.name)
        }: _*)
      case at: ArrayType =>
        struct(target.fields.toSeq.zipWithIndex.map { case (f, i) =>
          castAny(try_element_at(c, lit(i + 1)), at.elementType, f.dataType)
            .as(f.name)
        }: _*)
      case StringType =>
        // from_json is PERMISSIVE (malformed → struct of nulls); gate it on
        // get_json_object('$'), which is null exactly when the text is not
        // valid JSON — malformed input becomes a null struct (capturable)
        when(get_json_object(c, "$").isNull, lit(null).cast(target))
          .otherwise(from_json(c, target))
      case _          => tryCastCol(c, target)
    }
    srcType match {
      case _: StructType | _: MapType | _: ArrayType =>
        when(c.isNull, lit(null).cast(target)).otherwise(built)
      case _ => built
    }
  }

  /**
   * Map-target codec (reference C1's collection leg, required by
   * `mergeMode=entry` targets): a map column accepts
   *  - MAP input → per-entry key/value casts,
   *  - STRUCT input → field-name→key entries (the struct viewed as a map),
   *  - JSON text → one `from_json` with the target map schema
   *    (`{"a": null}` keeps the null VALUE — the entry-removal marker the
   *    entry merge relies on under `nullToUnset=false`).
   * Spark's `Cast` cannot express string→map or struct→map, hence the
   * field-wise builders, mirroring [[castToStruct]].
   */
  def castToMap(c: Column, srcType: DataType, target: MapType): Column = {
    // a key the cast can't represent must DROP (route), not feed a null
    // into map_from_entries (which throws, aborting the batch)
    def fold(entries: Column): Column =
      map_from_entries(filter(entries, e => e.getField("key").isNotNull))
    val built = srcType match {
      case mt: MapType =>
        fold(transform(map_entries(c), e => struct(
          castAny(e.getField("key"), mt.keyType, target.keyType).as("key"),
          castAny(e.getField("value"), mt.valueType, target.valueType)
            .as("value"))))
      case st: StructType =>
        fold(array(st.fields.toSeq.map(f => struct(
          tryCastCol(lit(f.name), target.keyType).as("key"),
          castAny(c.getField(f.name), f.dataType, target.valueType)
            .as("value"))): _*))
      case StringType =>
        when(get_json_object(c, "$").isNull, lit(null).cast(target))
          .otherwise(from_json(c, target))
      case _ => tryCastCol(c, target)
    }
    srcType match {
      case _: MapType | _: StructType =>
        when(c.isNull, lit(null).cast(target)).otherwise(built)
      case _ => built
    }
  }

  /**
   * Failure-capturing cast (reference C5): the reference surfaces a parse
   * failure per record (`Could not parse 'bad key'`, reference:
   * sink/src/it/.../SimpleEndToEndSimulacronIT.java:464-465) instead of
   * silently writing null. Returns (value, error) where exactly one is set:
   * a cast that nulls a non-null input yields an error message.
   */
  def tryCast(col: Column, to: DataType): (Column, Column) = {
    val casted = tryCastCol(col, to)
    val err = when(col.isNotNull && casted.isNull,
      concat(lit("Could not parse '"), col.cast(StringType), lit("'"))).otherwise(lit(null))
    (casted, err)
  }

  /** try_cast as a Column op: never throws, even under ANSI mode. */
  def tryCastCol(col: Column, to: DataType): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode}
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(Cast(GraftBridge.expression(col), to, None, EvalMode.TRY))
  }

  // ------------------------------------------------------- geo / date-range

  private val Num = """[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"""
  private val PointRe = s"""^\\s*POINT\\s*\\(\\s*$Num\\s+$Num\\s*\\)\\s*$$"""
  private val LineStringRe =
    s"""^\\s*LINESTRING\\s*\\(\\s*$Num\\s+$Num(?:\\s*,\\s*$Num\\s+$Num)+\\s*\\)\\s*$$"""
  private val PolygonRe =
    s"""^\\s*POLYGON\\s*\\(\\s*\\(\\s*$Num\\s+$Num(?:\\s*,\\s*$Num\\s+$Num){2,}\\s*\\)""" +
      s"""(?:\\s*,\\s*\\(\\s*$Num\\s+$Num(?:\\s*,\\s*$Num\\s+$Num){2,}\\s*\\))*\\s*\\)\\s*$$"""
  /** `[* TO 2014-12-01]`, `[2010 TO *]`, a bare date/`*` — the DSE DateRange
    * literal shapes (reference: sink/src/it/.../StructEndToEndCCMIT.java:263-281). */
  private val DateBound = """(?:\*|\d{4}(?:-\d{2}(?:-\d{2})?)?(?:T[0-9:.]+Z?)?)"""
  private val DateRangeRe = s"""^\\s*(?:\\[$DateBound TO $DateBound\\]|$DateBound)\\s*$$"""

  /**
   * WKT / DateRange carrier validation (reference C7): DSE geo types arrive
   * as WKT strings and DateRange as range literals; we keep them as validated
   * strings (the strategy SURVEY §2.4 picks) — a malformed literal becomes a
   * capturable parse failure, not a silent pass-through.
   */
  /** The validation pattern for a WKT/DateRange kind — Java∩RE2 dialect, so
    * an oracle can embed it verbatim. */
  def wktPattern(kind: String): String = kind.toUpperCase match {
    case "POINT"      => PointRe
    case "LINESTRING" => LineStringRe
    case "POLYGON"    => PolygonRe
    case "DATERANGE"  => DateRangeRe
    case other => throw new IllegalArgumentException(s"unknown WKT kind $other")
  }

  def validateWkt(col: Column, kind: String): (Column, Column) = {
    val re = wktPattern(kind)
    val ok = upper(col).rlike(re)
    val valid = when(col.isNotNull && ok, col)
    val err = when(col.isNotNull && !ok,
      concat(lit("Could not parse '"), col, lit(s"' as $kind"))).otherwise(lit(null))
    (valid, err)
  }
}
