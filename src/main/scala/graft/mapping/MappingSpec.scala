package graft.mapping

/**
 * The mapping DSL: a comma-separated list of `column = field` entries that
 * projects record fields onto sink-table columns.
 *
 * Semantics re-derived from the reference grammar
 * (reference: sink/src/main/antlr4/com/datastax/oss/kafka/generated/schema/Mapping.g4:22-74)
 * and its end-to-end behavior:
 *
 *  - Tokens: UNQUOTED `[A-Za-z0-9_]+`, QUOTED `"..."` with `""` escaping,
 *    punctuation `=` `,` `.` `(` `)`; whitespace ignored (Mapping.g4:59-73).
 *  - A field is a dotted path (`value.f1`), a quoted literal, or a function
 *    call (`now()`) (Mapping.g4:30-34).
 *  - The first path step must be `key`, `value`, or `header` — bare `key` /
 *    `value` address the whole object; bare `header` is illegal
 *    (reference: sink/src/it/.../HeadersCCMIT.java:520-541 pins the error
 *    message listing the legal surface).
 *  - Inside a quoted field, the first `.` separates the prefix from a
 *    *literal* (possibly dotted, case-sensitive) field name — the grammar
 *    cannot express nested paths beyond one step
 *    (reference: sink/src/it/.../StructEndToEndCCMIT.java:612-668 maps
 *    `"value.TEXT.FIELD"` to the single field named `TEXT.FIELD`).
 *  - Target pseudo-columns `__ttl` / `__timestamp` set per-row TTL /
 *    writetime (reference: sink/src/it/.../WriteTimestampAndTtlCCMIT.java:45-160).
 */
object MappingSpec {

  sealed trait Prefix
  object Prefix {
    case object Key extends Prefix
    case object Value extends Prefix
    case object Header extends Prefix
  }

  /** Right-hand side of a mapping entry. */
  sealed trait Source
  /** Bare `key` / `value`: the whole object (RawData.FIELD_NAME `__self`). */
  case class WholeObject(prefix: Prefix) extends Source
  /** `value.f1`, `key.f`, `header.h`, or quoted one-step literal path. */
  case class FieldRef(prefix: Prefix, field: String) extends Source
  /** `now()` — the only function in the reference surface (§2.9). */
  case class FunctionCall(name: String, args: Seq[String]) extends Source

  /** Left-hand side of a mapping entry. Column name is case-preserved. */
  sealed trait Target { def name: String }
  case class ColumnTarget(name: String) extends Target
  case object TtlTarget extends Target { val name = "__ttl" }
  case object TimestampTarget extends Target { val name = "__timestamp" }

  case class Entry(target: Target, source: Source)

  case class ParseException(msg: String) extends IllegalArgumentException(msg)

  val LegalSurfaceMsg =
    "field must be 'key', 'value', or start with 'key.' or 'value.' or " +
      "'header.', or be one of supported functions: '[now()]'"

  // ---------------------------------------------------------------- lexer

  private sealed trait Tok
  private case class Unquoted(s: String) extends Tok
  private case class Quoted(s: String) extends Tok
  private case class Sym(c: Char) extends Tok

  private def lex(input: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
      else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val d = input.charAt(i)
          if (d == '"') {
            if (i + 1 < n && input.charAt(i + 1) == '"') { sb.append('"'); i += 2 }
            else { closed = true; i += 1 }
          } else { sb.append(d); i += 1 }
        }
        if (!closed) throw ParseException(s"unterminated quoted string in mapping: $input")
        toks += Quoted(sb.toString)
      } else if (c.isLetterOrDigit || c == '_') {
        val start = i
        while (i < n && (input.charAt(i).isLetterOrDigit || input.charAt(i) == '_')) i += 1
        toks += Unquoted(input.substring(start, i))
      } else if (c == '=' || c == ',' || c == '.' || c == '(' || c == ')') {
        toks += Sym(c); i += 1
      } else throw ParseException(s"unexpected character '$c' in mapping at offset $i")
    }
    toks.result()
  }

  // --------------------------------------------------------------- parser

  /** Parse a full mapping string into entries. Duplicate targets are an error. */
  def parse(mapping: String): Seq[Entry] = {
    val toks = lex(mapping)
    if (toks.isEmpty) throw ParseException("empty mapping")
    val entries = Vector.newBuilder[Entry]
    var i = 0

    def expect(sym: Char): Unit = {
      if (i >= toks.length || toks(i) != Sym(sym))
        throw ParseException(s"expected '$sym' at token $i in mapping: $mapping")
      i += 1
    }

    // bounds-checked lookahead: truncated input is a parse error, not an IOOBE
    def cur(): Tok =
      if (i < toks.length) toks(i)
      else throw ParseException(s"unexpected end of mapping: $mapping")

    def parseTarget(): Target = cur() match {
      case Unquoted(s) => i += 1; s match {
        case "__ttl"       => TtlTarget
        case "__timestamp" => TimestampTarget
        case other         => ColumnTarget(other)
      }
      case Quoted(s) => i += 1; ColumnTarget(s)
      case t => throw ParseException(s"expected column name, got $t")
    }

    def parseSource(): Source = cur() match {
      case Quoted(s) =>
        i += 1
        splitQuotedField(s)
      case Unquoted(s) =>
        i += 1
        // function call?
        if (i < toks.length && toks(i) == Sym('(')) {
          i += 1
          val args = Vector.newBuilder[String]
          var done = i < toks.length && toks(i) == Sym(')')
          if (done) i += 1
          while (!done) {
            cur() match {
              case Unquoted(a) => args += a; i += 1
              case Quoted(a)   => args += a; i += 1
              case t           => throw ParseException(s"bad function arg $t")
            }
            cur() match {
              case Sym(',') => i += 1
              case Sym(')') => i += 1; done = true
              case t        => throw ParseException(s"bad function args, got $t")
            }
          }
          val fn = FunctionCall(s, args.result())
          if (fn.name != "now" || fn.args.nonEmpty)
            throw ParseException(LegalSurfaceMsg)
          fn
        } else {
          // dotted path: collect (UNQUOTED | '.')* — Mapping.g4:31
          val sb = new StringBuilder(s)
          while (i < toks.length && (toks(i) == Sym('.') || toks(i).isInstanceOf[Unquoted])) {
            toks(i) match {
              case Sym('.')    => sb.append('.')
              case Unquoted(u) => sb.append(u)
              case _           => ()
            }
            i += 1
          }
          splitUnquotedField(sb.toString)
        }
      case t => throw ParseException(s"expected field, got $t")
    }

    var done = false
    while (!done) {
      val tgt = parseTarget()
      expect('=')
      val src = parseSource()
      entries += Entry(tgt, src)
      if (i >= toks.length) done = true
      else expect(',')
    }

    val result = entries.result()
    val dups = result.groupBy(_.target.name).filter(_._2.size > 1).keys
    if (dups.nonEmpty)
      throw ParseException(s"duplicate mapping targets: ${dups.mkString(", ")}")
    result
  }

  private def prefixOf(s: String): Option[Prefix] = s match {
    case "key"    => Some(Prefix.Key)
    case "value"  => Some(Prefix.Value)
    case "header" => Some(Prefix.Header)
    case _        => None
  }

  /** Unquoted `a.b.c...`: first step is the namespace; the rest is the field
    * (one-level path — inner dots stay literal, matching the grammar's
    * inability to express deeper nesting). */
  private def splitUnquotedField(s: String): Source = {
    val dot = s.indexOf('.')
    if (dot < 0) prefixOf(s) match {
      case Some(Prefix.Header) => throw ParseException(LegalSurfaceMsg)
      case Some(p)             => WholeObject(p)
      case None                => throw ParseException(LegalSurfaceMsg)
    } else {
      val p = prefixOf(s.substring(0, dot)).getOrElse(throw ParseException(LegalSurfaceMsg))
      val field = s.substring(dot + 1)
      if (field.isEmpty) throw ParseException(LegalSurfaceMsg)
      FieldRef(p, field)
    }
  }

  /** Quoted `"value.TEXT.FIELD"`: first dot splits prefix vs literal name. */
  private def splitQuotedField(s: String): Source = {
    val dot = s.indexOf('.')
    if (dot < 0) prefixOf(s) match {
      case Some(Prefix.Header) => throw ParseException(LegalSurfaceMsg)
      case Some(p)             => WholeObject(p)
      case None                => throw ParseException(LegalSurfaceMsg)
    } else splitUnquotedField(s) match {
      case FieldRef(p, f) => FieldRef(p, f)
      case other          => other
    }
  }
}
