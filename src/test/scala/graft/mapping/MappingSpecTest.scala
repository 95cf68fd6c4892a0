package graft.mapping

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}

import MappingSpec._

/** Parser semantics pinned to the reference grammar + tests
  * (reference: Mapping.g4; StructEndToEndCCMIT.java:612-668; HeadersCCMIT.java:520-541). */
class MappingSpecTest extends AnyFunSuite {

  private def assertProp(p: org.scalacheck.Prop): Unit =
    assert(check(Parameters.default.withMinSuccessfulTests(200), p).passed)

  test("simple mapping") {
    val m = parse("bigintcol=value.bigint, loaded_at=now()")
    assert(m == Seq(
      Entry(ColumnTarget("bigintcol"), FieldRef(Prefix.Value, "bigint")),
      Entry(ColumnTarget("loaded_at"), FunctionCall("now", Nil))))
  }

  test("whole-object access: bare key and value") {
    val m = parse("pk=key, doc=value")
    assert(m == Seq(
      Entry(ColumnTarget("pk"), WholeObject(Prefix.Key)),
      Entry(ColumnTarget("doc"), WholeObject(Prefix.Value))))
  }

  test("bare header is rejected with the reference's error surface") {
    val e = intercept[ParseException](parse("c=header"))
    assert(e.getMessage.contains("'key', 'value'"))
  }

  test("header field access") {
    assert(parse("c=header.h1") ==
      Seq(Entry(ColumnTarget("c"), FieldRef(Prefix.Header, "h1"))))
  }

  test("quoted case-sensitive names: first dot splits prefix, rest literal") {
    // reference: StructEndToEndCCMIT.java:624-629
    val m = parse(""""bigint col" = "key.bigint field", "TEXT.COL" = "value.TEXT.FIELD"""")
    assert(m == Seq(
      Entry(ColumnTarget("bigint col"), FieldRef(Prefix.Key, "bigint field")),
      Entry(ColumnTarget("TEXT.COL"), FieldRef(Prefix.Value, "TEXT.FIELD"))))
  }

  test("unquoted dotted path: one namespace step, rest literal") {
    // grammar cannot distinguish f1.f2 from field "f1.f2" (StructEndToEndCCMIT.java:653-655)
    assert(parse("c=value.f1.f2") ==
      Seq(Entry(ColumnTarget("c"), FieldRef(Prefix.Value, "f1.f2"))))
  }

  test("__ttl / __timestamp pseudo-columns") {
    val m = parse("pk=key, __ttl=value.t, __timestamp=value.w")
    assert(m(1).target == TtlTarget && m(2).target == TimestampTarget)
  }

  test("unknown bare field rejected") {
    intercept[ParseException](parse("c=bogus"))
  }

  test("unknown function rejected") {
    intercept[ParseException](parse("c=later()"))
  }

  test("duplicate targets rejected") {
    intercept[ParseException](parse("c=key, c=value"))
  }

  test("escaped double quotes inside quoted names") {
    val m = parse("\"we\"\"ird\"=value.f")
    assert(m.head.target == ColumnTarget("we\"ird"))
  }

  test("property: any identifier pair round-trips") {
    val ident = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    assertProp(forAll(ident, ident) { (c: String, f: String) =>
      (c.isEmpty || f.isEmpty || c == "__ttl" || c == "__timestamp") ||
        parse(s"$c=value.$f") == Seq(Entry(ColumnTarget(c), FieldRef(Prefix.Value, f)))
    })
  }

  test("property: whitespace insensitivity") {
    assertProp(forAll(Gen.oneOf(" ", "  ", "\t", "\n")) { ws =>
      parse(s"a$ws=${ws}value.f,${ws}b=key.g").size == 2
    })
  }

  test("property: quoted identifiers with arbitrary inner characters round-trip") {
    // any char except a lone double-quote survives quoting; "" escapes "
    val inner = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '.', '-', '=', ',', '(', ')', '"')))
      .map(_.mkString)
    assertProp(forAll(inner) { raw: String =>
      val quoted = "\"" + raw.replace("\"", "\"\"") + "\""
      val m = parse(s"$quoted=value.f")
      m == Seq(Entry(ColumnTarget(raw), FieldRef(Prefix.Value, "f")))
    })
  }

  test("property: parser never accepts a field outside the legal namespace") {
    val bogus = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
      .suchThat(s => !Set("key", "value").contains(s))
    assertProp(forAll(bogus) { f: String =>
      try { parse(s"c=$f"); false }
      catch { case _: ParseException => true }
    })
  }

  test("property: garbage input throws ParseException, never anything else") {
    val junk = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('=', ',', '.', '(', ')', '"', ' ', '\t', '!')))
      .map(_.mkString)
    assertProp(forAll(junk) { s: String =>
      try { parse(s); true }
      catch {
        case _: ParseException => true
        case _: Throwable      => false
      }
    })
  }

  test("config parsing: table settings and codec settings") {
    val cfg = SinkConfig.parse(Map(
      "topic.orders.ks1.t1.mapping" -> "pk=key, v=value.v",
      "topic.orders.ks1.t1.ttl" -> "60",
      "topic.orders.ks1.t1.ttlTimeUnit" -> "MILLISECONDS",
      "topic.orders.ks1.t1.consistencyLevel" -> "QUORUM",
      "topic.orders.ks1.t1.nullToUnset" -> "false",
      "topic.orders.ks1.t1.deletesEnabled" -> "false",
      "topic.orders.codec.timestamp" -> "UNITS_SINCE_EPOCH",
      "topic.orders.codec.unit" -> "SECONDS"))
    val b = cfg.bindings.head
    assert(b.topic == "orders" && b.keyspace == "ks1" && b.table == "t1")
    assert(b.ttl == 60 && b.ttlTimeUnit == java.util.concurrent.TimeUnit.MILLISECONDS)
    assert(b.consistencyLevel == "QUORUM" && !b.nullToUnset && !b.deletesEnabled)
    assert(b.codec.timestamp == "UNITS_SINCE_EPOCH" && b.codec.unit == "SECONDS")
  }

  test("config parsing: dotted topic names") {
    val cfg = SinkConfig.parse(Map(
      "topic.my.dotted.topic.ks1.t1.mapping" -> "pk=key"))
    assert(cfg.bindings.head.topic == "my.dotted.topic")
  }

  test("config parsing: fan-out bindings per topic") {
    val cfg = SinkConfig.parse(Map(
      "topic.t.ks1.a.mapping" -> "pk=key",
      "topic.t.ks1.b.mapping" -> "pk=key",
      "topic.u.ks1.c.mapping" -> "pk=key"))
    assert(cfg.forTopic("t").map(_.table).sorted == Seq("a", "b"))
  }
}
