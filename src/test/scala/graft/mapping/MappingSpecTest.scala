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

  // ------------------------------------------------------------- X4 (§2.8)

  private val baseMapping = Map("topic.t.ks1.a.mapping" -> "pk=key")

  test("X4 endpoint: contactPoints parse; localDc required with them; port range") {
    val cfg = SinkConfig.parse(baseMapping ++ Map(
      "contactPoints" -> "10.0.0.1, 10.0.0.2",
      "loadBalancing.localDc" -> "dc1",
      "port" -> "9043"))
    assert(cfg.contactPoints == Seq("10.0.0.1", "10.0.0.2"))
    assert(cfg.localDc.contains("dc1") && cfg.port == 9043)
    // "Required if contactPoints is specified" (properties.sample:21-22)
    intercept[IllegalArgumentException](SinkConfig.parse(
      baseMapping + ("contactPoints" -> "10.0.0.1")))
    intercept[IllegalArgumentException](SinkConfig.parse(
      baseMapping + ("port" -> "0")))
    intercept[IllegalArgumentException](SinkConfig.parse(
      baseMapping + ("port" -> "words")))
    // defaults: empty = localhost, 9042 (properties.sample:16-18,28)
    val d = SinkConfig.parse(baseMapping)
    assert(d.contactPoints.isEmpty && d.port == 9042 && d.warnings.isEmpty)
  }

  test("X4 auth: enum, PLAIN requirements, provider inference from credentials") {
    intercept[IllegalArgumentException](SinkConfig.parse(
      baseMapping + ("auth.provider" -> "KERBEROS")))
    // PLAIN needs both credentials
    intercept[IllegalArgumentException](SinkConfig.parse(baseMapping ++ Map(
      "auth.provider" -> "PLAIN", "auth.username" -> "u")))
    // credentials with provider unset/None infer PLAIN (reference:
    // PlaintextAuthCCMIT "auth.provider was coerced")
    val inferred = SinkConfig.parse(baseMapping ++ Map(
      "auth.username" -> "u", "auth.password" -> "p"))
    assert(inferred.auth.provider == "PLAIN")
    val explicitNone = SinkConfig.parse(baseMapping ++ Map(
      "auth.provider" -> "None",
      "auth.username" -> "u", "auth.password" -> "p"))
    assert(explicitNone.auth.provider == "PLAIN")
    // inference with only a username still fails PLAIN validation
    intercept[IllegalArgumentException](SinkConfig.parse(
      baseMapping + ("auth.username" -> "u")))
    val gssapi = SinkConfig.parse(baseMapping ++ Map(
      "auth.provider" -> "GSSAPI",
      "auth.gssapi.keyTab" -> "/kt", "auth.gssapi.principal" -> "user@REALM"))
    assert(gssapi.auth.provider == "GSSAPI" &&
      gssapi.auth.gssapiService == "dse" &&
      gssapi.auth.gssapiPrincipal.contains("user@REALM"))
    assert(SinkConfig.parse(baseMapping).auth.provider == "None")
  }

  test("X4 ssl: enum, required-together keystore/truststore/openssl pairs, bool") {
    intercept[IllegalArgumentException](SinkConfig.parse(
      baseMapping + ("ssl.provider" -> "BoringSSL")))
    intercept[IllegalArgumentException](SinkConfig.parse(baseMapping ++ Map(
      "ssl.provider" -> "JDK", "ssl.keystore.path" -> "/ks")))
    intercept[IllegalArgumentException](SinkConfig.parse(baseMapping ++ Map(
      "ssl.provider" -> "JDK", "ssl.truststore.password" -> "secret")))
    intercept[IllegalArgumentException](SinkConfig.parse(baseMapping ++ Map(
      "ssl.provider" -> "OpenSSL", "ssl.openssl.keyCertChain" -> "/chain")))
    intercept[IllegalArgumentException](SinkConfig.parse(baseMapping ++ Map(
      "ssl.hostnameValidation" -> "yes")))
    val ok = SinkConfig.parse(baseMapping ++ Map(
      "ssl.provider" -> "JDK",
      "ssl.keystore.path" -> "/ks", "ssl.keystore.password" -> "kp",
      "ssl.truststore.path" -> "/ts", "ssl.truststore.password" -> "tp",
      "ssl.cipherSuites" -> "TLS_A, TLS_B",
      "ssl.hostnameValidation" -> "false"))
    assert(ok.ssl.provider == "JDK" && !ok.ssl.hostnameValidation &&
      ok.ssl.cipherSuites == Seq("TLS_A", "TLS_B") &&
      ok.ssl.keystorePath.contains("/ks"))
    assert(SinkConfig.parse(baseMapping).ssl.hostnameValidation)
  }

  test("X4 cloud: bundle conflicts fail fast; CL coerced to LOCAL_QUORUM with warning") {
    // "The loadBalancing.localDc, contactPoints or any config under ssl
    // prefix cannot be set together with cloud.secureConnectBundle"
    // (properties.sample:10-13)
    intercept[IllegalArgumentException](SinkConfig.parse(baseMapping ++ Map(
      "cloud.secureConnectBundle" -> "/b.zip", "contactPoints" -> "h1",
      "loadBalancing.localDc" -> "dc1")))
    intercept[IllegalArgumentException](SinkConfig.parse(baseMapping ++ Map(
      "cloud.secureConnectBundle" -> "/b.zip", "ssl.provider" -> "JDK")))
    intercept[IllegalArgumentException](SinkConfig.parse(baseMapping ++ Map(
      "cloud.secureConnectBundle" -> "/b.zip",
      "loadBalancing.localDc" -> "dc1")))
    // wrong CL is coerced, not rejected, with the reference's warning
    // (CloudSniEndToEndIT.java:96-120)
    val coerced = SinkConfig.parse(baseMapping ++ Map(
      "cloud.secureConnectBundle" -> "/b.zip",
      "topic.t.ks1.a.consistencyLevel" -> "ONE",
      "auth.username" -> "u", "auth.password" -> "p"))
    assert(coerced.secureConnectBundle.contains("/b.zip"))
    assert(coerced.bindings.head.consistencyLevel == "LOCAL_QUORUM")
    assert(coerced.warnings.exists(_.contains(
      "Cloud deployments reject consistency level ONE when writing; " +
        "forcing LOCAL_QUORUM")))
    // the right CL passes silently
    val quiet = SinkConfig.parse(baseMapping ++ Map(
      "cloud.secureConnectBundle" -> "/b.zip",
      "topic.t.ks1.a.consistencyLevel" -> "LOCAL_QUORUM"))
    assert(quiet.warnings.isEmpty &&
      quiet.bindings.head.consistencyLevel == "LOCAL_QUORUM")
  }

  test("global execution settings: defaults, round-trip, fail-fast " +
      "(reference properties.sample:34-48, KAF-49/60/95)") {
    val baseMapping = Map("topic.t.ks1.a.mapping" -> "c1=key")
    // reference defaults apply when unset
    val d = SinkConfig.parse(baseMapping)
    assert(d.maxConcurrentRequests == 500)
    assert(d.maxNumberOfRecordsInBatch == 32)
    assert(d.connectionPoolLocalSize == 4)
    assert(d.queryExecutionTimeout == 30)
    assert(d.jmx)
    // a ported properties file keeps its knobs
    val c = SinkConfig.parse(baseMapping ++ Map(
      "maxConcurrentRequests" -> "100",
      "maxNumberOfRecordsInBatch" -> "16",
      "connectionPoolLocalSize" -> "2",
      "queryExecutionTimeout" -> "120",
      "jmx" -> "false"))
    assert(c.maxConcurrentRequests == 100)
    assert(c.maxNumberOfRecordsInBatch == 16)
    assert(c.connectionPoolLocalSize == 2)
    assert(c.queryExecutionTimeout == 120)
    assert(!c.jmx)
    // malformed values fail at parse, like reference startup
    Seq("maxConcurrentRequests" -> "0", "maxNumberOfRecordsInBatch" -> "-1",
      "connectionPoolLocalSize" -> "abc", "queryExecutionTimeout" -> "",
      "jmx" -> "yes").foreach { case (k, v) =>
      intercept[IllegalArgumentException] {
        SinkConfig.parse(baseMapping + (k -> v))
      }
    }
  }
}
