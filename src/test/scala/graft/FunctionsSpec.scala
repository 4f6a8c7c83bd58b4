package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions._

class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("escapeChars matches sequential-replace semantics") {
    val df = Seq("""a|b"c{d:e}f\g""", "plain", "").toDF("s")
    val got = df.select(StringFns.escapeChars($"s")).as[String].collect()
    assert(got(0) == """a\|b\"c\{d\:e\}f\\g""")
    assert(got(1) == "plain")
    assert(got(2) == "")
  }

  test("canonicalizeUrl collapses scheme/www/host-case/utm/trailing-slash variants") {
    val urls = Seq(
      "https://www.Site.example.com/Page/1",         // host case + www
      "HTTP://site.example.com/Page/1/",             // scheme case + slash
      "https://site.example.com/Page/1?utm_source=feed",
      "https://site.example.com/Page/1?utm_campaign=c&utm_medium=m",
      "https://site.example.com/Page/1?real=kept&utm_source=x",
      "https://site.example.com/PAGE/1",             // path case KEPT
      "not a url",
      // utm_ as a SUBSTRING of another param name must be kept: the
      // strip is anchored to a '?'/'&' boundary (ADVICE r6)
      "https://site.example.com/p?xutm_source=1",
      "https://site.example.com/p?a=1&myutm_b=2",
      // leading utm param hands its '?' to the surviving param
      "https://site.example.com/p?utm_source=x&real=kept",
      "https://site.example.com/p?utm_a=1&utm_b=2&real=kept")
    val got = urls.toDF("u")
      .select(UrlFns.canonicalizeUrl($"u")).as[String].collect()
    assert(got(0) == "site.example.com/Page/1")
    assert(got(1) == "site.example.com/Page/1")
    assert(got(2) == "site.example.com/Page/1")
    assert(got(3) == "site.example.com/Page/1")
    assert(got(4) == "site.example.com/Page/1?real=kept")
    assert(got(5) == "site.example.com/PAGE/1") // distinct: path is case-sensitive
    assert(got(6) == "")
    assert(got(7) == "site.example.com/p?xutm_source=1")
    assert(got(8) == "site.example.com/p?a=1&myutm_b=2")
    assert(got(9) == "site.example.com/p?real=kept")
    assert(got(10) == "site.example.com/p?real=kept")
  }

  test("skewedValuesToStr length-prefixes and skips nulls") {
    val df = Seq((1, Seq("ab", null, "c"))).toDF("id", "arr")
    val got = df.select(StringFns.skewedValuesToStr($"arr")).as[String].head()
    assert(got == "2%ab1%c")
  }

  test("stringListStrToList decodes valid, rejects invalid") {
    assert(Codecs.stringListStrToList("1%['a', 'b']") == Seq("a", "b"))
    assert(Codecs.stringListStrToList("2%['xyz']") == Seq("xyz"))
    assert(Codecs.stringListStrToList("no match") == Seq.empty)
    assert(Codecs.stringListStrToList("12%['a']") == Seq.empty) // single digit only
    assert(Codecs.stringListStrToList(null) == Seq.empty)
  }

  test("stringListStrToList accepts any word-char elements (property)") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val lists = Gen.nonEmptyListOf(word)
    (1 to 200).foreach { i =>
      val els = lists.apply(Gen.Parameters.default.withSize(1 + i % 20),
        org.scalacheck.rng.Seed(i.toLong)).get
      val s = "1%[" + els.map(e => s"'$e'").mkString(", ") + "]"
      assert(Codecs.stringListStrToList(s) == els, s"input $s")
    }
  }

  test("partitionName formats keys(type)=vals and empties") {
    val df = Seq(
      (Seq(("y", "int"), ("m", "int")), Seq("2024", "5")),
      (Seq(("y", "int")), Seq.empty[String]))
      .toDF("keys", "vals")
      .select(StringFns.partitionName(
        $"keys".cast("array<struct<name:string,type:string>>"), $"vals").as("p"))
    val got = df.as[String].collect()
    assert(got(0) == "y(int),m(int)=2024,5")
    assert(got(1) == "")
  }

  test("DdbJson decodes nested typed items") {
    val in = """{"a":{"N":"42"},"b":{"S":"x"},"c":{"M":{"d":{"BOOL":true},"e":{"L":[{"N":"1.5"},{"S":"y"}]}}},"f":{"NULL":true},"g":{"SS":["p","q"]}}"""
    val out = DdbJson.decodeItem(in)
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(out)
    assert(m.get("a").asLong == 42L)
    assert(m.get("b").asText == "x")
    assert(m.get("c").get("d").asBoolean)
    assert(m.get("c").get("e").get(0).asDouble == 1.5)
    assert(m.get("c").get("e").get(1).asText == "y")
    assert(m.get("f").isNull)
    assert(m.get("g").get(1).asText == "q")
    assert(DdbJson.decodeItem("not json") == null)
  }

  test("decodeDdbTyped matches the generic decoder on all tag shapes") {
    import org.apache.spark.sql.types._
    val in = """{"a":{"N":"42"},"b":{"S":"x"},"c":{"M":{"d":{"BOOL":true},"e":{"NS":["1","2"]}}},"f":{"NULL":true},"g":{"SS":["p","q"]},"h":{"L":[{"N":"7"},{"N":"8"}]}}"""
    val shape = StructType.fromDDL(
      "a BIGINT, b STRING, c STRUCT<d: BOOLEAN, e: ARRAY<BIGINT>>, " +
      "f STRING, g ARRAY<STRING>, h ARRAY<BIGINT>")
    val row = Seq(in, "not json", null).toDF("j")
      .select(DdbJson.decodeDdbTyped($"j", shape).as("d"))
      .select("d.a", "d.b", "d.c.d", "d.c.e", "d.f", "d.g", "d.h", "d")
      .collect()
    val ok = row(0)
    assert(ok.getLong(0) == 42L)
    assert(ok.getString(1) == "x")
    assert(ok.getBoolean(2))
    assert(ok.getSeq[Long](3) == Seq(1L, 2L))
    assert(ok.isNullAt(4)) // NULL tag → null leaf
    assert(ok.getSeq[String](5) == Seq("p", "q"))
    assert(ok.getSeq[Long](6) == Seq(7L, 8L))
    // malformed JSON → whole struct null (same contract as the UDF)
    assert(row(1).isNullAt(7))
    assert(row(2).isNullAt(7))
  }

  test("time parsers return null on failure (non-ANSI)") {
    graft.core.GraftSession.tune(spark)
    val df = Seq("2018.04.16", "garbage").toDF("s")
    val got = df.select(TimeFns.parseDateDots($"s")).collect()
    assert(got(0).getDate(0).toString == "2018-04-16")
    assert(got(1).isNullAt(0))
  }

  test("msStringToSeconds floors and maps null to 0") {
    val df = Seq("1999", "2001", null).toDF("s")
      .select(TimeFns.msStringToSeconds($"s").as("v"))
    assert(df.as[Long].collect().toSeq == Seq(1L, 2L, 0L))
  }
}
