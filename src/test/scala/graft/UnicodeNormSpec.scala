package graft

import org.apache.spark.sql.functions._
import graft.plans.{NfcNormalize, StripAccents, UnicodeNormHelper}
import graft.text.TextClean
import org.apache.spark.unsafe.types.UTF8String

/** plans.UnicodeNorm kernels + text.TextClean extraction. The
  * normalization contract is pinned against DuckDB/utf8proc semantics
  * (nfc_normalize / strip_accents), verified engine-to-engine by the
  * text_normalize registry gate; this spec pins the unit-level edges. */
class UnicodeNormSpec extends SparkSpecBase {
  import spark.implicits._

  private val decomposed = "Café"          // e + combining acute
  private val composed = "Café"             // precomposed é

  test("NFC composes decomposed sequences; identity on composed") {
    val out = Seq(decomposed, composed).toDF("s")
      .select(NfcNormalize(col("s")).as("n"), length(col("s")).as("raw"),
        length(NfcNormalize(col("s"))).as("nrm"))
      .collect()
    assert(out(0).getString(0) == composed && out(0).getInt(1) == 5
      && out(0).getInt(2) == 4)
    assert(out(1).getString(0) == composed)
  }

  test("strip_accents drops marks, keeps non-decomposable letters (utf8proc parity)") {
    val rows = Seq(
      "naïve" -> "naive",          // ï → i
      "Ångström" -> "Angstrom",
      "øre" -> "øre",         // ø has no canonical decomposition
      "ße" -> "ße",           // ß likewise
      decomposed -> "Cafe")
    rows.foreach { case (in, want) =>
      assert(UnicodeNormHelper.stripAccents(UTF8String.fromString(in))
        .toString == want, s"input $in")
    }
  }

  test("ASCII fast path returns the input object unchanged") {
    val s = UTF8String.fromString("plain ascii only")
    assert(UnicodeNormHelper.nfc(s) eq s)
    assert(UnicodeNormHelper.stripAccents(s) eq s)
  }

  test("null propagates; kernels run inside whole-stage codegen") {
    val df = Seq(Some(decomposed), None).toDF("s")
      .select(NfcNormalize(col("s")).as("n"), StripAccents(col("s")).as("p"))
    assert(df.collect().map(r => (r.isNullAt(0), r.isNullAt(1))).toSeq ==
      Seq((false, false), (true, true)))
    // no CodegenFallback: over a real scan (local relations fold away)
    // the projection must stay one codegen stage
    val plan = graft.core.Tables.documents(spark, sfDir)
      .select(NfcNormalize(col("text")), StripAccents(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // `*` = codegen stage
  }

  test("htmlToText strips markup, unescapes entities, collapses whitespace") {
    val html = "<html><head><style>p{c}</style></head><body><h1>T</h1>" +
      "<!-- x --><p>Hello &amp; bye &lt;b&gt; &quot;q&quot; &#39;s&nbsp;end</p>" +
      "<script>var x=1;</script></body></html>"
    val out = Seq(html).toDF("h")
      .select(TextClean.htmlToText(col("h"))).as[String].head()
    assert(out == "T Hello & bye <b> \"q\" 's end")
  }

  test("htmlToText double-escaped entities unescape one level only") {
    val out = Seq("&amp;lt;not-a-tag&amp;gt;").toDF("h")
      .select(TextClean.htmlToText(col("h"))).as[String].head()
    assert(out == "&lt;not-a-tag&gt;")
  }
}
