package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.curate.Dsir

/** curate.Dsir unit properties. The cross-engine arithmetic is pinned
  * by the curate_dsir oracle gate; this spec pins the statistical
  * contract. */
class DsirSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)

  test("target == corpus makes every log-ratio exactly zero") {
    // p_target and p_raw are the SAME smoothed model, so each bucket's
    // log-ratio is ln(x) - ln(x) = 0.0 exactly — no fp residue
    val s = Dsir.score(docs, "doc_id", "text", isTarget = lit(true))
    assert(s.where(col("score") =!= 0.0).count() == 0)
  }

  test("target-language documents outscore the rest on average") {
    val s = Dsir.score(docs, "doc_id", "text",
        isTarget = col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val avg = s.groupBy(col("lang") === "en")
      .agg(org.apache.spark.sql.functions.avg("score")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) > avg(false),
      s"en avg ${avg(true)} should exceed non-en ${avg(false)}")
  }

  test("select returns k rows in score-desc, id-asc order") {
    val sel = Dsir.select(docs, "doc_id", "text",
      isTarget = col("lang") === "en", k = 20).collect()
    assert(sel.length == 20)
    val pairs = sel.map(r => (r.getDouble(1), r.getLong(0)))
    assert(pairs.sliding(2).forall { case Array((s1, i1), (s2, i2)) =>
      s1 > s2 || (s1 == s2 && i1 < i2) })
  }
}
