package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Containment, Shingles}

/** The recall audit for the PPJoin-style exact containment join: the
  * prefix filter's completeness lemma is proved in the scaladoc, but
  * the implementation (order construction, prefix-length arithmetic,
  * positional bound) is exactly where an off-by-one would silently
  * drop pairs — so pin [[Containment.pairsExact]] against literal
  * brute-force all-pairs containment, on synthetic corpora built to
  * stress the asymmetry and on the real sf0.001 documents table. */
class ContainmentExactSpec extends SparkSpecBase {
  import spark.implicits._

  private def brute(docs: org.apache.spark.sql.DataFrame, t: Double,
                    n: Int): Set[(Long, Long, Double, Double)] = {
    val ds = Shingles.docShingles(
      docs.select(col("doc_id"), lower(col("text")).as("text")),
      "doc_id", "text", n)
    val l = ds.select(col("doc_id").as("a"), col("shingles").as("sa"))
    val r = ds.select(col("doc_id").as("b"), col("shingles").as("sb"))
    l.crossJoin(r).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("sa"), col("sb"))).cast("double").as("c"),
        size(col("sa")).as("na"), size(col("sb")).as("nb"))
      .select(col("a"), col("b"),
        round(col("c") / col("na"), 4).as("c_ab"),
        round(col("c") / col("nb"), 4).as("c_ba"))
      .where(col("c_ab") >= t || col("c_ba") >= t)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getDouble(3)))
      .toSet
  }

  private def exact(docs: org.apache.spark.sql.DataFrame, t: Double,
                    n: Int): Set[(Long, Long, Double, Double)] =
    Containment.pairsExact(docs, "doc_id", "text", t, n)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getDouble(3)))
      .toSet

  test("pairsExact equals brute force on an asymmetry-stressing corpus") {
    // subset⊂superset pairs at several size ratios, hot boilerplate
    // shared corpus-wide (the shingles the old df cap discarded), and
    // unique filler — the shapes where prefix/positional arithmetic
    // can go wrong
    val boiler = "terms of service apply to all content here"
    val core = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      1L -> s"$core",                                    // small subset
      2L -> s"$core iota kappa lambda mu nu xi omicron", // its superset
      3L -> s"$boiler $core extra words that dilute jaccard a lot more",
      4L -> s"$boiler",                                  // pure boilerplate
      5L -> s"$boiler and some trailing unique content",
      6L -> "completely unrelated text about something else entirely",
      7L -> s"$core", // exact duplicate of 1 (containment 1.0 both ways)
      8L -> (1 to 30).map(i => s"u8w$i").mkString(" ")   // all-unique
    ).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val b = brute(docs, t, 3)
      val e = exact(docs, t, 3)
      assert(e == b, s"t=$t: missing ${b -- e}, extra ${e -- b}")
    }
  }

  test("pairsExact equals brute force on sf0.001 documents (recall audit)") {
    val docs = graft.core.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val b = brute(docs, 0.5, 3)
    val e = exact(docs, 0.5, 3)
    assert(e == b, s"missing ${b -- e}, extra ${e -- b}")
    assert(b.nonEmpty, "audit vacuous: no qualifying pairs at sf0.001")
  }
}
