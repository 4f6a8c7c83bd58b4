package graft

import org.apache.spark.sql.functions._
import graft.dedup.{ExactDedup, LineDedup}

/** Line-level corpus dedup: first-occurrence semantics across and
  * within documents, order-preserving reassembly, vanishing fully-
  * duplicate docs; plus cross-snapshot incremental dedup. */
class LineDedupSpec extends SparkSpecBase {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Seq("intro one", "boilerplate", "body alpha")),
      (2L, Seq("boilerplate", "body beta", "body beta")), // cross-doc + in-doc dup
      (3L, Seq("boilerplate", "intro one")), // nothing unique -> vanishes
      (4L, Seq("body gamma", "boilerplate", "body gamma"))
    ).toDF("doc_id", "lines")
  }

  test("dedupLines keeps first occurrence by (id, idx) and preserves order") {
    val out = LineDedup.dedupLines(docs, "doc_id", "lines")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "intro one\nboilerplate\nbody alpha",
      2L -> "body beta", // boilerplate lost to doc 1, second "body beta" to idx 1
      4L -> "body gamma")) // doc 3 vanishes entirely; doc 4 keeps only idx 0
  }

  test("dedupLines result is invariant to input partitioning") {
    val a = LineDedup.dedupLines(docs, "doc_id", "lines")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val b = LineDedup.dedupLines(docs.repartition(13), "doc_id", "lines")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("firstOccurrences winner agg is a partial-aggregable HashAggregate (no window sort)") {
    val plan = LineDedup.firstOccurrences(docs, "doc_id", "lines")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"), plan)
  }

  test("dedupAgainst keeps only never-seen canonical texts") {
    val s = spark
    import s.implicits._
    val seen = Seq((1L, "a b c"), (2L, "d e f")).toDF("id", "text")
    val fresh = Seq(
      (10L, "A   b C"), // canonical dup of seen 1 (case/whitespace)
      (11L, "d e f"),   // exact dup of seen 2
      (12L, "g h i")    // genuinely new
    ).toDF("id", "text")
    val kept = ExactDedup.dedupAgainst(fresh, seen, "text")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(12L))
  }
}
