package graft

import graft.dedup.SpanDedup

class SpanDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val boiler = "all rights reserved do not redistribute this file"

  test("cross-doc duplicated spans are counted per position") {
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler tail one"),
      (2L, s"$boiler completely different content here follows now"),
      (3L, "nothing shared with anything else at all in this document")
    ).toDF("doc_id", "text")
    // w=8: the 8-token boilerplate is one window; doc1 has it at one
    // position, doc2 at one position
    val got = SpanDedup.dupSpanCounts(docs, "doc_id", "text", w = 8)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got.forall(_._2 >= 1))
  }

  test("within-doc repetition alone is not a cross-doc span") {
    val docs = Seq(
      (1L, "x y z x y z x y z x y z"), // repeats internally only
      (2L, "totally unrelated words that never appear twice anywhere else")
    ).toDF("doc_id", "text")
    assert(SpanDedup.dupSpanCounts(docs, "doc_id", "text", w = 4).count() == 0)
  }

  test("spanPairs links exactly the docs sharing a span") {
    val docs = Seq(
      (1L, s"intro $boiler"),
      (2L, s"$boiler outro words"),
      (3L, "independent text with no overlap to speak of here")
    ).toDF("doc_id", "text")
    val got = SpanDedup.spanPairs(docs, "doc_id", "text", w = 8)
      .as[(Long, Long, Long)].collect()
    assert(got.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
  }
}
