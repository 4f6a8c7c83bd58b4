package graft

import graft.text.BpeTrainer

/** BPE trainer on hand-checked corpora, including the self-pair run
  * (greedy left-to-right within runs) and early exhaustion. */
class BpeTrainerSpec extends SparkSpecBase {
  import spark.implicits._

  test("learns merges greedily with self-pair run parity and stops when dry") {
    // words: aaaa (f=2), bc (f=2)
    // r1: (a,a) count 3*2=6 wins; run of four a's merges 1st+3rd -> [aa,aa]
    // r2: (aa,aa)=2 ties (b,c)=2; tie-break left asc: "aa" < "b" -> aaaa
    // r3: (b,c)=2 -> bc ; then no adjacencies remain -> stop at 3 of 5
    val docs = Seq("aaaa bc bc", "aaaa").toDF("text")
    val got = BpeTrainer.train(docs, "text", rounds = 5)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "aa", 6L), (2, "aaaa", 2L), (3, "bc", 2L)))
  }

  test("odd-length self-pair run leaves the trailing symbol unmerged") {
    // "aaa" (f=1): (a,a) has 2 adjacencies but only the first merges
    // (left-to-right); round 2 then merges (aa,a)
    val docs = Seq("aaa").toDF("text")
    val got = BpeTrainer.train(docs, "text", rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "aa", 2L), (2, "aaa", 1L)))
  }

  test("non-alpha words are excluded from the symbol alphabet") {
    val docs = Seq("ab ab x9 !! ab").toDF("text")
    val got = BpeTrainer.train(docs, "text", rounds = 1)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("ab", 3L)))
  }
}
