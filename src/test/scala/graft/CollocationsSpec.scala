package graft

import graft.text.Collocations

/** Bigram PMI on a hand-computable corpus. */
class CollocationsSpec extends SparkSpecBase {

  test("pmi matches the closed form; pairs never span dropped tokens") {
    val s = spark
    import s.implicits._
    // tokens: x appears 3×, y 2×, z 1× (n1=6); bigrams: (x,y)×2,
    // (x,z)×1 (n2=3). The doubled space and trailing blank exercise
    // the filter-before-pairing contract.
    val docs = Seq("x  y", "X y ", "x z").toDF("text")
    val got = Collocations.bigramPmi(docs, "text", minCount = 1)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(("x", "y"), ("x", "z")))
    // pmi(x,y) = ln(2·6·6 / (3·2·3)) = ln 4
    assert(got(("x", "y"))._1 == 2L)
    assert(math.abs(got(("x", "y"))._2 - math.log(4.0)) < 1e-4)
    // pmi(x,z) = ln(1·6·6 / (3·1·3)) = ln 4
    assert(math.abs(got(("x", "z"))._2 - math.log(4.0)) < 1e-4)
  }

  test("minCount prunes rare pairs; single-token docs contribute no pairs") {
    val s = spark
    import s.implicits._
    val docs = (Seq.fill(5)("a b") ++ Seq("c d", "e")).toDF("text")
    val got = Collocations.bigramPmi(docs, "text", minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("a", "b")))
  }
}
