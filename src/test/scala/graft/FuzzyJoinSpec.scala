package graft

import org.apache.spark.sql.functions._
import graft.dedup.FuzzyJoin

/** Blocked edit-distance entity resolution: pair semantics, blocking
  * recall contract, and the degenerate-block guard. */
class FuzzyJoinSpec extends SparkSpecBase {

  private def lastToken = (c: org.apache.spark.sql.Column) =>
    regexp_extract(c, "([^ ]+)$", 1)

  test("matches within blocks at the distance bound, each pair once") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "red widget", "blue widget", "red widget",  // dup value collapses
      "red gadget",                               // other block
      "rod widget"                                // dist 1 from "red widget"
    ).toDF("name")
    val got = FuzzyJoin.selfMatch(df, "name", lastToken, maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // lev(blue,red)=4 and lev(blue,rod)=4 exceed the bound (threshold
    // form returns -1 for them); only red–rod (=1) survives
    assert(got == Set(("red widget", "rod widget", 1)))
    // left < right exactly once — no (b,a) mirror, no self-pair
    assert(got.forall { case (l, r, _) => l < r })
  }

  test("cross-block near-matches are not found (blocking recall contract)") {
    val s = spark
    import s.implicits._
    val df = Seq("red widget", "red widgets").toDF("name") // dist 1, diff noun
    assert(FuzzyJoin.selfMatch(df, "name", lastToken, maxDist = 3).isEmpty)
  }

  test("degenerate blocks above maxBlock are dropped, not exploded") {
    val s = spark
    import s.implicits._
    val big = (0 until 50).map(i => s"name$i x").toDF("name")   // one block
    val small = Seq("aa y", "ab y").toDF("name")                // tiny block
    val got = FuzzyJoin.selfMatch(big.union(small), "name", lastToken,
      maxDist = 2, maxBlock = 10).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("aa y", "ab y")))
  }
}
