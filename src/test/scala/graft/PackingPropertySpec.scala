package graft

import graft.curate.Packing

/** Randomized invariants for next-fit packing, checked against an
  * in-memory reference on a single partition (where the distributed
  * op must equal pure sequential next-fit exactly). */
class PackingPropertySpec extends SparkSpecBase {

  /** Pure sequential next-fit reference. */
  private def reference(toks: Seq[Long], budget: Long): Seq[Seq[Int]] = {
    val bins = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Int]]()
    var total = 0L
    toks.zipWithIndex.foreach { case (t, i) =>
      if (bins.isEmpty || total + t > budget) {
        bins += scala.collection.mutable.ArrayBuffer(i)
        total = t
      } else { bins.last += i; total += t }
    }
    bins.map(_.toSeq).toSeq
  }

  test("single-partition pack equals sequential next-fit on random inputs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 25) {
      val n = rnd.nextInt(60)
      val toks = Seq.fill(n)(1L + rnd.nextInt(30))
      val budget = 5L + rnd.nextInt(45)
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "toks").coalesce(1)
      val got = Packing.nextFitPack(df, "id", "toks", budget)
        .orderBy("bin").collect()
        .map(r => (r.getSeq[Long](3).map(_.toInt).toSeq, r.getLong(2)))
      val want = reference(toks, budget)
      assert(got.map(_._1).toSeq == want,
        s"toks=$toks budget=$budget")
      got.foreach { case (ids, total) =>
        assert(total == ids.map(toks(_)).sum)
        if (ids.length > 1) assert(total <= budget)
      }
    }
  }
}
