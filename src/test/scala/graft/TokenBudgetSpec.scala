package graft

import org.apache.spark.sql.functions._
import graft.curate.Sampling

/** Sampling.tokenBudget: the histogram-pruned implementation must
  * select EXACTLY the rows of the naive global-running-sum spec, for
  * any bucket count — including degenerate ones (one bucket = pure
  * window; many ties; budget beyond the corpus; zero budget). */
class TokenBudgetSpec extends SparkSpecBase {
  import spark.implicits._

  private def naive(rows: Seq[(Long, Double, Int)], budget: Long): Set[Long] = {
    val ordered = rows.sortBy { case (id, q, _) => (-q, id) }
    val before = ordered.map(_._3.toLong).scanLeft(0L)(_ + _)
    ordered.zip(before).filter(_._2 < budget).map(_._1._1).toSet
  }

  private def run(rows: Seq[(Long, Double, Int)], budget: Long,
                  buckets: Int): Set[Long] =
    Sampling.tokenBudget(
        rows.toDF("id", "q", "nt"), "id", "q", "nt", budget, buckets)
      .select("id").collect().map(_.getLong(0)).toSet

  test("matches the naive running-sum spec on random data, any bucket count") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 300L).map { id =>
      // coarse quality grid → plenty of exact ties sharing buckets
      (id, math.floor(rnd.nextDouble() * 50) / 50.0, 1 + rnd.nextInt(40))
    }
    val total = rows.map(_._3.toLong).sum
    for (budget <- Seq(1L, 100L, total / 3, total - 1, total, total + 500);
         buckets <- Seq(1, 7, 64, 1024)) {
      assert(run(rows, budget, buckets) == naive(rows, budget),
        s"budget=$budget buckets=$buckets")
    }
  }

  test("keeps the budget-crossing document and stays deterministic on ties") {
    // three docs, same quality: order falls back to id, budget of 5
    // tokens keeps doc 1 (before=0) and doc 2 (before=4 < 5) only
    val rows = Seq((1L, 0.5, 4), (2L, 0.5, 4), (3L, 0.5, 4))
    assert(run(rows, 5L, 16) == Set(1L, 2L))
  }

  test("edge cases: zero budget, empty input, nulls never selected") {
    assert(run(Seq((1L, 0.9, 10)), 0L, 16) == Set.empty[Long])
    assert(run(Seq.empty[(Long, Double, Int)], 100L, 16) == Set.empty[Long])
    val withNull = Seq((1L, Some(0.9), Some(10)), (2L, None, Some(5)),
        (3L, Some(0.1), None))
      .toDF("id", "q", "nt")
    val got = Sampling.tokenBudget(withNull, "id", "q", "nt", 100L, 16)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("identical-quality corpus degenerates to the id-ordered prefix") {
    val rows = (1L to 20L).map(id => (id, 0.7, 3))
    assert(run(rows, 10L, 8) == Set(1L, 2L, 3L, 4L))
  }

  test("ties-heavy skew: whole corpus in one bucket stays correct " +
    "across many partitions") {
    // every row ties on quality → the histogram collapses into ONE
    // boundary bucket holding the entire corpus; the prefix sum must
    // still match the naive spec while running range-partitioned (the
    // unpartitioned-WindowExec cliff this path used to have)
    val rnd = new scala.util.Random(7)
    val rows = (1L to 5000L).map(id => (id, 0.25, 1 + rnd.nextInt(9)))
    val df = rows.toDF("id", "q", "nt").repartition(16)
    val total = rows.map(_._3.toLong).sum
    for (budget <- Seq(17L, total / 2, total - 1)) {
      val got = Sampling.tokenBudget(df, "id", "q", "nt", budget, 1024)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == naive(rows, budget), s"budget=$budget")
    }
  }

  test("IdOps.runningTotal is the exclusive prefix sum in sort order") {
    val rows = (1L to 200L).map(id => (id, (id * 7) % 13))
    val df = rows.toDF("id", "v").repartition(8).sort("id")
    val got = graft.ops.IdOps.runningTotal(df, "v", "rt")
      .select("id", "rt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.map(_._2).scanLeft(0L)(_ + _).zip(rows.map(_._1))
      .map { case (s, id) => id -> s }.toMap
    assert(got == want)
  }
}
