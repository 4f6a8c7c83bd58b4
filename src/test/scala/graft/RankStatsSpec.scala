package graft

import org.scalatest.funsuite.AnyFunSuite

/** Algebra pins for the round-11 rank/bootstrap statistics — pure
  * Scala replays of the formulas the gates compute distributed, so a
  * drifted midrank, tie term, or inverse-CDF threshold breaks here
  * before it breaks a cross-engine hash.
  *
  * The key identity for x_mann_whitney: computing the rank-sum from
  * BIN COUNTS via midranks (cum_before + (n_t + 1)/2) equals the
  * classic average-rank assignment on the expanded sample — binning
  * is just deliberate tying, so the binned U is the exact U of the
  * binned values. Randomized over seeded draws (deterministic). */
class RankStatsSpec extends AnyFunSuite {

  test("binned midrank rank-sum equals the expanded average-rank rank-sum") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val counts = Seq.fill(6)((rnd.nextInt(9), rnd.nextInt(9)))
      val expanded = counts.zipWithIndex.flatMap { case ((na, nb), v) =>
        Seq.fill(na)((v, 'A')) ++ Seq.fill(nb)((v, 'B'))
      }.sortBy(_._1)
      if (expanded.exists(_._2 == 'A')) {
        // classic average ranks over the sorted expansion
        val avgRank = expanded.zipWithIndex
          .groupBy(_._1._1)
          .view.mapValues(g => g.map(_._2 + 1).sum.toDouble / g.size)
          .toMap
        val raClassic = expanded.filter(_._2 == 'A')
          .map(e => avgRank(e._1)).sum
        // the gate's binned form
        var cumBefore = 0L
        var raBinned = 0.0
        counts.foreach { case (na, nb) =>
          val nt = na + nb
          if (nt > 0) {
            raBinned += na * (cumBefore + (nt + 1) / 2.0)
            cumBefore += nt
          }
        }
        assert(math.abs(raClassic - raBinned) < 1e-9,
          s"classic $raClassic vs binned $raBinned for $counts")
      }
    }
  }

  test("Poisson bootstrap thresholds are the Poisson(1) CDF") {
    // the x_bootstrap_ci CASE thresholds must be the inverse CDF of
    // Poisson(1): P(X <= k) = e^-1 * sum_{i<=k} 1/i!
    val cdf = (0 to 3).map { k =>
      math.exp(-1.0) * (0 to k).map(i =>
        1.0 / (1 to i).foldLeft(1.0)(_ * _)).sum
    }
    val gateThresholds = Seq(0.3678794412, 0.7357588823,
      0.9196986029, 0.9810118431)
    cdf.zip(gateThresholds).foreach { case (exact, used) =>
      assert(math.abs(exact - used) < 5e-11, s"$exact vs $used")
    }
  }

  test("CUPED adjustment preserves the overall mean for ANY theta") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val xy = Seq.fill(20)((rnd.nextDouble() * 100, rnd.nextDouble() * 100))
      val mx = xy.map(_._1).sum / xy.size
      val my = xy.map(_._2).sum / xy.size
      val theta = rnd.nextDouble() * 2 - 1 // E[Y - θ(X - E[X])] = E[Y]
      val adj = xy.map { case (x, y) => y - theta * (x - mx) }
      assert(math.abs(adj.sum / adj.size - my) < 1e-9)
    }
  }
}
