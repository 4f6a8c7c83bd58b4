package graft

import org.apache.spark.sql.functions._
import graft.graph.PageRank

/** Hand-checkable contract for PageRank.runPersonalized on a tiny
  * graph: teleport mass returns only to seeds, non-seed sources decay,
  * and the uniform variant is recovered when every node is a seed. */
class PersonalizedPageRankSpec extends SparkSpecBase {

  // path graph 1 -> 2 -> 3 (symmetric, unit weights)
  private def edges = {
    import spark.implicits._
    Seq((1L, 2L, 1.0), (2L, 1L, 1.0), (2L, 3L, 1.0), (3L, 2L, 1.0))
      .toDF("src", "dst", "w")
  }

  test("teleport mass lands only on the seed set") {
    import spark.implicits._
    val seeds = Seq(1L).toDF("node")
    val r = PageRank.runPersonalized(edges, seeds, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // r0 = 1{seed}: only node 1 carries mass initially; the seed keeps
    // its reset term every round while non-seeds only ever receive
    // damped flowed-through mass — so rank decays with path distance
    // from the seed set.
    assert(r(1L) > 0.0 && r(2L) > 0.0 && r(3L) > 0.0)
    assert(r(1L) > r(3L),
      s"seed should outrank the far node: ${r}")
    // non-seed nodes have NO reset term: rank(3) must be strictly the
    // damped inflow — bounded by damping^2 of the seed mass path
    assert(r(3L) < r(2L), s"middle node must outrank the leaf: ${r}")
  }

  test("all-seeds personalization equals uniform PageRank") {
    import spark.implicits._
    val allSeeds = Seq(1L, 2L, 3L).toDF("node")
    val ppr = PageRank.runPersonalized(edges, allSeeds, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val pr = PageRank.run(edges, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    for (n <- Seq(1L, 2L, 3L))
      assert(math.abs(ppr(n) - pr(n)) < 1e-12,
        s"node $n: ppr=${ppr(n)} pr=${pr(n)}")
  }

  test("a seed absent from the edge list contributes nothing") {
    import spark.implicits._
    val seeds = Seq(99L).toDF("node") // not in the graph
    val r = PageRank.runPersonalized(edges, seeds, iters = 2)
      .agg(sum(abs(col("rank")))).first().getDouble(0)
    assert(r == 0.0, s"ghost seed injected mass: $r")
  }
}
