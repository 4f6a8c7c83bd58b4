package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs & authorities) by power iteration — the link-analysis
  * complement to PageRank: an authority is pointed at by good hubs, a
  * hub points at good authorities (Kleinberg 1999). Corpus pipelines
  * use the authority score as a crawl-frontier quality prior where
  * PageRank over-rewards link farms that only cite each other.
  *
  * Execution shape per half-step: scores (V rows) ⋈ edges (E rows) on
  * one endpoint, groupBy the other — the same one-E-shuffle +
  * one-V-aggregate cost model as [[PageRank]], so the loop survives a
  * web-scale edge list. The edge list is persisted PRE-PARTITIONED on
  * `src` once (the invariant side); the per-round exchange is only the
  * V-row score table. L1 normalization per half-step is a 1-row
  * aggregate crossed back via broadcast (the Collocations totals idiom
  * — no driver collect), keeping scores in a fixed numeric range so a
  * fixed iteration count is well-conditioned for the value-exact
  * oracle replay.
  *
  * Iteration count FIXED, not convergence-tested — deterministic
  * output, no per-round count() action, unrollable by the SQL oracle
  * (the PageRank lesson).
  */
object Hits {

  /** (node, authority, hub) after `iters` full rounds over a directed
    * (src, dst) edge list (weights ignored — classic HITS is
    * unweighted), starting from hub = 1 and L1-normalizing each
    * half-step. Nodes = union of endpoints; a node never cited keeps
    * authority 0, a node citing nothing keeps hub 0. */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val e = edges.select("src", "dst").distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    def l1Normalize(scores: DataFrame, c: String): DataFrame = {
      val total = scores.agg(sum(col(c)).as("__t"))
      scores.crossJoin(broadcast(total))
        .select(col("node"), (col(c) / col("__t")).as(c))
    }
    try {
      var hub = nodes.select(col("node"), lit(1.0).as("hub"))
      var auth = nodes.select(col("node"), lit(0.0).as("authority"))
      for (_ <- 1 to iters) {
        auth = l1Normalize(nodes.join(
          e.join(hub, e("src") === hub("node"))
            .groupBy(col("dst").as("node"))
            .agg(sum("hub").as("authority")),
          Seq("node"), "left")
          .select(col("node"),
            coalesce(col("authority"), lit(0.0)).as("authority")),
          "authority")
        hub = l1Normalize(nodes.join(
          e.join(auth, e("dst") === auth("node"))
            .groupBy(col("src").as("node"))
            .agg(sum("authority").as("hub")),
          Seq("node"), "left")
          .select(col("node"), coalesce(col("hub"), lit(0.0)).as("hub")),
          "hub")
        // cut lineage per round — the plan doubles otherwise
        auth = graft.core.Caching.reap(auth)
        hub = graft.core.Caching.reap(hub)
      }
      nodes.join(auth, "node").join(hub, "node")
        .select("node", "authority", "hub")
    } finally {
      e.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
    }
  }
}
