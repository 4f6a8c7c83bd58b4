package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over near-duplicate pair edges: the real dedup
  * semantics at corpus scale (drop-the-b-of-each-pair is not
  * transitive; a≈b≈c must collapse to ONE cluster).
  *
  * Min-label propagation: every node starts labeled with its own id;
  * each round every node takes the min of its and its neighbors'
  * labels; converged when no label changes. Rounds needed =
  * O(component diameter) — near-dup clusters are shallow (pairs/
  * chains of a few docs), so this converges in 2-4 rounds; each round
  * is one join + one aggregation on the EDGE set (proportional to
  * duplicates, not corpus).
  */
object Clusters {

  /** pairs: (a, b) undirected edges. Returns (id, cluster) for every
    * node appearing in at least one edge; cluster = min id of the
    * component. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
    // cache the symmetrized edge set PRE-PARTITIONED on the join key:
    // every round's message join then reuses the cached layout and
    // only the (much smaller) label frame moves — the edge bytes
    // cross the network once for the whole propagation, not per round
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cached = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), first(col("src"))).as("cluster"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = cached
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      // convergence count folded into the materializing scan: the
      // changed-label metric rides the same job that fills the cache
      // (observe = map-side accumulation, no second aggregation pass
      // over step) — one job per round, asserted by ClustersPlanSpec
      val obs = org.apache.spark.sql.Observation(s"cc_round_$round")
      val step = propagateStep(edges, labels)
        .observe(obs, count(when(col("cluster") =!= col("old"), 1)).as("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      step.count() // the round's ONE action
      val changed = obs.get("n").asInstanceOf[Long]
      cached.unpersist() // the derived select below shares step's cache
      cached = step
      labels = step.select("id", "cluster")
      converged = changed == 0
    }
    // the label map is tiny next to the cached edge/step working set:
    // checkpoint it and release EVERYTHING — before r3 the final step
    // cache backed the returned frame and leaked into the session
    graft.core.Caching.reap(labels, cached, edges)
  }

  /** One propagation round: `(id, cluster, old)` where `cluster` is
    * the new label (min of own and neighbor labels) and `old` the
    * previous one — convergence is `cluster == old` everywhere.
    *
    * ONE join + ONE aggregation: the node's own label rides the same
    * groupBy as the neighbor messages (own=true), so the new label
    * AND the old label come out of a single exchange. The r7 shape
    * was join-on-dst + groupBy-src + join-back-on-id — three
    * label-sized exchanges per round plus a separate convergence
    * count; with `edges` cached pre-partitioned on `dst`, a round now
    * moves only the label frame (by dst) and the message frame (by
    * id). Every node is its own `own` message, so no outer join is
    * needed for nodes without changed neighbors. Package-private so
    * ClustersPlanSpec can pin the exchange count. */
  private[graft] def propagateStep(edges: DataFrame,
                                   labels: DataFrame): DataFrame = {
    val own = labels.select(
      col("id"), col("cluster").as("cand"), lit(true).as("own"))
    val msgs = edges.join(
        labels.select(col("id").as("dst"), col("cluster").as("cand")),
        Seq("dst"))
      .select(col("src").as("id"), col("cand"), lit(false).as("own"))
    own.unionByName(msgs)
      .groupBy("id")
      .agg(min(col("cand")).as("cluster"),
        min(when(col("own"), col("cand"))).as("old"))
  }
}
