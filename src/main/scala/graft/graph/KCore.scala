package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterated k-core peeling — the standard dense-subgraph filter (link
  * spam and scraper-ring detection on crawl graphs: low-core nodes are
  * the long tail, the surviving core is the tightly-linked cluster
  * worth inspecting).
  *
  * One peel round: drop every node whose CURRENT degree is below `k`,
  * then drop the edges that lost an endpoint. The full k-core is this
  * round iterated to fixpoint; [[peelRounds]] runs a FIXED number of
  * rounds instead — deterministic output replayable by an unrolled
  * SQL oracle, no data-dependent convergence action per round (the
  * PageRank fixed-iteration lesson), and on heavy-tailed graphs the
  * first few rounds remove nearly everything the fixpoint would.
  *
  * Shape per round: one degree aggregation + two semi-joins of the
  * edge list against the surviving-node set — all keyed shuffles on
  * node ids, edge-set-sized, shrinking monotonically. Each round's
  * edge frame is lazily persisted so the union of per-round stats
  * materializes every level exactly once (without the cache, round r
  * would recompute the whole chain below it and the union would cost
  * O(rounds²) passes).
  */
object KCore {

  /** Surviving-node sets at or below this row count are broadcast into
    * the per-round semi-joins (ids only — 4M longs ≈ 32 MB on an 8 g+
    * driver); larger sets fall back to the shuffled semi-join. The
    * count is EXACT (it is the n_nodes statistic the gate outputs
    * anyway), so the strategy choice is data-adaptive, not a local-mode
    * constant: a 100 TB crawl graph whose survivor set no longer fits
    * simply takes the shuffle path. */
  val BroadcastNodeCap: Long =
    sys.env.getOrElse("SPARK_GRAFT_KCORE_BCAST_CAP", "4000000").toLong

  /** Per-round survival statistics for `rounds` peels at threshold
    * `k` over an edge list given as (a, b) pairs (direction/dups
    * ignored, self-loops dropped). Output: (round, n_nodes, n_edges)
    * where n_nodes counts nodes meeting the threshold that round and
    * n_edges the edges with both endpoints surviving. */
  def peelRounds(pairs: DataFrame, k: Int, rounds: Int,
                 broadcastCap: Long = BroadcastNodeCap): DataFrame = {
    val spark = pairs.sparkSession
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var edges = pairs
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    cached += edges
    val stats = (1 to rounds).map { r =>
      val deg = edges.select(col("a").as("id"))
        .unionAll(edges.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      // keep feeds THREE consumers (both semi-joins + the n_nodes
      // stat); un-persisted each re-runs the E-row degree aggregation
      // (r16: ~0.3 s × 2 extra × rounds at sf0.1). V-row cache,
      // released with the per-round edge frames below.
      val keep = deg.where(col("d") >= k).select("id")
        .persist(StorageLevel.MEMORY_AND_DISK)
      cached += keep
      // n_nodes is needed as output anyway; counting it EAGERLY both
      // fills keep's cache and gives the exact size on which to pick
      // the semi-join strategy. Broadcasting the V-row survivor set
      // turns BOTH per-round semi-joins from E-sized shuffles into
      // map-side hash probes — the degree aggregation becomes the only
      // exchange per round (3 exchanges/round -> 1).
      val nNodes = keep.count()
      val keepJ = if (nNodes <= broadcastCap) broadcast(keep) else keep
      val next = edges
        .join(keepJ.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(keepJ.select(col("id").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .persist(StorageLevel.MEMORY_AND_DISK)
      cached += next
      val row = next.agg(count(lit(1)).as("n_edges"))
        .select(lit(r).as("round"), lit(nNodes).as("n_nodes"), col("n_edges"))
      edges = next
      row
    }
    val plan = stats.reduceLeft(_ unionAll _).orderBy("round")
    // Materialize here (`rounds` rows — k-bounded) so every per-round
    // cached edge frame can be released immediately; returning the lazy
    // plan instead leaks rounds+1 cached frames for the session lifetime
    // (real in a bench loop that runs the registry repeatedly).
    val rows = plan.collect().toIndexedSeq
    cached.foreach(_.unpersist(blocking = false))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, plan.schema)
  }
}
