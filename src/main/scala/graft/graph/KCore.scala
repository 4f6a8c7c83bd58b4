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

  /** Per-round survival statistics for `rounds` peels at threshold
    * `k` over an edge list given as (a, b) pairs (direction/dups
    * ignored, self-loops dropped). Output: (round, n_nodes, n_edges)
    * where n_nodes counts nodes meeting the threshold that round and
    * n_edges the edges with both endpoints surviving. */
  def peelRounds(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
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
      val keep = deg.where(col("d") >= k).select("id")
      val next = edges
        .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .persist(StorageLevel.MEMORY_AND_DISK)
      cached += next
      val row = keep.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(broadcast(next.agg(count(lit(1)).as("n_edges"))))
        .select(lit(r).as("round"), col("n_nodes"), col("n_edges"))
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
