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
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cached = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), first(col("src"))).as("cluster"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = cached
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("cluster", "n_cluster"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("n_cluster")).as("n_min"))
      // carry the old label through the join so convergence detection
      // is a filter on the cached result, not a second join per round
      val step = labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"), col("cluster").as("old"),
          least(col("cluster"), coalesce(col("n_min"), col("cluster"))).as("cluster"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = step.where(col("cluster") =!= col("old")).count()
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
}
