package graft.core

import org.apache.spark.sql.DataFrame

/** Cache-lifetime discipline for EAGER multi-pass operators (iterative
  * algorithms that run their own actions, e.g. label propagation).
  *
  * Such an operator persists intermediates for its own lifetime and —
  * before r3 — returned a result still BACKED by the final cache, so
  * every invocation leaked MEMORY_AND_DISK blocks into the session
  * (r1 post-mortem: leftover blocks tax later queries' heap). `reap`
  * cuts the cord: the result is materialized into a reliable
  * checkpoint (plain files, no storage blocks), after which the caches
  * can be released without triggering recompute on first use.
  *
  * Only worth it when the result is small relative to the cached
  * working set — true for label maps, pair lists, survivors. LAZY
  * operators (MinHashLSH & co.) keep their persist-for-lifetime shape
  * instead: their caches back a still-lazy result, and the harness
  * boundary (Verify/Bench clearCache between queries) scopes them.
  *
  * Production note: local mode checkpoints under java.io.tmpdir; on a
  * cluster set `SparkContext.setCheckpointDir` to shared storage
  * before calling any eager operator.
  */
object Caching {

  /** Temp checkpoint dirs this JVM created (one per SparkContext; the
    * r3 shape created a fresh dir lazily and never removed it, so a
    * long session accumulated unbounded checkpoint data in tmpdir). A
    * single shutdown hook recursively deletes them all. */
  private val ownedDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  private lazy val hookInstalled: Unit =
    sys.addShutdownHook {
      ownedDirs.forEach { dir =>
        try {
          java.nio.file.Files.walk(dir)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Throwable => () }
      }
    }

  /** Materialize `result` to a checkpoint, then release the persisted
    * `intermediates` that fed it. Returns the checkpointed frame,
    * whose lineage references the checkpoint files only. */
  def reap(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val sc = result.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-")
      ownedDirs.add(dir); hookInstalled
      sc.setCheckpointDir(dir.toString)
    }
    val out = result.checkpoint(eager = true)
    intermediates.foreach(_.unpersist(blocking = false))
    out
  }
}
