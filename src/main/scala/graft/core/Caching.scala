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

  /** Materialize `result` to reliable files, then release the
    * persisted `intermediates` that fed it. Returns a frame whose
    * lineage references the spilled files only.
    *
    * Implementation is a parquet spill under the owned checkpoint
    * root, NOT `Dataset.checkpoint(eager = true)`: a reliable RDD
    * checkpoint runs the materializing action and THEN a second
    * checkpoint-write job that recomputes the whole lineage — the
    * result is computed twice (measured r14: dedup_spans 1.6 s →
    * 5.4 s at sf0.1 when its span table went through the RDD
    * checkpoint). The spill pays the plan exactly once (the parquet
    * write IS the materializing action), the files live under the
    * same shutdown-reaped scratch directory, and the source schema is
    * re-applied on read so empty results skip inference (the
    * [[reapScoped]] pattern, promoted). */
  def reap(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val spark = result.sparkSession
    val sc = spark.sparkContext
    ensureCheckpointDir(sc)
    val dir = new org.apache.hadoop.fs.Path(
      sc.getCheckpointDir.get, s"reap-${java.util.UUID.randomUUID()}")
    result.write.mode("overwrite").parquet(dir.toString)
    intermediates.foreach(_.unpersist(blocking = false))
    spark.read.schema(result.schema).parquet(dir.toString)
  }

  private def ensureCheckpointDir(sc: org.apache.spark.SparkContext): Unit =
    if (sc.getCheckpointDir.isEmpty) {
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-")
      ownedDirs.add(dir); hookInstalled
      sc.setCheckpointDir(dir.toString)
    }

  /** Scoped variant of [[reap]] for check-then-commit operators: the
    * pin lives exactly as long as `body`. [[reap]]'s checkpoint files
    * are reclaimed only at JVM shutdown, so a long-lived ingest
    * session committing thousands of batches would accumulate one
    * batch-sized scratch directory per commit with no reclamation
    * until exit; here the scratch is deleted as soon as `body`
    * returns. Implemented as a parquet spill under the checkpoint
    * root — the files are OURS to name and delete deterministically
    * (an RDD checkpoint's path is buried in Spark internals) — with
    * the source schema re-applied on read so an all-empty batch still
    * reads back as an empty frame instead of failing inference. Same
    * once-evaluation guarantee as [[reap]]: every read inside `body`
    * comes from the spilled files, never the source plan. */
  def reapScoped[T](result: DataFrame)(body: DataFrame => T): T = {
    val spark = result.sparkSession
    val sc = spark.sparkContext
    ensureCheckpointDir(sc)
    val dir = new org.apache.hadoop.fs.Path(
      sc.getCheckpointDir.get, s"pin-${java.util.UUID.randomUUID()}")
    val fs = dir.getFileSystem(sc.hadoopConfiguration)
    try {
      result.write.mode("overwrite").parquet(dir.toString)
      body(spark.read.schema(result.schema).parquet(dir.toString))
    } finally {
      try fs.delete(dir, true) catch { case _: Throwable => () }
    }
  }
}
