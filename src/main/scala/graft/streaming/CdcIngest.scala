package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.etl.VersionedTable

/** Change-data-capture ingestion: drain a stream into a
  * `VersionedTable`, one commit per non-empty micro-batch.
  *
  * Rows carry an op column ('U' upsert / 'D' delete); a batch lands as
  * at most one upsert commit + one delete commit. Restart safety: the
  * stream checkpoint gives at-least-once batch delivery, and a
  * last-committed-batch marker in the table root makes the commit
  * idempotent — a replayed batch id is skipped, so the table sees each
  * batch exactly once (same pattern as the reference's
  * idempotent-by-object-key control table, SURVEY §2.9 T2/T3). A crash
  * BETWEEN the data commits and the marker is also safe: each version
  * dir carries a batch tag, and replay first rolls back tagged dirs
  * newer than the marker before recommitting. Batch ids are scoped to
  * the stream checkpoint — the checkpoint and the table's marker must
  * be retained (or reset) together.
  *
  * Scale shape: each micro-batch writes only its own rows (append-only
  * commits); merge-on-read cost then grows with commits, so pair with
  * periodic `VersionedTable.compact` — the streaming analog of small-
  * file compaction (R2).
  */
object CdcIngest {

  private def markerPath(root: String) = new Path(s"$root/_cdc_last_batch")

  private def lastBatch(spark: SparkSession, root: String): Long = {
    val fs = markerPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(markerPath(root))) -1L
    else {
      val in = fs.open(markerPath(root))
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeMarker(spark: SparkSession, root: String, id: Long): Unit = {
    val fs = markerPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(markerPath(root), true)
    try out.write(id.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Tag a committed version's data directory with the batch that
    * produced it (underscore-prefixed → invisible to parquet
    * readers). */
  private[graft] def tagBatch(spark: SparkSession, root: String, v: Long,
                       batchId: Long): Unit = {
    val p = new Path(s"${VersionedTable.dataDir(spark, root, v)}/_cdc_batch")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Delete version directories whose batch tag is newer than the last
    * fully-marked batch: leftovers of a crash between the data commits
    * and the last-batch marker. Replay then recommits the batch from
    * scratch, so version history carries each batch exactly once (the
    * duplicate-commit window ADVICE r1 flagged).
    *
    * The OCC claim (`_commits/N.commit`) is released along with each
    * rolled-back commit — otherwise the replayed batch would land at
    * a HIGHER version number and the exactly-once-version-history
    * contract above would break. So are orphan claims with no
    * manifest (a crash between claim and manifest, or between a
    * previous rollback's manifest- and claim-deletion). Releasing is
    * safe here (and only here) because the CDC drain is the single
    * writer that owns the stream checkpoint, so no concurrent commit
    * can be racing for the released numbers. */
  private[graft] def rollbackPartial(spark: SparkSession, root: String,
                              lastDone: Long): Unit = {
    val fs = markerPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    VersionedTable.versions(spark, root).foreach { v =>
      val dir = VersionedTable.dataDir(spark, root, v)
      val tag = new Path(s"$dir/_cdc_batch")
      if (fs.exists(tag)) {
        val in = fs.open(tag)
        val id = try scala.io.Source.fromInputStream(in).mkString.trim.toLong
                 finally in.close()
        if (id > lastDone) {
          // manifest first (the version atomically disappears), then
          // the claim, then data — every crash prefix is a state the
          // next replay handles (orphan claim → the sweep below;
          // orphan data dir → vacuumOrphans)
          VersionedTable.releaseClaim(spark, root, v)
          fs.delete(new Path(dir), true)
        }
      }
    }
    VersionedTable.unpublishedClaims(spark, root)
      .foreach(VersionedTable.releaseClaim(spark, root, _))
  }

  /** Drain everything currently available on `stream` into the table
    * at `root`. `stream` columns: key + payload + `opCol` ('U'/'D').
    * Blocks until the drain completes. */
  def runAvailable(spark: SparkSession, stream: DataFrame, root: String,
                   keyCols: Seq[String], opCol: String,
                   checkpoint: String): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val last = lastBatch(spark, root)
        if (batchId > last && !batch.isEmpty) {
          // a crash after the data commits but before the marker leaves
          // tagged version dirs with no marker — drop them and recommit
          rollbackPartial(spark, root, last)
          val ups = batch.where(col(opCol) =!= "D").drop(opCol)
          val dels = batch.where(col(opCol) === "D")
            .select(keyCols.map(col): _*)
          if (!ups.isEmpty) {
            val v = if (VersionedTable.versions(spark, root).isEmpty)
              VersionedTable.init(spark, root, ups)
            else VersionedTable.commitUpsert(spark, root, ups)
            tagBatch(spark, root, v, batchId)
          }
          // deletes against a not-yet-initialized table are no-ops
          // (there is nothing to tombstone and no schema to borrow)
          if (!dels.isEmpty && VersionedTable.versions(spark, root).nonEmpty) {
            val v = VersionedTable.commitDelete(spark, root, dels)
            tagBatch(spark, root, v, batchId)
          }
          writeMarker(spark, root, batchId)
        }
      }
      .start()
    q.awaitTermination()
  }
}
