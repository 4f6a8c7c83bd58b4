package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.etl.Wap

/** Streaming write-audit-publish: every micro-batch passes the
  * [[Wap]] audit (Quality constraints on the post-merge view) before
  * it may commit; a failing batch is QUARANTINED — its full rows land
  * under `_audit/quarantine/batch=<id>` for replay-after-fix — and
  * the stream continues. The two poison-batch failure modes are both
  * closed: the batch cannot wedge ingestion (no crash-loop on the
  * same offset range) and cannot poison the table (no version is
  * created, so downstream time travel / CDC / MVs never see it).
  *
  * Composes [[Wap]] (audit+commit) under foreachBatch; pair with
  * [[CdcIngest]]'s marker protocol when replay hardening across
  * driver crashes is also needed — the quarantine dir is keyed by
  * batch id, so a replayed rejection simply overwrites itself
  * (idempotent). */
object AuditedIngest {

  def quarantineDir(root: String): String = s"$root/_audit/quarantine"

  /** Drain everything currently available, auditing each micro-batch.
    * Returns after the drain completes. */
  def runAvailable(spark: SparkSession, stream: DataFrame, root: String,
                   keyCols: Seq[String], checkpoint: String,
                   checks: DataFrame => Seq[DataFrame]): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val out = Wap.ingest(spark, root, batch, keyCols, checks)
          if (out.committed.isEmpty)
            batch.write.mode("overwrite")
              .parquet(s"${quarantineDir(root)}/batch=$batchId")
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Batch directories currently present in the quarantine (empty when
    * the stream has never rejected a batch — the NORMAL production
    * state, not an error). */
  private def quarantineBatches(spark: SparkSession,
                                root: String): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(quarantineDir(root))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.globStatus(new org.apache.hadoop.fs.Path(dir, "batch=*"))
      .toSeq.filter(_.isDirectory).map(_.getPath.toString)
  }

  /** Quarantined rows across all rejected batches. A quarantine that
    * has never rejected anything reads as an EMPTY zero-column frame
    * (row-counting and emptiness checks work; column access needs at
    * least one quarantined batch to carry the schema) — it must not
    * throw, because "nothing rejected yet" is the normal state of a
    * healthy stream. Callers needing a typed empty frame pass the
    * ingest schema via the overload. */
  def quarantined(spark: SparkSession, root: String): DataFrame = {
    val batches = quarantineBatches(spark, root)
    if (batches.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(batches: _*)
  }

  /** As [[quarantined]], but an empty quarantine reads as an empty
    * frame of `schema` so downstream column references stay valid. */
  def quarantined(spark: SparkSession, root: String,
                  schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val batches = quarantineBatches(spark, root)
    if (batches.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(batches: _*)
  }

  /** Replay-after-fix: apply `fix` to one quarantined batch's rows,
    * re-ingest them through the SAME audit gate, and — only if the
    * repaired rows now pass and commit — drop the batch from the
    * quarantine. A fix that still fails the audit leaves the
    * quarantine untouched (the batch is NOT re-quarantined under a
    * new id, so no duplicate copies accumulate), mirroring a
    * FAILED→resubmit control-flow where the ticket stays open until
    * the resubmission succeeds. Returns true iff the batch committed. */
  def replay(spark: SparkSession, root: String, batchId: Long,
             keyCols: Seq[String], checks: DataFrame => Seq[DataFrame])
            (fix: DataFrame => DataFrame): Boolean = {
    val batchPath = new org.apache.hadoop.fs.Path(
      s"${quarantineDir(root)}/batch=$batchId")
    val fs = batchPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(batchPath), s"no quarantined batch $batchId under $root")
    val repaired = fix(spark.read.parquet(batchPath.toString))
    val out = Wap.ingest(spark, root, repaired, keyCols, checks)
    val ok = out.committed.nonEmpty
    if (ok) fs.delete(batchPath, true)
    ok
  }

  /** Replay every quarantined batch through [[replay]] (ascending
    * batch id, so repaired batches land in arrival order). Returns the
    * number of batches that passed the audit and committed. */
  def replayAll(spark: SparkSession, root: String, keyCols: Seq[String],
                checks: DataFrame => Seq[DataFrame])
               (fix: DataFrame => DataFrame): Int =
    quarantineBatches(spark, root)
      .map(p => p.substring(p.lastIndexOf('=') + 1).toLong).sorted
      .count(id => replay(spark, root, id, keyCols, checks)(fix))
}
