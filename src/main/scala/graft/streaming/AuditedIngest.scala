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

  /** Quarantined rows across all rejected batches (empty frame shape
    * requires at least one quarantined batch — callers check
    * existence first via the FileSystem or catch AnalysisException). */
  def quarantined(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"${quarantineDir(root)}/batch=*")
}
