package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-audit-publish (Iceberg's WAP pattern / Delta table
  * constraints): a batch reaches the versioned table ONLY if its
  * audit suite passes; a failing batch is rejected whole and the
  * table is untouched — bad data never becomes a version that
  * downstream time travel, CDC replay, or incremental MVs can
  * observe, so nothing needs a revert.
  *
  * The audit runs on the POST-MERGE view (current state with the
  * batch applied, built merge-on-read without committing anything) —
  * cross-batch violations (a "new" key that collides with a live row,
  * a range drifting past budget only in aggregate) are caught, not
  * just batch-local ones. Cost: the audit pays one read of (table +
  * batch) — the same scan profile as the merge it gates — and the
  * constraint aggregates are partial-aggregable ([[Quality]]'s
  * contract), so at 100 TB the gate adds one table pass, not a
  * shuffle of the corpus.
  */
object Wap {

  /** Outcome of one gated ingest: the audit report (one row per
    * check: name, violations, n_checked, pass) plus the committed
    * version — None when the batch was rejected. */
  final case class Outcome(report: Seq[(String, Long, Long, Boolean)],
                           committed: Option[Long])

  /** Audit `batch` against the table's would-be next state; commit it
    * as an upsert only if every check passes. `checks` receives the
    * post-merge view and returns [[Quality]]-shaped check frames
    * (check_name, violations, n_checked). */
  def ingest(spark: SparkSession, root: String, batch: DataFrame,
             keyCols: Seq[String],
             checks: DataFrame => Seq[DataFrame]): Outcome = {
    val bootstrap = VersionedTable.versions(spark, root).isEmpty
    // post-merge view, merge-on-read: batch rows shadow current rows
    // on the key (same semantics commitUpsert will apply). On an
    // uninitialized table the would-be state IS the batch.
    val merged =
      if (bootstrap) batch
      else VersionedTable.readLatest(spark, root, keyCols)
        .join(batch.select(keyCols.map(col): _*), keyCols, "left_anti")
        .unionByName(batch, allowMissingColumns = true)
    val report = Quality.suite(checks(merged))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    if (report.forall(_._4)) {
      val v = VersionedTable.commitWithRetry() {
        if (bootstrap) VersionedTable.init(spark, root, batch)
        else VersionedTable.commitUpsert(spark, root, batch)
      }
      Outcome(report, Some(v))
    } else Outcome(report, None)
  }
}
