package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-style idempotent upsert over a partitioned parquet table —
  * the Delta-less control-table path (SURVEY.md §1.1: DynamoDB
  * Control/Stage tables keyed by object name with idempotent status
  * updates; BASELINE north star: "Spark read/write + Delta/Iceberg
  * operations" — no table-format jars ship here, so MERGE semantics
  * are composed from dynamic-partition overwrite).
  *
  * Semantics: newest version per key wins (version = caller-supplied
  * monotonic column, e.g. batch id or status ordinal). Only the
  * partitions TOUCHED by the incoming batch are rewritten — at 100 TB
  * an upsert of one day rewrites one day.
  *
  * Crash safety (r8): the r7 implementation read and
  * dynamic-overwrote the SAME parquet path in one job — a driver
  * crash mid-commit, or a reader racing the commit, saw a
  * half-rewritten partition. The merge now goes through a staged
  * write-ahead protocol (same shape as the reference's
  * idempotent-by-key control-table updates, and as
  * `VersionedTable.publish`'s claim/manifest split):
  *
  *  1. merged partitions are STAGED under a dot-prefixed dir inside
  *     the table (`.merge-stage-<uuid>/part=<v>/...`) — hidden from
  *     every Spark/Hive reader, so a crash here leaves the table
  *     byte-identical;
  *  2. a PENDING MARKER (`.merge-pending-<uuid>`, written sideways +
  *     atomic rename) records the staging dir — the commit point;
  *  3. each staged partition dir is swapped into place (delete old,
  *     rename staged in — the staged dir holds the FULL merged
  *     partition, old rows included, so the old copy is redundant the
  *     moment staging completes);
  *  4. marker and staging remnants are removed.
  *
  * A crash before 2 is invisible (stale staging is swept on the next
  * merge). A crash after 2 is ROLLED FORWARD by the next
  * [[mergeIntoParquet]] on the same path (or an explicit [[recover]]):
  * every staged partition still pending is swapped in before the new
  * merge reads the table, so no replay ever reads a half-committed
  * state and the retried merge lands identically (the crash-injection
  * contract pinned by UpsertCrashSpec).
  *
  * Writer contract: ONE writer per table path at a time (crashed
  * writers replayed by their successor are fine; that is the
  * reference's control-table model — a state machine hands each
  * object to exactly one worker). CONCURRENT writers on one path need
  * arbitration this eager-merge path deliberately does not carry —
  * use [[graft.etl.VersionedTable.commitUpsert]] +
  * [[graft.etl.VersionedTable.commitWithRetry]], whose claim protocol
  * makes exactly one concurrent committer win.
  */
object Upsert {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Test seam: invoked with a named failpoint at each commit-protocol
    * step; specs substitute a throwing function to simulate a crash at
    * exactly that point. Production calls leave the default no-op. */
  private[graft] type Failpoint = String => Unit
  private[graft] val NoFail: Failpoint = _ => ()

  private def pendingMarkers(spark: SparkSession, path: String): Seq[Path] = {
    val f = fs(spark, path)
    val root = new Path(path)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(".merge-pending-"))
  }

  /** Roll forward any merge that crashed after its commit point: for
    * every pending marker, swap in the staged partitions it recorded,
    * then drop marker + staging. Safe to call at any time — staged
    * dirs hold full merged partitions, so re-swapping after a partial
    * swap simply completes it (idempotent). Returns the number of
    * recovered merges. */
  def recover(spark: SparkSession, path: String): Int = {
    val f = fs(spark, path)
    val markers = pendingMarkers(spark, path)
    markers.foreach { m =>
      val stagingName = {
        val in = f.open(m)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      }
      val staging = new Path(path, stagingName)
      if (f.exists(staging)) {
        swapIn(spark, path, staging)
        f.delete(staging, true)
      }
      f.delete(m, false)
    }
    markers.size
  }

  /** Move every partition dir under `staging` into the table root,
    * replacing the previous copy. Idempotent: partitions already
    * swapped in a crashed earlier pass are simply absent from
    * `staging` and skipped. */
  private def swapIn(spark: SparkSession, path: String, staging: Path): Unit = {
    val f = fs(spark, path)
    f.listStatus(staging).toSeq.map(_.getPath)
      .filter(p => p.getName.contains("=") && !p.getName.startsWith("."))
      .foreach { staged =>
        val dest = new Path(path, staged.getName)
        f.delete(dest, true)
        if (!f.rename(staged, dest))
          throw new IllegalStateException(
            s"failed to swap merged partition ${staged.getName} into $path")
      }
  }

  /** Drop stale staging dirs whose marker never landed (a writer
    * crashed BEFORE its commit point — the merge never happened and
    * must not be completed). Hidden from readers, so this is pure
    * housekeeping. */
  private def sweepStaleStaging(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val root = new Path(path)
    if (!f.exists(root)) return
    val pendingStagings = pendingMarkers(spark, path).map { m =>
      val in = f.open(m)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }.toSet
    f.listStatus(root).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith(".merge-stage-") &&
        !pendingStagings(p.getName))
      .foreach(p => f.delete(p, true))
  }

  /** Merge `updates` into the parquet table at `path`, keyed by
    * `keyCols`, newest `versionCol` wins (ties: update wins). The
    * table is partitioned by `partitionCol`, which must be derivable
    * from every row. Crash-safe per the staged-commit protocol above;
    * `failpoint` is the crash-injection test seam. */
  def mergeIntoParquet(spark: SparkSession, path: String, updates: DataFrame,
                       keyCols: Seq[String], versionCol: String,
                       partitionCol: String,
                       failpoint: Failpoint = NoFail): Unit = {
    val f = fs(spark, path)
    // finish any merge that crashed after its commit point, so this
    // merge reads a fully-committed table state
    recover(spark, path)
    sweepStaleStaging(spark, path)
    val exists = try {
      spark.read.parquet(path); true
    } catch { case _: Exception => false }
    if (!exists) {
      // initial load: plain overwrite is already atomic-enough — a
      // replay overwrites whatever a crashed first attempt left
      dedupeLatest(updates, keyCols, versionCol)
        .write.mode("overwrite").partitionBy(partitionCol).parquet(path)
      return
    }
    val current = spark.read.parquet(path)
    // only partitions present in the update batch participate
    val touched = updates.select(partitionCol).distinct()
    val affected = current.join(broadcast(touched), Seq(partitionCol), "left_semi")
    val merged = dedupeLatest(
      affected.withColumn("__is_update", lit(0))
        .unionByName(updates.withColumn("__is_update", lit(1))),
      keyCols, versionCol, tieBreak = Some("__is_update"))
      .drop("__is_update")
    // 1. stage the full merged copy of every touched partition,
    //    hidden inside the table (dot prefix = invisible to readers)
    val stagingName = s".merge-stage-${java.util.UUID.randomUUID}"
    val staging = new Path(path, stagingName)
    merged.write.mode("errorifexists").partitionBy(partitionCol)
      .parquet(staging.toString)
    failpoint("staged")
    // 2. commit point: the pending marker lands atomically (sideways
    //    write + single-object rename, as VersionedTable manifests do)
    val marker = new Path(path, s".merge-pending-${java.util.UUID.randomUUID}")
    val tmp = new Path(path, s"${marker.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(stagingName.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, marker)) {
      f.delete(tmp, false)
      throw new IllegalStateException(s"failed to commit merge marker on $path")
    }
    failpoint("marked")
    // 3. swap each staged partition into place
    swapIn(spark, path, staging)
    failpoint("swapped")
    // 4. housekeeping: the merge is durable; drop marker + remnants
    f.delete(staging, true)
    f.delete(marker, false)
  }

  /** Keep the newest row per key (max versionCol, optional tie-break
    * column, both descending) via max(struct) — partial-aggregable,
    * no window sort. */
  def dedupeLatest(df: DataFrame, keyCols: Seq[String], versionCol: String,
                   tieBreak: Option[String] = None): DataFrame = {
    val payloadCols = df.columns.filterNot(keyCols.contains)
    val ordering = struct(
      (Seq(col(versionCol)) ++ tieBreak.map(col) ++
        payloadCols.filterNot(c => c == versionCol || tieBreak.contains(c)).map(col)): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max(ordering).as("__m"))
      .select(keyCols.map(col) ++ payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
