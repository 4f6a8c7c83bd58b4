package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Upsert

/** Versioned parquet table with snapshot isolation, time travel,
  * tombstone deletes and merge-on-read — the Delta/Iceberg operation
  * set (BASELINE north star) composed from plain parquet + a
  * directory-per-commit layout, no table-format jars.
  *
  * Layout: `root/v=N/` per commit; a commit that materializes the full
  * state additionally carries an empty `root/v=N/_SNAPSHOT` marker.
  * Row-level metadata: `__deleted` tombstone flag (deletes ship keys
  * only); the commit id itself is recovered from the directory name at
  * read time, so data files are byte-identical to a plain parquet
  * table plus one boolean column.
  *
  * Scale shape:
  * - Commits are APPEND-ONLY — an upsert of one batch writes only that
  *   batch (no read-modify-write of the 100 TB base, unlike the
  *   eager-merge `ops.Upsert` path; pick per workload).
  * - Merge-on-read unions the versions SINCE THE LAST SNAPSHOT and
  *   keeps the newest row per key with one partial-aggregable
  *   max(struct) — no window sort, and the shuffle carries each key
  *   once per live version, not the table × versions.
  * - Time travel is directory pruning at file-listing time: versions
  *   beyond `asOf` are never opened.
  * - `compact` bounds read amplification: it folds the live version
  *   chain into a new snapshot commit, after which readers list one
  *   directory until the next delta lands.
  */
object VersionedTable {

  private val Deleted = "__deleted"

  /** A concurrent writer claimed the version this commit targeted.
    * The losing commit fails ATOMICALLY: its staged data is removed
    * and the table is untouched — the caller re-reads and retries on
    * top of the winner's commit (optimistic concurrency, the
    * Delta/Iceberg commit contract). The reference gets the same
    * exactly-one-wins property from DynamoDB conditional puts on its
    * ingestion control table. */
  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version ids, ascending (empty if uninitialized). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val p = new Path(root)
    val f = fs(spark, root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong).sorted
  }

  private def isSnapshot(spark: SparkSession, root: String, v: Long): Boolean =
    fs(spark, root).exists(new Path(s"$root/v=$v/_SNAPSHOT"))

  /** Version ids ever CLAIMED (committed or in flight / crashed
    * mid-publish). Superset of [[versions]]; next-version numbering
    * must skip claims so a crashed claim can never be re-targeted. */
  private def claimed(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(s"$root/_commits")
    val f = fs(spark, root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit").toLong).sorted
  }

  /** Release the claim on `version`, making the number targetable
    * again. ONLY safe for a caller that owns the table exclusively
    * (e.g. a CDC drain rolling back its own torn batch — the single
    * writer that holds the stream checkpoint): with concurrent writers
    * the claim is the arbitration record and must stay burned. */
  private[graft] def releaseClaim(spark: SparkSession, root: String,
                                  version: Long): Unit =
    fs(spark, root).delete(new Path(s"$root/_commits/$version.commit"), false)

  /** Stage → claim → publish commit protocol (exactly one writer wins
    * any version):
    *  1. data is written to a staging dir NEXT TO the table, never to
    *     `v=N` directly — a losing writer's files can't interleave
    *     with the winner's;
    *  2. the version is claimed by exclusive-create of
    *     `_commits/N.commit` — `FileSystem.create(overwrite=false)`
    *     is the filesystem's atomic test-and-set (the primitive
    *     Delta's HDFS LogStore commits through); the loser gets
    *     [[ConcurrentCommitException]], its staging removed, table
    *     untouched;
    *  3. the claim holder renames staging onto `v=N` — no other
    *     writer can target N, so the rename never merges into a
    *     concurrent writer's directory.
    * A writer crashing between 2 and 3 leaves an orphan claim: that
    * version number is burned (numbering skips it) and readers — who
    * list `v=*` data directories — never see a torn commit. */
  private[graft] def publish(spark: SparkSession, root: String, df: DataFrame,
                             snapshot: Boolean, version: Long): Long = {
    val f = fs(spark, root)
    val staging = new Path(
      s"$root/.staging-$version-${java.util.UUID.randomUUID}")
    df.write.mode("errorifexists").parquet(staging.toString)
    if (snapshot) f.create(new Path(staging, "_SNAPSHOT")).close()
    val claim = new Path(s"$root/_commits/$version.commit")
    f.mkdirs(claim.getParent)
    // Lost-race detection must be SPECIFIC: only claim-already-exists is
    // a concurrent winner. A transient IOException (quota, permission,
    // network) must propagate — reporting it as ConcurrentCommitException
    // would send the caller into a retry loop against a persistent error.
    val won =
      try { f.create(claim, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if f.exists(claim) => false
        case e: java.io.IOException => f.delete(staging, true); throw e
      }
    if (!won) {
      f.delete(staging, true)
      throw new ConcurrentCommitException(
        s"version $version of $root was claimed by a concurrent writer; " +
          "re-read the table and retry the commit")
    }
    val dst = new Path(s"$root/v=$version")
    if (!f.rename(staging, dst)) {
      f.delete(staging, true)
      throw new IllegalStateException(s"failed to publish $staging -> $dst")
    }
    version
  }

  private def write(spark: SparkSession, root: String, df: DataFrame,
                    snapshot: Boolean): Long = {
    val next = (versions(spark, root) ++ claimed(spark, root))
      .maxOption.fold(0L)(_ + 1)
    publish(spark, root, df, snapshot, next)
  }

  /** Run a commit thunk, retrying on [[ConcurrentCommitException]] up
    * to `maxAttempts` total attempts — the optimistic-concurrency loop
    * every multi-writer caller needs, provided once instead of
    * hand-rolled (Delta's commitWithRetries). The thunk re-executes
    * FROM SCRATCH each attempt, which is exactly right: version
    * numbering re-lists the table, and state-dependent commits
    * (compact, read-modify-write merges) re-read the winner's data
    * before re-attempting. Retries stop at `maxAttempts` so a
    * persistent conflict storm surfaces as the exception rather than
    * an unbounded loop; anything that is NOT a lost commit race
    * propagates immediately. This is the default entry for commits
    * under possible write contention:
    * {{{
    * VersionedTable.commitWithRetry() {
    *   VersionedTable.commitUpsert(spark, root, batch)
    * }
    * }}} */
  def commitWithRetry[A](maxAttempts: Int = 5)(commit: => A): A = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 1
    while (true) {
      try return commit
      catch {
        case e: ConcurrentCommitException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** v=0 full snapshot. */
  def init(spark: SparkSession, root: String, df: DataFrame): Long =
    write(spark, root, df.withColumn(Deleted, lit(false)), snapshot = true)

  /** Append an upsert commit: rows replace same-key rows at read time. */
  def commitUpsert(spark: SparkSession, root: String, updates: DataFrame): Long =
    write(spark, root, updates.withColumn(Deleted, lit(false)), snapshot = false)

  /** Append a delete commit: `keys` holds the key columns only; payload
    * columns are null-filled to keep one schema per table. */
  def commitDelete(spark: SparkSession, root: String, keys: DataFrame): Long = {
    // borrow the newest commit's schema (v=0 may have been expired)
    val latest = versions(spark, root).last
    val schema = spark.read.parquet(s"$root/v=$latest").drop(Deleted).schema
    val tomb = schema.fields.foldLeft(keys) { (df, f) =>
      if (keys.columns.contains(f.name)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(schema.fieldNames.map(col): _*).withColumn(Deleted, lit(true))
    write(spark, root, tomb, snapshot = false)
  }

  /** Snapshot state as of version `asOf` (newest-per-key wins,
    * tombstones drop). Only versions in (last snapshot ≤ asOf, asOf]
    * are listed or read. */
  def readAsOf(spark: SparkSession, root: String, keyCols: Seq[String],
               asOf: Long): DataFrame = {
    val vs = versions(spark, root).filter(_ <= asOf)
    require(vs.nonEmpty, s"no committed version ≤ $asOf under $root")
    val base = vs.reverse.find(isSnapshot(spark, root, _)).getOrElse(vs.head)
    val live = vs.filter(_ >= base)
    val merged = live.map { v =>
        spark.read.parquet(s"$root/v=$v").withColumn("__commit", lit(v))
      // schema evolution: later commits may add columns; earlier rows
      // read them as null (Delta's mergeSchema-on-read behavior)
      }.reduce(_.unionByName(_, allowMissingColumns = true))
    Upsert.dedupeLatest(merged, keyCols, "__commit")
      .where(!col(Deleted)).drop(Deleted, "__commit")
  }

  /** Latest state. */
  def readLatest(spark: SparkSession, root: String, keyCols: Seq[String]): DataFrame =
    readAsOf(spark, root, keyCols, versions(spark, root).last)

  /** Fold the live chain into a new snapshot commit; readers of newer
    * versions then touch one directory. Old versions stay for time
    * travel (pair with a retention sweep to expire them). */
  def compact(spark: SparkSession, root: String, keyCols: Seq[String]): Long =
    write(spark, root,
      readLatest(spark, root, keyCols).withColumn(Deleted, lit(false)),
      snapshot = true)

  /** Row-level changes committed in (`fromV`, `toV`]: the CDC-out
    * feed. Each row carries its commit id and op ('U'/'D') — exactly
    * what a downstream `CdcIngest` consumer replays. Only the
    * requested version directories are read.
    *
    * Snapshot commits AFTER v=0 (compactions) are skipped: a
    * compaction rewrites unchanged data, so replaying it would emit
    * the whole table as spurious updates — Delta's change feed
    * likewise emits nothing for OPTIMIZE. v=0 is kept when the range
    * includes it (callers asking from before the table existed want
    * the initial state as inserts). */
  def readChangesBetween(spark: SparkSession, root: String,
                         fromV: Long, toV: Long): DataFrame = {
    val vs = versions(spark, root)
      .filter(v => v > fromV && v <= toV)
      .filter(v => v == 0L || !isSnapshot(spark, root, v))
    require(vs.nonEmpty, s"no change commits in ($fromV, $toV] under $root")
    vs.map { v =>
        spark.read.parquet(s"$root/v=$v").withColumn("__commit", lit(v))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
      .withColumn("__op", when(col(Deleted), lit("D")).otherwise(lit("U")))
      .drop(Deleted)
  }

  /** Expire versions older than the newest snapshot ≤ `keepFrom`,
    * bounding storage and the time-travel horizon (Delta VACUUM).
    * Never removes the snapshot that newer deltas depend on. Returns
    * the removed version ids. */
  def expire(spark: SparkSession, root: String, keepFrom: Long): Seq[Long] = {
    val vs = versions(spark, root)
    val anchor = vs.filter(_ <= keepFrom).reverse.find(isSnapshot(spark, root, _))
    val removable = anchor.fold(Seq.empty[Long])(a => vs.filter(_ < a))
    val f = fs(spark, root)
    removable.foreach(v => f.delete(new Path(s"$root/v=$v"), true))
    removable
  }

  /** (version, is_snapshot, n_rows) per commit — the table history.
    *
    * ONE Spark job regardless of commit count: every version directory
    * is scanned in a single unioned plan tagged with its commit id and
    * counted by one groupBy (a count() per version would launch one
    * job each — 10k commits = 10k jobs for a metadata view). Snapshot
    * flags are filesystem metadata, never a job. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val vs = versions(spark, root)
    if (vs.isEmpty)
      return Seq.empty[(Long, Boolean, Long)]
        .toDF("version", "is_snapshot", "n_rows")
    // one schema probe for the whole chain: per-dir inference would
    // launch a footer-reading job per version (measured: 10 versions =
    // 10 pre-action jobs). The newest schema reads older files with
    // nulls for later-added columns — and the count needs no columns.
    val schema = spark.read.parquet(s"$root/v=${vs.last}").schema
    val counts = vs.map { v =>
        spark.read.schema(schema).parquet(s"$root/v=$v")
          .select(lit(v).as("version"))
      }.reduce(_.unionByName(_))
      .groupBy("version").agg(count(lit(1)).as("n_rows"))
    val meta = vs.map(v => (v, isSnapshot(spark, root, v)))
      .toDF("version", "is_snapshot")
    // left join from metadata so an empty commit still shows n_rows=0
    meta.join(counts, Seq("version"), "left_outer")
      .select(col("version"), col("is_snapshot"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
  }
}
