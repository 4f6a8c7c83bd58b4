package graft.ops

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
  * partitions TOUCHED by the incoming batch are rewritten
  * (partitionOverwriteMode=dynamic) — at 100 TB an upsert of one day
  * rewrites one day.
  */
object Upsert {

  /** Merge `updates` into the parquet table at `path`, keyed by
    * `keyCols`, newest `versionCol` wins (ties: update wins). The
    * table is partitioned by `partitionCol`, which must be derivable
    * from every row. */
  def mergeIntoParquet(spark: SparkSession, path: String, updates: DataFrame,
                       keyCols: Seq[String], versionCol: String,
                       partitionCol: String): Unit = {
    val exists = try {
      spark.read.parquet(path); true
    } catch { case _: Exception => false }
    if (!exists) {
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
    merged.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
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
