package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index for approximate-nearest-neighbor serving: train
  * once, write the index to storage, answer every later query batch
  * from the saved artifact. At corpus scale the clustering pass is the
  * expensive step (it scans all vectors × centroids); re-running it
  * per query batch — what the build-inline `sim_kmeans_ivf` gate does
  * for oracle replayability — is not an architecture that survives a
  * production query load. This module is the missing lifecycle:
  *
  *  - [[build]]: k-means centroids + nearest-centroid assignment,
  *    written as plain parquet with the assignment PARTITIONED BY
  *    BUCKET — one directory per centroid.
  *  - [[search]]: the standard probe, against the loaded artifact.
  *
  * The bucket partitioning is the scale lever: a search probes
  * `nprobe` of `k` buckets, and because `bucket` is a PARTITION
  * column joined against the broadcast probe set, Spark's dynamic
  * partition pruning skips the unprobed directories at scan time —
  * the index read is ~`nprobe/k` of the corpus, not a full scan
  * (asserted by AnnIndexSpec on the executed plan). Delta/Iceberg
  * users get the same effect from clustering the assignment table on
  * `bucket`.
  *
  * Determinism: centroids and assignment are byte-deterministic
  * (KMeans fixed init + rounded-argmax assignment), so a saved index
  * answers queries EXACTLY like a freshly built one — the
  * `sim_ann_persisted` gate replays the same DuckDB oracle as the
  * inline k-means gate to prove the round trip is lossless.
  */
object AnnIndex {

  /** Train and persist: `path/centroids` (centroid_id, cvec),
    * `path/assignment` (idCol, vecCol, bucket=partition dir), and
    * `path/meta.json` naming the id/vector columns — the index's
    * column contract is recorded AT BUILD TIME, not re-inferred from
    * schema position later (a payload join or schema evolution that
    * reorders assignment columns must not re-key tombstones). */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            k: Int, iterations: Int, path: String,
            payloadCols: Seq[String] = Nil): Unit = {
    val centroids = KMeans.train(emb, idCol, vecCol, k, iterations)
    val assigned = withPayload(
      Similarity.Ivf.assign(emb, centroids, idCol, vecCol),
      emb, idCol, payloadCols)
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    assigned.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/assignment")
    writeMeta(emb.sparkSession, path, idCol, vecCol)
    // a retrain is a fresh index: clear any tombstones from the
    // previous generation (they referred to the old assignment)
    val del = new org.apache.hadoop.fs.Path(s"$path/deletes")
    val f = del.getFileSystem(emb.sparkSession.sparkContext.hadoopConfiguration)
    if (f.exists(del)) f.delete(del, true)
  }

  /** Logical DELETE from a built index — merge-on-read tombstones,
    * the way production ANN serving retires vectors (FAISS remove_ids
    * marks; Vespa/Lucene tombstone): the ids are APPENDED to
    * `path/deletes` and every read through [[assignment]] (and so
    * every search variant) anti-joins them out. Cost ∝ the delete
    * batch — no bucket rewrite, no retrain; the anti-join's build
    * side is the (small) tombstone set, which AQE broadcasts. The
    * tombstones compact away at the next [[build]] (a retrain is a
    * fresh generation). Deleting an id not in the index is a no-op,
    * matching DELETE semantics.
    *
    * The tombstone column is NORMALIZED to the index's own id column
    * (read from the saved assignment schema) at delete time: the
    * caller's `idCol` names a column of `ids`, not a contract with the
    * index, and persisting it verbatim would poison every later read
    * when it differs (the anti-join would match on a column the
    * assignment lacks — failing, or worse, silently keyed wrong). A
    * delete against an index with no saved assignment fails here,
    * at the write, not at the first read. */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
             idCol: String): Unit = {
    val indexIdCol = indexIdColumn(spark, path)
    ids.select(col(idCol).as(indexIdCol)).distinct()
      .write.mode("append").parquet(s"$path/deletes")
  }

  /** The index's id column, from `path/meta.json` (written by
    * [[build]]). Pre-meta indexes (older generations on disk) fall
    * back to the original schema-positional inference — first
    * assignment field after dropping `bucket` — which is correct for
    * every layout [[build]]/[[append]] themselves produce, just not
    * robust to external column reordering; rebuilding refreshes the
    * metadata. */
  private def indexIdColumn(spark: SparkSession, path: String): String =
    readMeta(spark, path).map(_("id_col")).getOrElse {
      spark.read.parquet(s"$path/assignment")
        .drop("bucket").schema.fieldNames.head
    }

  /** Sidecar column-contract record. Hadoop-FS text (not a parquet
    * dataset): one tiny JSON object, readable without a Spark job,
    * atomic-enough via overwrite. */
  private def writeMeta(spark: SparkSession, path: String,
                        idCol: String, vecCol: String): Unit = {
    // The names are interpolated into JSON verbatim and parsed back by
    // a regex — a quote/backslash/control char would corrupt the
    // sidecar SILENTLY (readMeta would mis-parse and fall back to
    // positional inference without warning). Fail at build time
    // instead: such column names are pathological for an index id
    // anyway, and a loud contract beats a quiet wrong one.
    Seq("id" -> idCol, "vec" -> vecCol).foreach { case (role, c) =>
      require(!c.exists(ch => ch == '"' || ch == '\\' || ch < ' '),
        s"AnnIndex $role column name ${c} contains a quote, backslash " +
          "or control character — unrepresentable in meta.json")
    }
    val p = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      s"""{"id_col":"$idCol","vec_col":"$vecCol"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readMeta(spark: SparkSession,
                       path: String): Option[Map[String, String]] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      // the writer controls the shape: flat string-to-string object
      val kv = """"([a-z_]+)":"([^"]*)"""".r
      Some(kv.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2)).toMap)
    }
  }

  /** Carry metadata columns into the assignment rows so FILTERED
    * search (metadata predicate + vector search) pushes the predicate
    * into the index scan itself — the filter lands in the parquet
    * PushedFilters alongside the bucket partition pruning, so a
    * label-restricted query reads ~nprobe/k of the corpus and decodes
    * only matching row groups. The alternative (post-join the filter
    * table at query time) re-shuffles the corpus per query batch. */
  private def withPayload(assigned: DataFrame, emb: DataFrame,
                          idCol: String, payloadCols: Seq[String]): DataFrame =
    if (payloadCols.isEmpty) assigned
    else assigned.join(emb.select((idCol +: payloadCols).map(col): _*), idCol)

  /** [[search]] over the subset of the index matching `filter` —
    * filtered vector search. The predicate applies to assignment
    * rows (payload columns recorded at [[build]]/[[append]] time);
    * ranking and k are over the FILTERED candidate set, so a query
    * never "loses" slots to excluded neighbors. */
  def searchFiltered(spark: SparkSession, path: String, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int, nprobe: Int,
                     filter: org.apache.spark.sql.Column): DataFrame =
    Similarity.Ivf.search(assignment(spark, path).where(filter),
      centroids(spark, path), queries, idCol, vecCol, k, nprobe)

  /** Append a new vector batch to a built index WITHOUT retraining:
    * assign against the FROZEN saved centroids, append into the
    * bucket-partitioned assignment. This is the production index-
    * maintenance path — ingest lands daily embedding batches into an
    * index whose quantizer was trained once; cost ∝ the batch (one
    * broadcast-argmax scan + a partitioned append), never the corpus.
    * The trade is the standard IVF one: as the appended distribution
    * drifts from the training sample, bucket balance degrades —
    * retrain (build) when recall or bucket skew drifts past budget.
    * Searches over the grown index need no code change: the new files
    * land inside the same bucket=… directories the pruned probe scan
    * already reads. */
  def append(spark: SparkSession, path: String, fresh: DataFrame,
             idCol: String, vecCol: String,
             payloadCols: Seq[String] = Nil): Unit = {
    val assigned = withPayload(Similarity.Ivf.assign(
      fresh, centroids(spark, path), idCol, vecCol), fresh, idCol, payloadCols)
    assigned.write.mode("append").partitionBy("bucket")
      .parquet(s"$path/assignment")
  }

  /** Loaded centroid table of a built index. */
  def centroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/centroids")

  /** Loaded assignment table; `bucket` comes back as the partition
    * column, so bucket-selective reads prune directories. Tombstoned
    * ids (see [[delete]]) are anti-joined out, so every search
    * variant serves the post-delete view; when no delete was ever
    * issued the read is the bare scan (no join in the plan). */
  def assignment(spark: SparkSession, path: String): DataFrame = {
    val base = spark.read.parquet(s"$path/assignment")
    val del = new org.apache.hadoop.fs.Path(s"$path/deletes")
    val f = del.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(del)) base
    else {
      val tomb = spark.read.parquet(del.toString)
      base.join(tomb, tomb.columns.toSeq, "left_anti")
    }
  }

  /** Top-`k` neighbors per query row from the SAVED index — identical
    * results to `Similarity.Ivf.search` over a freshly built one. */
  def search(spark: SparkSession, path: String, queries: DataFrame,
             idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame =
    Similarity.Ivf.search(assignment(spark, path), centroids(spark, path),
      queries, idCol, vecCol, k, nprobe)
}
