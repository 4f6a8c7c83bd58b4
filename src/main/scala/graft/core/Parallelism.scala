package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-width policy for CPU-bound map stages.
  *
  * Spark sizes scan tasks by BYTES (`files.maxPartitionBytes`, tuned to
  * 512 MB for 100 TB inputs) — correct when cost ∝ bytes, wrong for
  * CPU-heavy per-row work (regex scoring, shingling, minhash) over a
  * SMALL input: a 2 MB single-row-group parquet file arrives as ONE
  * task and the whole map stage serializes on one core no matter how
  * many sit idle. Profiled at sf0.1: the training pipeline's
  * lang+quality regex filter ran 3.3 s on one task vs ~0.5 s widened.
  *
  * `widen` repartitions ONLY when the optimizer's size estimate says
  * the whole input is cheap (< one open-cost-sized chunk per core) —
  * at production scale the condition is false and no shuffle is ever
  * added. The shuffle it does add on the small side moves the full
  * (tiny) input once, strictly cheaper than leaving cores idle through
  * an expensive map.
  *
  * The signal is `optimizedPlan.stats.sizeInBytes` — a static,
  * driver-side estimate. r2 ADVICE flagged the previous
  * `df.rdd.getNumPartitions` probe: it forced a full physical-planning
  * pass AND instantiated the RDD DAG on every call site, purely to
  * read a pre-AQE partition count.
  */
object Parallelism {

  /** Per-core input volume below which a repartition is worth it:
    * Spark's own `files.openCostInBytes` default — the size it already
    * treats as "cheap enough to schedule as filler". */
  private val CheapPerCoreBytes = 4L << 20

  /** Repartition a CPU-heavy operator's input up to the session's
    * default parallelism iff either static signal says cores would
    * otherwise idle. Explicit numPartitions so AQE does not coalesce
    * it back down.
    *
    * Two signals, OR-combined (r3 ADVICE: bytes alone misses a LARGE
    * single-partition input — one big non-splittable file, or a source
    * whose stats default to a huge estimate — which is exactly the
    * idle-cores case the helper was built for):
    *   1. optimizer size estimate is tiny (< one open-cost chunk/core)
    *      — moving the whole input once is cheap, so always widen;
    *   2. the input is a LEAF scan whose file-listing partition count
    *      is far below parallelism — known cheaply from the scan's
    *      partition plan, without instantiating the full RDD DAG (the
    *      r2-flagged `df.rdd.getNumPartitions` probe). Derived plans
    *      (post-shuffle) skip this probe: their width is already the
    *      session's shuffle parallelism.
    * Sources with neither signal (unknown stats, non-file leaf) are
    * left alone — a wrong repartition at 100 TB costs a full-input
    * shuffle, so unknown means no. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val tiny = bytes < BigInt(target.toLong * CheapPerCoreBytes)
    lazy val narrowScan = scanPartitionCount(df).exists(_ < target / 2)
    if (tiny || narrowScan) df.repartition(target) else df
  }

  /** Partition count of the plan's file scan, when the plan is a pure
    * scan+narrow chain over ONE file relation (the shape widen's call
    * sites feed it). Reads the driver-side `FileScanRDD` partition
    * listing only — no job, no shuffle-stage planning. None when the
    * plan has a shuffle/join (width no longer set by the scan) or a
    * non-file source (unknown → caller must not widen on this signal). */
  private def scanPartitionCount(df: DataFrame): Option[Int] = {
    import org.apache.spark.sql.execution.datasources.{FileScanRDD, HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val plan = df.queryExecution.optimizedPlan
    val leaves = plan.collectLeaves()
    val fileLeaf = leaves.size == 1 && (leaves.head match {
      case lr: LogicalRelation => lr.relation.isInstanceOf[HadoopFsRelation]
      case _: DataSourceV2ScanRelation => true
      case _ => false
    })
    val hasWideOp = plan.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Join => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
      case _: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation => true
      case _ => false
    }
    if (!fileLeaf || hasWideOp) None
    else df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.inputRDD match {
          case f: FileScanRDD => f.filePartitions.size
          case r => r.getNumPartitions
        }
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.size
    }
  }
}
