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
    * default parallelism iff the input is statically tiny. Explicit
    * numPartitions so AQE does not coalesce it back down. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(target.toLong * CheapPerCoreBytes)) df.repartition(target)
    else df
  }
}
