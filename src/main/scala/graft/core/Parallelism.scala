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
  * `widen` repartitions ONLY when the plan has fewer partitions than
  * the session's parallelism — at production scale (splits ≫ cores) the
  * condition is false and no shuffle is ever added. The shuffle it does
  * add on the small side moves the full (tiny) input once, strictly
  * cheaper than leaving cores idle through an expensive map.
  */
object Parallelism {

  /** Repartition a CPU-heavy operator's input up to the session's
    * default parallelism iff the current plan is narrower than that.
    * Explicit numPartitions so AQE does not coalesce it back down. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
