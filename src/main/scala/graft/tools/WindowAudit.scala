package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Window, WindowGroupLimit}

/** Dev audit (judge r10 item 4): enumerate every registry gate whose
  * FINAL plan contains an unpartitioned Window — the plans that emit
  * `WindowExec: No Partition Defined` at run time because every row
  * must move to one task. Each hit must be bounded-by-construction
  * (a bin table, a rerank list, a daily frame — never the data);
  * WindowPartitionSpec pins the resulting whitelist so a future
  * data-sized unpartitioned window fails a test instead of hiding in
  * the bench warning noise.
  *
  * Usage: tools/run_main.sh graft.tools.WindowAudit [sfDir]
  */
object WindowAudit {
  /** Gates whose optimized plan holds ≥1 unpartitioned Window. */
  def offenders(spark: SparkSession, sfDir: String): Seq[(String, Int)] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = try {
        fn(spark, sfDir).queryExecution.optimizedPlan.collect {
          case w: Window if w.partitionSpec.isEmpty => 1
          case w: WindowGroupLimit if w.partitionSpec.isEmpty => 1
        }.sum
      } catch { case e: Throwable =>
        System.err.println(s"[windowaudit] $name failed: ${e.getMessage}"); 0
      } finally spark.catalog.clearCache()
      if (n > 0) Some(name -> n) else None
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.tune(spark)
    offenders(spark, sfDir).foreach { case (name, n) =>
      println(s"$name: $n unpartitioned window(s)")
    }
    spark.stop()
  }
}
