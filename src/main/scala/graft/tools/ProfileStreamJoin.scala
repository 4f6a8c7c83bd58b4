package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.GraftSession

/** Dev tool: t7_stream_join / t3_stream_dedup wall time as a function
  * of the state-partition count (`spark.sql.shuffle.partitions` at
  * stream start fixes the number of state-store instances for the
  * query's lifetime). Hypothesis: at gate scale (~100k events) the
  * per-micro-batch per-partition state checkpoint overhead dominates,
  * so fewer state partitions ≫ faster, while the actual join work is
  * negligible either way.
  */
object ProfileStreamJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    Seq("32", "8", "2").foreach { n =>
      spark.conf.set("spark.sql.shuffle.partitions", n)
      time(s"t7_stream_join  state-partitions=$n") {
        graft.queries.StreamQueries.t7StreamJoin(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"t3_stream_dedup state-partitions=$n") {
        graft.queries.StreamQueries.t3StreamDedup(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
