package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dev tool: stage-by-stage timing of graph_pagerank so the bench
  * cost can be attributed (edge build vs per-iteration join+agg vs
  * checkpoint overhead).
  *
  * Usage: runMain graft.tools.ProfilePageRank [sfDir]
  */
object ProfilePageRank {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.tune(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
    val edges = time("edge build (materialize)") {
      val e = li.groupBy("l_orderkey")
        .agg(collect_list("l_partkey").as("ps"))
        .select(explode(col("ps")).as("src"), col("ps"))
        .select(col("src"), explode(col("ps")).as("dst"))
        .where(col("src") =!= col("dst"))
        .groupBy("src", "dst")
        .agg(count(lit(1)).cast("double").as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[profile] edges = ${e.count()}")
      e
    }
    val outw = time("out-weights") {
      val o = edges.groupBy("src").agg(sum("w").as("tw"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      o.count(); o
    }
    val trans = time("transition matrix") {
      val t = edges.join(outw, "src")
        .select(col("src"), col("dst"), (col("w") / col("tw")).as("p"))
        .repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t.count(); t
    }
    val nodes = time("nodes") {
      val n = edges.select(col("src").as("node")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[profile] nodes = ${n.count()}")
      n
    }
    var ranks = nodes.select(col("node"), lit(1.0).as("rank"))
    for (i <- 1 to 5) {
      ranks = time(s"iteration $i (join+agg+ckpt)") {
        val contrib = trans.join(ranks, trans("src") === ranks("node"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("rank") * col("p")).as("inflow"))
        val next = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(0.15) + lit(0.85) * coalesce(col("inflow"), lit(0.0)))
              .as("rank"))
        graft.core.Caching.reap(next)
      }
    }
    time("final collect") { ranks.count() }
    spark.stop()
  }
}
