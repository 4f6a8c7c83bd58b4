package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for the Louvain gates (dev tool, r16
  * optimization round): times each building block — edge fixture
  * scan, degree agg, one sweep, contraction, modularity audit — so
  * the gate cost is attributed instead of guessed at.
  *   SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.tools.ProfileLouvain
  */
object ProfileLouvain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.tune(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.graph.Louvain
    // same fixture the gates read (built once, then timed reads)
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey")
    val p = graft.core.GraftSession.scratch("prof_edges")
    li.groupBy("l_orderkey").agg(collect_list("l_partkey").as("ps"))
      .select(explode(col("ps")).as("src"), col("ps"))
      .select(col("src"), explode(col("ps")).as("dst"))
      .where(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).cast("double").as("w"))
      .write.mode("overwrite").parquet(p)
    val edges = spark.read.parquet(p)
    println(s"[prof] edges rows = ${edges.count()}")

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      t("edges scan (noop)")(drain(edges))
      t("deg agg (noop)")(
        drain(edges.groupBy(col("src").as("node")).agg(sum("w").as("k"))))
      t("sweep (noop)")(drain(Louvain.sweep(edges)))
      val a1 = t("reap(sweep)")(graft.core.Caching.reap(Louvain.sweep(edges)))
      t("modularity(edges, a1) (noop)")(drain(Louvain.modularity(edges, a1)))
      val sup = t("reap(contract(edges, a1))")(
        graft.core.Caching.reap(Louvain.contract(edges, a1)))
      println(s"[prof] sup rows = ${sup.count()}")
      t("sweep(sup) (noop)")(drain(Louvain.sweep(sup)))
      t("contract(sup, sweep(sup)) (noop)")(
        drain(Louvain.contract(sup, Louvain.sweep(sup))))
      t("modularity(edges, a1) again")(drain(Louvain.modularity(edges, a1)))
      graft.core.Caching.release(a1)
      graft.core.Caching.release(sup)
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
