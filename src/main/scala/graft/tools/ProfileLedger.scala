package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-profile of PrivacyLedger.register (dev tool, r16 optimization
  * round): times each phase of a mechanism-call registration — scratch
  * root creation, the createDataFrame encode, the VersionedTable
  * commit (staged parquet write + claim + footer stats + manifest) —
  * so the DP gates' register overhead is attributed to a phase instead
  * of guessed at. Run on an otherwise idle machine:
  *   SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.tools.ProfileLedger
  */
object ProfileLedger {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.tune(spark)
    spark.range(1000000).selectExpr("sum(id)").collect() // warm

    import graft.privacy.PrivacyLedger
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val rel = PrivacyLedger.Release("rel_prof", "customer", "laplace_count",
      0.5, 0.0, 1.0)
    (1 to 5).foreach { i =>
      println(s"--- round $i ---")
      val root = t("newScratchLedger")(PrivacyLedger.newScratchLedger())
      t("createDataFrame") {
        spark.createDataFrame(Seq(rel)).coalesce(1).queryExecution
          .executedPlan
      }
      t("register#1")(PrivacyLedger.register(spark, root, Seq(rel)))
      t("register#2")(PrivacyLedger.register(spark, root, Seq(rel, rel)))
      t("readLedger+count") {
        PrivacyLedger.readLedger(spark, root).count()
      }
      t("releaseScratch")(PrivacyLedger.releaseScratchLedger(root))
    }
    // raw 1-row parquet write via the same API VersionedTable uses,
    // to separate Spark-write fixed cost from manifest/claim overhead
    (1 to 3).foreach { i =>
      val dir = java.nio.file.Files.createTempDirectory("prof-raw-").toString
      t(s"raw 1-row parquet write $i") {
        spark.createDataFrame(Seq(rel)).coalesce(1)
          .write.mode("errorifexists").parquet(s"$dir/d")
      }
    }
    spark.stop()
  }
}
