package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.MinHashLSH

/** Dev tool: stage-by-stage timing of dedup_clusters /
  * pipeline_training_data so the bench cost can be attributed
  * (pair generation vs label propagation vs persist overhead).
  *
  * Usage: runMain graft.tools.ProfileClusters [sfDir]
  */
object ProfileClusters {
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

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val pairs = time("minhash pairs (materialize)") {
      val p = MinHashLSH.nearDuplicatePairs(docs, "doc_id", "text", 3,
        numPerms = 64, bands = 16, threshold = 0.5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val labels = time("label propagation") {
      val l = graft.dedup.Clusters.connectedComponents(pairs.select("a", "b"))
      l.count(); l
    }
    time("orderBy + collect") { labels.orderBy("id").collect() }
    pairs.unpersist()
    spark.catalog.clearCache(); System.gc()

    // pipeline stages
    val conf = graft.etl.TrainingDataPipeline.Config(
      langs = Set("en"), minQuality = 0.4, shingleSize = 3, jaccardThreshold = 0.5)
    import graft.text.TextAnalysis
    val filtered = time("filter lang+quality") {
      val f = Tables.documents(spark, sfDir)
        .withColumn("__lang", TextAnalysis.langId(col("text")))
        .withColumn("__q", TextAnalysis.qualityScore(col("text")))
        .where(col("__lang").isin("en") && col("__q") >= 0.4)
        .drop("__lang", "__q")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      f.count(); f
    }
    val exact = time("exact dedup") {
      val e = graft.dedup.ExactDedup.dedupKeepFirst(filtered, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    val near = time("minhash pairs on exact") {
      val n = MinHashLSH.nearDuplicatePairs(exact, "doc_id", "text", 3,
        threshold = 0.5)
      n.count(); n
    }
    time("anti-join + stats") {
      graft.etl.TrainingDataPipeline.curateWithStats(
        Tables.documents(spark, sfDir), "doc_id", "text", "lang", conf)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
