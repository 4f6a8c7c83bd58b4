package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.text.TextAnalysis

/** Dev tool: attribute the lang+quality filter cost — scan width vs
  * regex CPU vs plan compilation. */
object ProfileWiden {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.tune(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang")
    println(s"[profile] scan partitions = ${docs.rdd.getNumPartitions}, " +
      s"widened = ${graft.core.Parallelism.widen(docs).rdd.getNumPartitions}")

    def filt(d: org.apache.spark.sql.DataFrame) = d
      .withColumn("__lang", TextAnalysis.langId(col("text")))
      .withColumn("__q", TextAnalysis.qualityScore(col("text")))
      .where(col("__lang").isin("en") && col("__q") >= 0.4)

    time("narrow filter count (run 1)") { filt(docs).count() }
    time("narrow filter count (run 2)") { filt(docs).count() }
    val wide = graft.core.Parallelism.widen(docs)
    time("wide filter count (run 1)") { filt(wide).count() }
    time("wide filter count (run 2)") { filt(wide).count() }
    time("scan-only count") { docs.count() }
    time("langId only") { docs.select(TextAnalysis.langId(col("text"))).count() }
    time("quality only") { docs.select(TextAnalysis.qualityScore(col("text"))).count() }
    spark.stop()
  }
}
