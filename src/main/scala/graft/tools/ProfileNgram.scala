package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.dedup.Shingles

/** Dev tool: stage timing of dedup_ngram_jaccard (shingle prep, df
  * ranking + prefix join, verify) at a given SF dir. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf0.1x10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ds = Shingles.docShingles(
      graft.core.Tables.documents(spark, sfDir).select("doc_id", "text"),
      "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingle prep (materialize)") { println("  docs=" + ds.count()) }
    val cands = Shingles.prefixFilterCandidatesByDf(ds, "doc_id", 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("df-ranked prefix candidates") { println("  cands=" + cands.count()) }
    time("verify (string arrays)") {
      println("  pairs=" + Shingles.verifyPairs(cands, ds, "doc_id", 0.5).count())
    }
    time("verify (hashed arrays)") {
      println("  pairs=" + Shingles.verifyPairsHashed(
        cands, Shingles.docShingleHashes(ds, "doc_id"), "doc_id", 0.5).count())
    }
    spark.stop()
  }
}
