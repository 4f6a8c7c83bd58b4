package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.{GraftSession, Tables}
import graft.dedup.{MinHashLSH, Shingles}

/** Dev tool: stage-level timing of the minhash pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val ds = Shingles.docShingles(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingles materialize")(ds.count())
    time("signatures declarative x3") {
      (1 to 3).map(_ => MinHashLSH.signatures(ds, "doc_id", 64)
        .write.format("noop").mode("overwrite").save())
    }
    time("signatures native x3") {
      (1 to 3).map(_ => MinHashLSH.signaturesNative(ds, "doc_id", 64)
        .write.format("noop").mode("overwrite").save())
    }
    val sigs = MinHashLSH.signatures(ds, "doc_id", 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("signatures")(sigs.count())
    val cands = MinHashLSH.candidatePairs(sigs, "doc_id", 16, 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("candidates")(cands.count())
    time("verify")(Shingles.verifyPairs(cands, ds, "doc_id", 0.5).count())
    spark.stop()
  }
}
