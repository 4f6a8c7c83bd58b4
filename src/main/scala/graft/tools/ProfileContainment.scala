package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.dedup.Shingles

/** Dev profiler for the exact-containment stages: posting/prefix/
  * candidate/output cardinalities and per-stage wall time at a given
  * SF dir (SPARK_GRAFT_SF_DIR). Mirrors Containment.pairsExact stage
  * for stage so a fan-out regression is attributable. */
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.build("profile-containment")
    val t = 0.5
    val lev = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[containment] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val ds = Shingles.docShingles(
      docs.select(col("doc_id"), lower(col("text")).as("text")),
      "doc_id", "text", 3).persist(lev)
    println(s"[containment] docs=${timed("shingle docs")(ds.count())}")
    val ex = ds.select(col("doc_id"), size(col("shingles")).as("n"),
      explode(col("shingles")).as("s"))
      .select(col("doc_id"), col("n"), xxhash64(col("s")).as("h"))
    val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
    val ranked = ex.join(dfreq, "h")
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("h"))))
      .select(col("doc_id"), col("n"), col("h"), col("r"))
      .persist(lev)
    println(s"[containment] postings=${timed("rank postings")(ranked.count())}")
    val pref = ranked.where(col("r") <= col("n") - ceil(col("n") * t) + 1)
    println(s"[containment] prefix=${timed("prefix rows")(pref.count())}")
    val cand = pref
      .select(col("h"), col("doc_id").as("x"), col("n").as("nx"), col("r").as("rx"))
      .join(ranked.select(col("h"), col("doc_id").as("y"),
        col("n").as("ny"), col("r").as("ry")), Seq("h"))
      .where(col("x") =!= col("y"))
      .where(col("nx") <= col("ny"))
      .where(lit(1) + least(col("nx") - col("rx"), col("ny") - col("ry")) >=
        ceil(col("nx") * t))
    println(s"[containment] cand_rows=${timed("candidate rows")(cand.count())}")
    val pairs = cand.select(least(col("x"), col("y")).as("a"),
      greatest(col("x"), col("y")).as("b")).distinct().persist(lev)
    println(s"[containment] cand_pairs=${timed("distinct pairs")(pairs.count())}")
    val hs = Shingles.docShingleHashes(ds, "doc_id")
    val out = pairs
      .join(hs.select(col("doc_id").as("a"), col("n").as("na"),
        col("hs").as("hs_a")), "a")
      .join(hs.select(col("doc_id").as("b"), col("n").as("nb"),
        col("hs").as("hs_b")), "b")
      .withColumn("common",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("double"))
      .select(col("a"), col("b"),
        round(col("common") / col("na"), 4).as("c_ab"),
        round(col("common") / col("nb"), 4).as("c_ba"))
      .where(col("c_ab") >= t || col("c_ba") >= t)
    println(s"[containment] out=${timed("verify")(out.count())}")
    spark.stop()
  }
}
