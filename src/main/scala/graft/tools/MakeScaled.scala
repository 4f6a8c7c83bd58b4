package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: build an id-consistent N× replica of a testdata SF dir
  * for scaling measurements (no sf1.0 testdata ships with the
  * container; the driver generates sf ≤ 0.1).
  *
  * Copy k shifts every entity key by k·(max+1) so FK joins stay 1:1 —
  * cardinalities scale linearly while join fan-out and selectivities
  * stay fixed, which is what a scaling exponent should measure.
  * Documents get a per-copy text tag and embeddings a per-copy
  * circular roll, so the replica plants NO cross-copy exact or near
  * duplicates (those would make dedup timing quadratic in the copy
  * count rather than measuring the operator). Dims (region, nation)
  * are shared across copies, as at any real SF.
  *
  * Usage: runMain graft.tools.MakeScaled <srcSfDir> <outDir> <copies>
  */
object MakeScaled {

  def main(args: Array[String]): Unit = {
    val (src, out, copies) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.build("make-scaled", s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")
    build(spark, src, out, copies)
    spark.stop()
  }

  def build(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    def t(n: String) = spark.read.parquet(s"$src/$n.parquet")
    def base(df: DataFrame, c: String): Long = df.agg(max(col(c))).head().getLong(0) + 1

    val bOrder = base(t("orders"), "o_orderkey")
    val bCust = base(t("customer"), "c_custkey")
    val bPart = base(t("part"), "p_partkey")
    val bSupp = base(t("supplier"), "s_suppkey")
    val bDoc = base(t("documents"), "doc_id")
    val bVec = base(t("embeddings"), "vec_id")
    val bEvt = base(t("events"), "event_id")
    val bUser = base(t("events"), "user_id")

    def write(name: String)(f: (DataFrame, Int) => DataFrame): Unit =
      (0 until copies).map(k => f(t(name), k)).reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$out/$name.parquet")

    Seq("region", "nation").foreach { n =>
      t(n).write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    write("customer") { (d, k) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(k * bCust))
    }
    write("supplier") { (d, k) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(k * bSupp))
    }
    write("part") { (d, k) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(k * bPart))
    }
    write("orders") { (d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(k * bOrder))
        .withColumn("o_custkey", col("o_custkey") + lit(k * bCust))
    }
    write("lineitem") { (d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(k * bOrder))
        .withColumn("l_partkey", col("l_partkey") + lit(k * bPart))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * bSupp))
    }
    // ts stays: per-copy users keep their own sessions (user_id shifts)
    write("events") { (d, k) =>
      d.withColumn("event_id", col("event_id") + lit(k * bEvt))
        .withColumn("user_id", col("user_id") + lit(k * bUser))
    }
    // per-copy tag on EVERY token: a doc-level prefix leaves the other
    // ~97% of word n-grams identical across copies, i.e. plants
    // jaccard≈0.94 near-dups and makes dedup timing quadratic in the
    // copy count; per-token tags give disjoint shingle sets
    write("documents") { (d, k) =>
      val txt =
        if (k == 0) col("text")
        else array_join(transform(split(col("text"), "\\s+"),
          w => concat(w, lit(s"_$k"))), " ")
      d.withColumn("doc_id", col("doc_id") + lit(k * bDoc))
        .withColumn("text", txt)
    }
    // circular roll by k => distinct directions per copy (norms kept)
    write("embeddings") { (d, k) =>
      val rolled =
        if (k == 0) col("embedding")
        else concat(
          slice(col("embedding"), lit(k + 1), size(col("embedding")) - k),
          slice(col("embedding"), lit(1), lit(k)))
      d.withColumn("vec_id", col("vec_id") + lit(k * bVec))
        .withColumn("embedding", rolled)
    }
  }
}
