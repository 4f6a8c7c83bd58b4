package graft.perf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout techniques for 100 TB joins (SURVEY.md §4 scale
  * review): bucketing for co-located shuffle-free joins, and
  * deterministic salting for skewed keys.
  */
object Layout {

  /** Register `df` as a bucketed+sorted catalog table. Both sides of a
    * recurring join bucketed the same way join WITHOUT an exchange —
    * at 100 TB the shuffle this removes IS the job cost. */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
                   numBuckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").option("path", path)
      .saveAsTable(table)

  /** Salted join for skewed keys: the fact side is split into
    * `saltBuckets` deterministic sub-keys (hash of a unique column —
    * NOT rand(), which breaks retry/replay determinism); the dim side
    * is replicated once per salt. Result set is exactly the plain
    * join's. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factUniqueCol: String, saltBuckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(hash(col(factUniqueCol)), lit(saltBuckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
