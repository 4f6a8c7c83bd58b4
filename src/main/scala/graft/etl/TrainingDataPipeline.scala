package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis
import graft.dedup.{ExactDedup, MinHashLSH}

/** End-to-end training-data curation pipeline — the composition a
  * 100 TB pretraining corpus actually runs, built from the verified
  * operators:
  *
  *   1. language filter (stopword-profile langId)
  *   2. quality filter  (score threshold)
  *   3. exact dedup     (canonical-md5 keep-first)
  *   4. near-dup removal (MinHash+LSH pairs; drop the higher id of
  *      each verified pair — survivors = docs that are no pair's `b`)
  *   5. per-source stats
  *
  * Scale shape: steps 1-2 are scan-bandwidth column predicates pushed
  * at the source; step 3 shuffles (key, id) once; step 4 touches only
  * LSH candidates; nothing is ever O(n²).
  */
object TrainingDataPipeline {

  final case class Config(
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.0,
      shingleSize: Int = 3,
      jaccardThreshold: Double = 0.5)

  /** Docs surviving every stage. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             conf: Config): DataFrame = {
    // persist: the regex-scored filter feeds both sides of the exact
    // dedup's semi-join; without it the 7 regexp passes run twice.
    // widen: the regex passes are CPU-bound — a narrow scan would
    // serialize them on one core (core/Parallelism.scala)
    val filtered = graft.core.Parallelism.widen(docs)
      .withColumn("__lang", TextAnalysis.langId(col(textCol)))
      .withColumn("__q", TextAnalysis.qualityScore(col(textCol)))
      .where(col("__lang").isin(conf.langs.toSeq: _*) &&
        col("__q") >= conf.minQuality)
      .drop("__lang", "__q")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact feeds three consumers (shingling, the near-pair verify,
    // and the final anti-join): persist once, don't recompute the
    // filter+dedup chain per consumer
    val exact = ExactDedup.dedupKeepFirst(filtered, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nearPairs = MinHashLSH.nearDuplicatePairs(exact, idCol, textCol,
      conf.shingleSize, threshold = conf.jaccardThreshold)
    // drop the higher id of each near-dup pair (survivor policy: a doc
    // survives unless it is the `b` of some verified pair)
    val losers = nearPairs.select(col("b").as(idCol)).distinct()
    exact.join(losers, Seq(idCol), "left_anti")
  }

  /** Curate + per-source corpus statistics. */
  def curateWithStats(docs: DataFrame, idCol: String, textCol: String,
                      sourceCol: String, conf: Config): DataFrame =
    curate(docs, idCol, textCol, conf)
      .withColumn("__tok", TextAnalysis.tokenCountWs(col(textCol)))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("total_tokens"),
        min(col(idCol)).as("min_id"))
      .orderBy(col(sourceCol))
}
