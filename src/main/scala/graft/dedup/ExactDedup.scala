package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Exact deduplication by canonical-text hash: groupBy(md5(normalized))
  * keeping the lowest id — one shuffle on the 128-bit key, the standard
  * first stage of any training-data pipeline. At 100 TB the md5 key
  * (not the text) is what shuffles when `keyOnly` is used. */
object ExactDedup {

  /** Annotate each row with its dedup key. */
  def withKey(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("dedup_key", TextAnalysis.fingerprintMd5(col(textCol)))

  /** Keep exactly one row (min id) per canonical text. Shuffles only
    * (key, id) before joining winners back — text bytes move once. */
  def dedupKeepFirst(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = withKey(docs, textCol)
    val winners = keyed.select(col("dedup_key"), col(idCol))
      .groupBy("dedup_key").agg(min(col(idCol)).as(idCol))
    keyed.join(winners, Seq("dedup_key", idCol), "left_semi").drop("dedup_key")
  }

  /** Cross-snapshot incremental dedup: keep only rows of `fresh` whose
    * canonical text never appeared in `seen` — the per-crawl pass that
    * admits a new snapshot against the accumulated corpus.
    *
    * Scale shape: a left_anti on the 16-byte md5 key, so the seen side
    * contributes key-width rows to the exchange, never text. When the
    * seen key set is stable across runs, persist it as a bucketed table
    * on dedup_key and the anti-join becomes shuffle-free on the seen
    * side; a Bloom filter over seen keys pushed into the fresh scan
    * (Spark's runtime-filter/DPP machinery or an explicit
    * `might_contain`) cuts the fresh side before the exchange too. */
  def dedupAgainst(fresh: DataFrame, seen: DataFrame, textCol: String): DataFrame =
    withKey(fresh, textCol)
      .join(withKey(seen, textCol).select("dedup_key"), Seq("dedup_key"), "left_anti")
      .drop("dedup_key")
}
