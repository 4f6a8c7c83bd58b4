package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.dedup.Shingles

/** Vocabulary + TF-IDF over a document corpus — the term-statistics
  * pass of a training-data pipeline (vocabulary pruning, keyword
  * extraction, quality signals).
  *
  * Scale shape: one explode of lowercased whitespace tokens feeds both
  * term-frequency (per-doc counts) and document-frequency (per-token
  * counts); every aggregation is partial-aggregable, so the exchanges
  * carry (token, partial-count) pairs, never raw text. Corpus-wide
  * top-k is orderBy+limit — Spark plans TakeOrderedAndProject (per-
  * partition heaps + driver merge), not a global sort.
  */
object Vocab {

  /** (id, n_toks, token) exploded view; tokens lowercased, one row per
    * occurrence. */
  def docTokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), Shingles.tokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("n_toks"),
        explode(col("__toks")).as("token"))

  /** Top-k vocabulary by document frequency (ties → token asc). */
  def topByDocFreq(docs: DataFrame, idCol: String, textCol: String,
                   k: Int): DataFrame =
    docTokens(docs, idCol, textCol)
      .select(col(idCol), col("token")).distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token").asc)
      .limit(k)

  /** Top-`perDoc` terms per document by tf·idf with natural-log idf
    * over the FULL corpus (`nDocs` passed in so callers control the
    * count pass); `docFilter` restricts which docs are scored without
    * narrowing the df statistics. */
  def tfIdfTop(docs: DataFrame, idCol: String, textCol: String,
               nDocs: Long, perDoc: Int,
               docFilter: org.apache.spark.sql.Column): DataFrame = {
    val toks = docTokens(docs, idCol, textCol)
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("cnt"), first(col("n_toks")).as("n_toks"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.where(docFilter)
      .join(df, "token")
      .withColumn("score", round(
        (col("cnt").cast("double") / col("n_toks")) *
          log(lit(nDocs).cast("double") / col("df")), 6))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= perDoc)
      .select(col(idCol), col("rank"), col("token"), col("score"))
  }
}
