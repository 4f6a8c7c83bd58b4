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
    graft.core.Parallelism.widen(docs)
      .select(col(idCol), Shingles.tokens(lower(col(textCol))).as("__toks"))
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

  /** Per-document mean unigram log-probability under the corpus's own
    * empirical language model — the perplexity-proxy quality signal
    * (CCNet-style): score(d) = mean_t ln(cnt(t)/N) = sum ln cnt / n_tok
    * − ln N. Outlier-low docs are gibberish, outlier-high are
    * degenerate repetition.
    *
    * Scale shape: the token explode feeds one partial-aggregable count;
    * the vocab (tokens × 16 bytes, millions of rows at 100 TB — not
    * billions) broadcasts back onto the token stream, so raw text never
    * shuffles and no sort appears anywhere. Rounded to 6 digits: the
    * per-doc sum of ~10²  ln-terms carries ≲1e-12 of order-dependent
    * error, far inside the rounding slack. */
  def lmLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docTokens(docs, idCol, textCol)
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    toks.join(broadcast(vocab), "token")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"), sum(log(col("cnt"))).as("sl"))
      .crossJoin(broadcast(total))
      .select(col(idCol),
        round(col("sl") / col("n_tok") - log(col("total")), 6).as("lm_logprob"))
  }

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
