package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
    * Vocab bound (CCNet practice): tokens below `minCount` pool into a
    * single OOV bucket whose count is their combined mass, so an OOV
    * token scores ln(Σ cnt_rare) — rare-token mass is priced, never
    * dropped. The broadcast side is the FLOORED vocab, ≤ N/minCount
    * entries by construction: raw whitespace types over web text (URLs,
    * typos, code) reach billions of distinct values, and broadcasting
    * them unfloored OOMs the executors; the floor is the knob that
    * keeps the broadcast ∝ corpus/minCount. For corpora where even
    * that exceeds broadcast limits, raise `minCount` — the score
    * degrades gracefully as more of the tail pools into OOV.
    *
    * Scale shape: the token explode feeds one partial-aggregable count;
    * the floored vocab broadcasts back onto the token stream, so raw
    * text never shuffles and no sort appears anywhere. Rounded to 6
    * digits: the per-doc sum of ~10² ln-terms carries ≲1e-12 of
    * order-dependent error, far inside the rounding slack. */
  def lmLogProb(docs: DataFrame, idCol: String, textCol: String,
                minCount: Int = 2): DataFrame = {
    val toks = docTokens(docs, idCol, textCol)
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val kept = vocab.where(col("cnt") >= minCount)
    // OOV bucket: combined count of all floored-out tokens (0 only when
    // no token is rare, in which case it is never referenced)
    val oov = vocab.where(col("cnt") < minCount)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("oov_cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    toks.join(broadcast(kept), Seq("token"), "left_outer")
      .crossJoin(broadcast(oov))
      .select(col(idCol), coalesce(col("cnt"), col("oov_cnt")).as("cnt"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"), sum(log(col("cnt"))).as("sl"))
      .crossJoin(broadcast(total))
      .select(col(idCol),
        graft.functions.ScoreFns.scoreRound(
          col("sl") / col("n_tok") - log(col("total")), 6).as("lm_logprob"))
  }

  /** Bigram-LM quality score: per-doc mean ln P(wᵢ | wᵢ₋₁) under the
    * corpus's own add-1-smoothed bigram model, P(b|a) =
    * (c(a,b) + 1) / (c(a) + V) — the next strength up from
    * [[lmLogProb]]'s unigram model: it prices word ORDER, so shuffled
    * or boilerplate-stitched text scores low even when its unigram
    * distribution is natural. Docs with fewer than two tokens carry
    * no bigram and are excluded.
    *
    * Scale shape: bigrams expand map-side from each doc's token array
    * (the Collocations idiom — never a positional self-join), are
    * counted per (doc, a, b) FIRST so the model join moves per-doc
    * DISTINCT bigrams rather than every occurrence, then meet the
    * corpus bigram counts in one keyed join; unigram counts broadcast
    * (vocabulary-sized), V and the per-doc mean are
    * partial-aggregable. Rounded to 6 digits (same slack argument as
    * [[lmLogProb]]). */
  def bigramLogProb(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      expr(s"filter(split(trim(lower($textCol)), '\\\\s+')," +
        " x -> x != '')").as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val v = uni.agg(count(lit(1)).as("v"))
    val biPerDoc = toks.where(size(col("t")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"))
        .as("p"))
      .select(col(idCol), col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col(idCol), col("a"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val bc = biPerDoc.groupBy("a", "b").agg(sum("cnt").as("cab"))
    biPerDoc.join(bc, Seq("a", "b"))
      .join(broadcast(uni.select(col("w").as("a"), col("cw").as("ca"))), "a")
      .crossJoin(broadcast(v))
      .groupBy(col(idCol))
      .agg(graft.functions.ScoreFns.scoreRound(
        sum(col("cnt") * log((col("cab") + 1.0) /
          (col("ca") + col("v")))) / sum(col("cnt")), 6)
        .as("bigram_logprob"))
  }

  /** Interpolated Kneser–Ney bigram log-probability per document
    * (Kneser & Ney 1995; the interpolated form of Chen & Goodman 1999
    * §2.7): P(b|a) = (c(ab)−D)/c(a·) + D·N₁₊(a·)/c(a·) · N₁₊(·b)/B,
    * where c(a·) is a's count as a bigram CONTEXT (so probabilities
    * sum to 1 exactly), N₁₊(a·)/N₁₊(·b) are the forward/backward
    * continuation type counts, and B is the number of distinct bigram
    * types. The continuation distribution prices how PROMISCUOUSLY a
    * word follows new contexts — the property that makes KN the
    * strongest classical n-gram smoother, vs the add-V baseline in
    * [[bigramLogProb]]. Scoring is in-corpus, so c(ab) ≥ 1 > D and the
    * max(·,0) clamp never engages. All statistics are vocabulary-sized
    * keyed aggregations; the per-(a)/(b) tables ride broadcast. */
  def kneserNeyLogProb(docs: DataFrame, idCol: String, textCol: String,
                       d: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol),
      expr(s"filter(split(trim(lower($textCol)), '\\\\s+')," +
        " x -> x != '')").as("t"))
    val biPerDoc = toks.where(size(col("t")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"))
        .as("p"))
      .select(col(idCol), col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col(idCol), col("a"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val bc = biPerDoc.groupBy("a", "b").agg(sum("cnt").as("cab"))
    val ctx = bc.groupBy("a").agg(sum("cab").as("ctxa"),
      count(lit(1)).as("n1f"))
    val cont = bc.groupBy("b").agg(count(lit(1)).as("n1b"))
    val btypes = bc.agg(count(lit(1)).as("bb"))
    biPerDoc.join(bc, Seq("a", "b"))
      .join(broadcast(ctx), "a")
      .join(broadcast(cont), "b")
      .crossJoin(broadcast(btypes))
      .groupBy(col(idCol))
      .agg(graft.functions.ScoreFns.scoreRound(
        sum(col("cnt") * log(
          (col("cab") - d) / col("ctxa")
            + ((lit(d) * col("n1f")) / col("ctxa"))
            * (col("n1b").cast("double") / col("bb"))))
          / sum(col("cnt")), 6)
        .as("kn_logprob"))
  }

  /** Top-`perDoc` terms per document by tf·idf with natural-log idf
    * over the FULL corpus (`nDocs` passed in so callers control the
    * count pass); `docFilter` restricts which docs are scored without
    * narrowing the df statistics.
    *
    * Ranked through the O(k)-heap BoundedTopK aggregate like every
    * other top-k path in the repo — a window row_number sorts every
    * scored (doc, token) row after the shuffle, the heap combines
    * map-side and ships perDoc structs per doc. Ties resolve token
    * DESC (the struct ordering's natural direction; (doc, token) is
    * unique so ordering is total and engine-reproducible). */
  def tfIdfTop(docs: DataFrame, idCol: String, textCol: String,
               nDocs: Long, perDoc: Int,
               docFilter: org.apache.spark.sql.Column): DataFrame = {
    val toks = docTokens(docs, idCol, textCol)
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("cnt"), first(col("n_toks")).as("n_toks"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.where(docFilter)
      .join(df, "token")
      .withColumn("score", graft.functions.ScoreFns.scoreRound(
        (col("cnt").cast("double") / col("n_toks")) *
          log(lit(nDocs).cast("double") / col("df")), 6))
    scored.groupBy(col(idCol))
      .agg(graft.plans.BoundedTopK(
        struct(col("score"), col("token")), perDoc).as("top"))
      .select(col(idCol), posexplode(col("top")).as(Seq("i", "e")))
      .select(col(idCol), (col("i") + 1).as("rank"),
        col("e.token").as("token"), col("e.score").as("score"))
  }
}
