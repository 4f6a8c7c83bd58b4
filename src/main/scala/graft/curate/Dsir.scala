package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-lite data selection (Xie et al., "Data Selection for Language
  * Models via Importance Resampling", arXiv:2302.03169): score every
  * raw document by how target-domain-like its hashed n-gram feature
  * distribution is — log p_target(features) − log p_raw(features)
  * under add-one-smoothed bucket unigram models — and keep the top
  * scorers. The standard cheap alternative to training a domain
  * classifier when curating toward a target corpus.
  *
  * Portability: features are md5-hashed token bigrams into B buckets
  * (the same md5 idiom every graft sketch uses), so an external engine
  * replays the exact arithmetic; smoothed probabilities are ratios of
  * integers (exact in doubles), leaving ln() as the only
  * implementation-defined step.
  *
  * Scale shape: both feature distributions are B-row aggregates
  * (map-side combined — the exchange carries (bucket, count), never
  * text); the log-ratio table is B rows and broadcast-joins into the
  * per-doc scoring aggregate; selection is a top-k. The corpus text is
  * read once and never shuffled.
  */
object Dsir {

  val Buckets = 1024

  /** md5-hashed feature bucket of a bigram string (portable). */
  def bucket(bigram: Column): Column =
    (conv(substring(md5(bigram), 1, 15), 16, 10).cast("long") % Buckets)
      .cast("int")

  private def docBuckets(df: DataFrame, idCol: String, textCol: String,
                         extraCols: Seq[String]): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    df.select((idCol +: extraCols).map(col) :+ toks.as("__t"): _*)
      .where(size(col("__t")) >= 2)
      .select((idCol +: extraCols).map(col) :+
        explode(transform(sequence(lit(1), size(col("__t")) - 1),
          i => concat(element_at(col("__t"), i), lit(" "),
            element_at(col("__t"), i + 1)))).as("__bg"): _*)
      .select((idCol +: extraCols).map(col) :+ bucket(col("__bg")).as("__b"): _*)
  }

  /** (doc_id, score): per-document importance log-ratio, rounded to
    * `scale` decimals. `isTarget` marks the target-domain rows INSIDE
    * `df` (held-out benchmark text, a trusted source, a language...).
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            isTarget: Column, scale: Int = 4): DataFrame = {
    val b = docBuckets(df.withColumn("__tgt", isTarget), idCol, textCol,
      Seq("__tgt"))
    val raw = b.groupBy("__b").agg(count(lit(1)).as("raw_c"))
    val tgt = b.where(col("__tgt")).groupBy("__b")
      .agg(count(lit(1)).as("tgt_c"))
    val totals = b.agg(count(lit(1)).as("n_raw"),
      sum(col("__tgt").cast("long")).as("n_tgt")).head()
    val (nRaw, nTgt) = (totals.getLong(0), totals.getLong(1))
    require(nTgt > 0, "dsir: empty target domain")
    // smoothed bucket models; integers → exact doubles, ln the only
    // engine-defined step
    val ratio = raw.join(tgt, Seq("__b"), "left_outer")
      .select(col("__b"),
        (log((coalesce(col("tgt_c"), lit(0L)) + 1.0) /
             (nTgt + Buckets.toDouble)) -
         log((col("raw_c") + 1.0) / (nRaw + Buckets.toDouble))).as("__lr"))
    b.join(broadcast(ratio), Seq("__b"))
      .groupBy(idCol)
      .agg(graft.functions.ScoreFns.scoreRound(sum("__lr"), scale).as("score"))
  }

  /** Top-`k` most target-like documents (score desc, id tiebreak). */
  def select(df: DataFrame, idCol: String, textCol: String,
             isTarget: Column, k: Int): DataFrame =
    score(df, idCol, textCol, isTarget)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Deterministic standard-Gumbel noise per id: u from the id's md5
    * (60 bits → (0,1), the hashSplit idiom), g = −ln(−ln(u)). The
    * md5→integer→double→ln chain replays exactly in any engine. */
  def gumbel(id: Column): Column = {
    val v = conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("double")
    -log(-log((v + 0.5) / 1152921504606846976.0d)) // 2^60
  }

  /** Importance RESAMPLING (the paper's actual selection rule): top-k
    * by score/T + Gumbel — equivalent to sampling without replacement
    * with probability ∝ exp(score/T) (the Gumbel-top-k trick), which
    * avoids top-k's mode collapse onto one narrow slice of the target
    * domain. `temperature` trades fidelity (low T → toward plain
    * top-k) against diversity. Deterministic: the noise is a pure
    * function of the id, so the same corpus selects the same sample
    * on any cluster size, engine, or rerun. */
  def resample(df: DataFrame, idCol: String, textCol: String,
               isTarget: Column, k: Int,
               temperature: Double = 1.0): DataFrame = {
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    score(df, idCol, textCol, isTarget)
      .withColumn("noisy", graft.functions.ScoreFns.scoreRound(
        col("score") / temperature + gumbel(col(idCol)), 4))
      .orderBy(col("noisy").desc, col(idCol))
      .limit(k)
  }
}
