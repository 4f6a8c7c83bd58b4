package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sketch.Sketches.hash60

/** Feature-engineering primitives for model-training pipelines — the
  * step between curation and the trainer: fixed-dimension text
  * featurization (the hashing trick) and leakage-safe categorical
  * target encoding.
  *
  * Scale shape: both operators are single keyed aggregations over the
  * fact table (partial-aggregable, map-side combined); everything else
  * happens on BOUNDED reductions (the D-row bucket table, the
  * |categories|×|folds| statistic table) joined back by broadcast.
  * Nothing here windows or self-joins the fact table.
  */
object Featurize {

  /** Hashing-trick featurization: token → bucket = h60("ht:"+token)
    * mod `dim`. Returns the per-(doc, bucket) sparse count matrix —
    * one explode + one keyed aggregation, the exact cost class of a
    * token count. Collisions are the accepted trade of the trick; the
    * bucket space is fixed at `dim` regardless of vocabulary size, so
    * the feature table is bounded at any corpus scale.
    * `tokens` must be an array<string> column. */
  def hashingTrick(df: DataFrame, idCol: String, tokens: Column, dim: Int): DataFrame =
    df.select(col(idCol), explode(tokens).as("tok"))
      .withColumn("bucket", pmod(hash60(concat(lit("ht:"), col("tok"))), lit(dim.toLong)))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Out-of-fold smoothed target encoding of a categorical column.
    *
    * Leakage-safe form: a row's own fold is EXCLUDED from the mean it
    * is encoded with — enc(cat, fold) = (S_cat − s_{cat,fold} + m·prior)
    * / (N_cat − n_{cat,fold} + m), where prior is the global target
    * mean and m the smoothing pseudo-count. Folds are assigned by
    * salted hash of `groupCol` (GROUP-aware: every row of a group
    * lands in one fold, so a group can never contribute to its own
    * encoding — the cross-validation contract).
    *
    * Cost: ONE keyed aggregation over the fact table builds the
    * (cat, fold) → (n, s) statistic table; global per-cat sums and the
    * prior come from re-aggregating THAT table (bounded rows), never a
    * second fact pass. Returns the bounded (cat, fold) encoding table
    * to broadcast-join back onto the facts. */
  def targetEncodeOof(df: DataFrame, catCol: String, targetCol: String,
                      groupCol: String, folds: Int, smoothing: Double): DataFrame = {
    val cf = df
      .withColumn("fold",
        pmod(hash60(concat(lit("fold:"), col(groupCol).cast("string"))), lit(folds.toLong)))
      .groupBy(col(catCol).as("cat"), col("fold"))
      .agg(count(lit(1)).cast("double").as("n_cf"),
        sum(col(targetCol)).as("s_cf"))
    val perCat = cf.groupBy("cat")
      .agg(sum("n_cf").as("n_c"), sum("s_cf").as("s_c"))
    val prior = cf.agg((sum("s_cf") / sum("n_cf")).as("prior"))
    cf.join(broadcast(perCat), "cat")
      .crossJoin(broadcast(prior))
      .select(col("cat"), col("fold"), col("n_cf").cast("long").as("n_rows"),
        ((col("s_c") - col("s_cf") + lit(smoothing) * col("prior"))
          / (col("n_c") - col("n_cf") + lit(smoothing))).as("encoding"))
  }

  /** Phonetic blocking key: uppercase first letter + the vowel-stripped
    * remainder (consonant skeleton). Deliberately RE2-safe — no regex
    * backreferences — so the identical spelling runs in engines without
    * PCRE (the oracle replays it verbatim). A blocking key for entity
    * resolution: sound-alike tokens (names, brands) collide, and the
    * candidate-pair space collapses from all-pairs to within-block. */
  def phoneticKey(word: Column): Column =
    concat(upper(substring(word, 1, 1)),
      regexp_replace(substring(word, 2, 1000000), "[aeiou]", ""))
}
