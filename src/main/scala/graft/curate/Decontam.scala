package graft.curate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Shingles

/** Benchmark decontamination: flag corpus documents that share any
  * word n-gram with a held-out evaluation set.
  *
  * Scale shape: the benchmark set is tiny relative to the corpus
  * (thousands of eval documents vs billions of training documents),
  * so its distinct n-gram set is collected into a broadcast hash
  * relation; the corpus side explodes shingles and probes the
  * broadcast — corpus text is read once, never shuffled, and the only
  * exchange is the per-doc hit-count aggregation on (doc_id, partial
  * count). This is the standard industrial decontamination shape
  * (exact n-gram overlap, as used for benchmark leakage checks).
  */
object Decontam {

  /** (doc_id, hits): corpus documents sharing ≥1 distinct n-gram with
    * `bench`, with the count of distinct shared n-grams. Documents
    * shorter than n tokens cannot be contaminated and are excluded on
    * both sides. */
  def contaminated(corpus: DataFrame, bench: DataFrame,
                   idCol: String, textCol: String, n: Int): DataFrame = {
    val benchGrams = Shingles.docShingles(bench, idCol, textCol, n)
      .select(explode(col("shingles")).as("g")).distinct()
    val corpusGrams = Shingles.docShingles(corpus, idCol, textCol, n)
      // shingles are distinct per doc, so post-join count(*) counts
      // distinct shared n-grams without a count(distinct) exchange
      .select(col(idCol), explode(col("shingles")).as("g"))
    corpusGrams.join(broadcast(benchGrams), "g")
      .groupBy(idCol).agg(count(lit(1)).as("hits"))
  }

  /** Embedding-space decontamination: corpus rows whose vector has
    * cosine ≥ `tau` to ANY benchmark vector — the semantic
    * complement of the n-gram check above (catches paraphrased or
    * reformatted benchmark leakage that shares no exact n-gram).
    * Returns (id, hits, max_cos): how many benchmark vectors matched
    * and the strongest match, both over cosines rounded to 4 decimals
    * (the registry-wide cross-engine comparison contract).
    *
    * Scale shape: same as the n-gram path — the benchmark side is
    * tiny, so it broadcasts and the corpus streams through a
    * map-side cosine probe (one pass, no shuffle of corpus vectors);
    * the only exchange is the per-id (count, max) partial aggregate.
    * For benchmark sets too big to broadcast, pre-bucket both sides
    * with [[graft.sim.RhpLsh]] and run this per bucket. */
  def embeddingContaminated(corpus: DataFrame, bench: DataFrame,
                            idCol: String, vecCol: String,
                            tau: Double): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).as("__cv"))
    val b = bench.select(col(vecCol).as("__bv"))
    c.crossJoin(broadcast(b))
      .withColumn("__cos",
        round(graft.sim.Similarity.cosine(col("__cv"), col("__bv")), 4))
      // zero-norm vectors give 0/0 = NaN, and Spark orders NaN above
      // every double, so an unguarded `>= tau` would flag them as
      // contaminated (with max_cos = NaN, which DuckDB hashes
      // differently). A zero vector has no direction — never a match.
      .where(!isnan(col("__cos")) && col("__cos") >= tau)
      .groupBy(idCol)
      .agg(count(lit(1)).as("hits"), max(col("__cos")).as("max_cos"))
  }
}
