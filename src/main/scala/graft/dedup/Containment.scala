package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Asymmetric shingle CONTAINMENT — the near-dup signal Jaccard and
  * cosine both miss: when document B is document A plus a lot of new
  * material (quote expansion, boilerplate wrapping, version n+1 of a
  * page), |A∩B|/|A∪B| is diluted by B's extra content but
  * c(A→B) = |S(A)∩S(B)| / |S(A)| stays near 1. Broder's containment
  * measure, the backbone of "keep the superset, drop the subset"
  * curation rules.
  *
  * Candidate generation is the inverted-index join over DISTINCT
  * (doc, shingle) postings with a df ∈ [2, maxDf] stop-shingle cap (a
  * corpus-wide shingle would generate an all-pairs candidate set; one
  * in > maxDf docs carries no identity signal). The cap is ABSOLUTE,
  * and that is load-bearing for scale: with df ≤ C the candidate
  * volume is Σ df² ≤ C·Σ df — LINEAR in the posting count — while a
  * corpus-fraction cap makes it quadratic (measured: a 4%-of-corpus
  * cap ran 4.9 s at sf0.1 but 93 s at sf1, exponent 1.28). The
  * semantics justify it too: "this exact trigram appears in 2..C
  * documents" is an identity signal whose meaning does not depend on
  * corpus size — a phrase shared by 100k documents is boilerplate at
  * any scale. C is a signal knob, not a coverage knob; pairs linked
  * ONLY through hotter-than-C phrases belong to the LSH family
  * (MinHashLSH/RhpLsh), not to an exact pairwise audit.
  * Containment is computed in the PRUNED shingle space — |S(·)|
  * counts kept shingles only, so the ratio is "containment over
  * discriminative phrasing" (documented semantics, replayed exactly
  * by the oracle). Counts all integral: the division is the only
  * float step, bit-identical across engines.
  */
object Containment {

  /** Document pairs (a < b) whose containment in EITHER direction
    * reaches `threshold`, with both directed ratios. Output:
    * (a, b, c_ab, c_ba) ordered by (a, b). */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
            threshold: Double, n: Int = 3,
            maxDf: Int = 100): DataFrame = {
    val posts = docs
      .select(col(idCol).as("id"),
        Shingles.tokens(lower(col(textCol))).as("__toks"))
      .select(col("id"),
        explode(Shingles.shinglesFromTokens(col("__toks"), n)).as("sh"))
    val kept = posts.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= maxDf)
    val p = posts.join(kept.select("sh"), Seq("sh"))
    val sizes = p.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = p.select(col("sh"), col("id").as("a"))
      .join(p.select(col("sh"), col("id").as("b")), Seq("sh"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    inter
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), "b")
      .select(col("a"), col("b"),
        round(col("common").cast("double") / col("sza"), 4).as("c_ab"),
        round(col("common").cast("double") / col("szb"), 4).as("c_ba"))
      .where(col("c_ab") >= threshold || col("c_ba") >= threshold)
      .orderBy("a", "b")
  }
}
