package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion: combine a lexical ranking (BM25) and a
  * vector ranking (ANN) by Reciprocal Rank Fusion —
  * rrf(d) = Σ_lists 1/(c + rank_d) (Cormack et al., c=60) — the
  * fusion rule production "hybrid search" ships because it needs no
  * score calibration between incommensurable scoring scales (BM25
  * magnitudes vs cosine in [-1, 1]): only ranks enter.
  *
  * Scale note: the inputs are RANKED LISTS (top-k per retriever, k
  * rows each), not corpora — fusion joins two k-row frames. The heavy
  * lifting stays in the retrievers, which each prune corpus-side
  * (BM25's stateless scan, ANN's bucket probe). */
object Hybrid {

  /** Fuse two (id, rank) lists; ids missing from one list contribute
    * only the other's term. Output: top `k` by (rrf desc, id) with
    * each source rank carried for attribution. */
  def rrfFuse(textRank: DataFrame, vecRank: DataFrame,
              c: Int, k: Int): DataFrame = {
    val a = textRank.select(col("id"), col("rank").as("ra"))
    val b = vecRank.select(col("id"), col("rank").as("rb"))
    a.join(b, Seq("id"), "full_outer")
      .select(col("id"),
        round(coalesce(lit(1.0) / (lit(c) + col("ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rb")), lit(0.0)), 6).as("rrf"),
        col("ra"), col("rb"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
  }
}
