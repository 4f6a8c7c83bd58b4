package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023,
  * arXiv:2303.09540): k-means-bucket the embedding space, then drop
  * near-identical vectors WITHIN each bucket — the embedding-space
  * analog of MinHash near-dup removal, catching paraphrases and
  * re-encodings that share no n-grams.
  *
  * Scale shape: the quantizer is the deterministic Lloyd trainer
  * (sim/KMeans, k·dim doubles on the driver); assignment is one
  * broadcast argmax over the corpus; candidate pairs form only INSIDE
  * a bucket — the self-join is keyed on bucket id, so pair count is
  * Σ_b n_b², bounded by the quantizer granularity (k buckets at 100 TB
  * ⇒ ~(n/k)·n pairs worst case, tuned by k; boilerplate-heavy buckets
  * can additionally be capped like MinHashLSH.maxBucketSize). Never an
  * unblocked cross join. Survivor policy matches the near-dup family:
  * a vector is dropped iff it is the higher id of some verified pair.
  */
object SemDedup {

  /** Survivors of within-bucket cosine dedup: (idCol, bucket) for every
    * vector not dropped. `tau` on the cosine rounded to `roundTo`
    * digits (engine-reproducible, same contract as Ivf.assign). */
  def survivors(emb: DataFrame, idCol: String, vecCol: String,
                k: Int, iterations: Int, tau: Double,
                roundTo: Int = 4): DataFrame = {
    val centroids = KMeans.train(emb, idCol, vecCol, k, iterations)
    val assigned = Similarity.Ivf.assign(emb, centroids, idCol, vecCol, roundTo)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withNorm = assigned.select(col("bucket"), col(idCol),
      col(vecCol), Similarity.norm(col(vecCol)).as("__nrm"))
    val l = withNorm.select(col("bucket"), col(idCol).as("a"),
      col(vecCol).as("va"), col("__nrm").as("na"))
    val r = withNorm.select(col("bucket"), col(idCol).as("b"),
      col(vecCol).as("vb"), col("__nrm").as("nb"))
    val losers = l.join(r, Seq("bucket"))
      .where(col("a") < col("b"))
      .where(round(Similarity.dot(col("va"), col("vb")) /
        (col("na") * col("nb")), roundTo) >= tau)
      .select(col("b").as(idCol)).distinct()
    assigned.join(losers, Seq(idCol), "left_anti")
      .select(col(idCol), col("bucket"))
  }
}
