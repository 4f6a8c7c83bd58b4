package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (Array[Float]).
  *
  * - `cosine` — codegen'd higher-order-function dot/norm (zip_with +
  *   aggregate), left-to-right accumulation in double so results are
  *   reproducible across engines.
  * - `bruteForceTopK` — the exact baseline: broadcast the (small) query
  *   set against the corpus, window-rank per query. Corpus-side scan is
  *   embarrassingly parallel; the only shuffle is the per-query top-k.
  * - `Ivf` — the scale path: deterministic coarse quantizer; corpus
  *   bucketed by nearest centroid (computed once, reusable); queries
  *   probe only `nprobe` nearest buckets. At 100 TB the bucketed
  *   corpus is the index — probe cost is nprobe/k of a full scan.
  */
object Similarity {

  /** Left-to-right double dot product of two float-array columns —
    * native codegen'd kernel (see plans/DotProduct.scala). Bit-exact
    * with `dotDeclarative`, asserted in SimilaritySpec. */
  def dot(x: Column, y: Column): Column = graft.plans.DotProduct(x, y)

  /** The declarative HOF formulation of `dot` — kept as the
    * cross-engine reference path for tests; interpreted lambdas make it
    * several-fold slower per pair, so hot paths use `dot`. */
  def dotDeclarative(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(x: Column): Column = sqrt(dot(x, x))

  /** Cosine similarity of two float-array columns, accumulated in
    * double, fixed left-to-right order. For pairwise workloads prefer
    * `dot(a,b) / (normA * normB)` with norms PRECOMPUTED per row —
    * this inline form recomputes both norms per pair. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector (excluding self).
    * Scores rounded to `roundTo` BEFORE ranking so ordering (with id
    * tie-break) is engine-reproducible. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, roundTo: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** IVF-style approximate search with a deterministic coarse
    * quantizer: `centroids` is any small DataFrame of (centroid_id,
    * vector) — e.g. a fixed id-sampled subset, or k-means output. */
  object Ivf {

    /** Assign every corpus vector to its nearest centroid (rounded
      * score, lowest-id tie-break). Argmax as a max(struct) aggregation
      * — partial (map-side) aggregation applies, so unlike a window
      * rank nothing ever sorts the full corpus×centroids product. */
    def assign(corpus: DataFrame, centroids: DataFrame, idCol: String,
               vecCol: String, roundTo: Int = 4): DataFrame = {
      val cents = centroids.select(col("centroid_id"), col("cvec"),
        norm(col("cvec")).as("cnrm"))
      corpus.select(col(idCol), col(vecCol), norm(col(vecCol)).as("__nrm"))
        .crossJoin(broadcast(cents))
        .withColumn("cscore", round(
          dot(col(vecCol), col("cvec")) / (col("__nrm") * col("cnrm")), roundTo))
        .groupBy(col(idCol))
        .agg(
          max(struct(col("cscore"), (-col("centroid_id")).as("nid"))).as("m"),
          first(col(vecCol)).as(vecCol))
        .select(col(idCol), col(vecCol), (-col("m.nid")).as("bucket"))
    }

    /** Probe: rank centroids per query, search only the top-nprobe
      * buckets, then exact-rank within the probed subset. */
    def search(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
               idCol: String, vecCol: String, k: Int, nprobe: Int,
               roundTo: Int = 4): DataFrame = {
      val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("qn"))
      val cents = centroids.select(col("centroid_id"), col("cvec"),
        norm(col("cvec")).as("cnrm"))
      val wProbe = Window.partitionBy("query_id")
        .orderBy(col("cscore").desc, col("centroid_id").asc)
      val probes = q.crossJoin(broadcast(cents))
        .withColumn("cscore", round(
          dot(col("qv"), col("cvec")) / (col("qn") * col("cnrm")), roundTo))
        .withColumn("crank", row_number().over(wProbe))
        .where(col("crank") <= nprobe)
        .select(col("query_id"), col("qv"), col("qn"), col("centroid_id").as("bucket"))
      val wRank = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      assigned.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
          norm(col(vecCol)).as("cn"), col("bucket"))
        .join(broadcast(probes), Seq("bucket"))
        .where(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo).as("cos"))
        .withColumn("rank", row_number().over(wRank))
        .where(col("rank") <= k)
    }
  }

  /** Embedding near-duplicate pairs at/above a cosine threshold —
    * exact blocked all-pairs (the verification baseline; LSH/IVF
    * prune candidates at scale). */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, roundTo: Int = 4): DataFrame = {
    val l = corpus.select(col(idCol).as("a"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"))
    val r = corpus.select(col(idCol).as("b"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"))
    l.crossJoin(r).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), roundTo).as("cos"))
      .where(col("cos") >= threshold)
  }
}
