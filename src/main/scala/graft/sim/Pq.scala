package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the compression half of the IVF-PQ
  * design every billion-vector ANN system runs: split each D-dim
  * vector into `m` subvectors, learn a small codebook per subspace,
  * store each vector as `m` one-byte codes, and answer queries with
  * asymmetric distance computation (ADC) — the query stays exact, the
  * corpus is reconstructed from codebook entries via a per-query
  * lookup table.
  *
  * This engine's similarity surface is cosine/dot-product based, so
  * the codebooks are trained with the SAME spherical assignment rule
  * as the IVF coarse quantizer (Ivf.assign: rounded-cosine argmax,
  * lowest-id tie-break) and ADC approximates the dot product by
  * exactness of the decomposition  dot(q, x̂) = Σ_s dot(q_s, c_{s,code_s})
  * with ‖x̂‖² = Σ_s ‖c_{s,code_s}‖² — both reconstructible from codes
  * and the per-subspace lookup table alone.
  *
  * Scale shape: training cost is m small k-means runs on subvector
  * slices (each the KMeans.train cost model: corpus-sized assignment
  * + k·subDim means); encoding is m broadcast-argmax scans; the index
  * is N×m SMALL-INT codes (32× compression at m=4/float64-dim); a
  * query touches the N×m code table joined against a broadcast
  * (Q·m·k)-row LUT — the corpus vectors themselves are never read at
  * query time, which is the entire point at 100 TB. */
object Pq {

  // the m subspace trainings are INDEPENDENT driver loops (each its
  // own assignment jobs + mean collects); submitting them from m
  // threads lets the scheduler interleave their small jobs instead of
  // serializing m × iterations action latencies (measured 5.8 s → the
  // job-overhead floor at sf0.1). Results are deterministic — the
  // subspaces share nothing.
  private def inParallel[A](work: Seq[() => A]): Seq[A] = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(work.map(w => Future(w()))), Duration.Inf)
  }

  /** Train `m` codebooks of `k` centroids over `subDim`-wide slices.
    * Returns (sub, centroid_id, cvec). Deterministic: each subspace
    * trains with KMeans.train's fixed init (k lowest-id vectors). */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            m: Int, subDim: Int, k: Int, iterations: Int): DataFrame =
    inParallel((0 until m).map { s => () =>
      KMeans.train(
          corpus.select(col(idCol),
            slice(col(vecCol), s * subDim + 1, subDim).as(vecCol)),
          idCol, vecCol, k, iterations)
        .withColumn("sub", lit(s))
    }).reduce(_.unionByName(_))

  /** Encode the corpus: (id, sub, code) — m rows per vector, each the
    * nearest centroid of that subspace under the spherical assignment
    * rule. */
  def encode(corpus: DataFrame, codebooks: DataFrame, idCol: String,
             vecCol: String, m: Int, subDim: Int): DataFrame =
    (0 until m).map { s =>
      Similarity.Ivf.assign(
          corpus.select(col(idCol),
            slice(col(vecCol), s * subDim + 1, subDim).as(vecCol)),
          codebooks.where(col("sub") === s)
            .select("centroid_id", "cvec"),
          idCol, vecCol)
        .select(col(idCol), lit(s).as("sub"), col("bucket").as("code"))
    }.reduce(_.unionByName(_))

  /** ADC top-k: approximate cosine between each query and every
    * encoded vector, reconstructed ENTIRELY from the code table and a
    * broadcast per-query lookup table (Q·m·k rows of subspace dot
    * products + centroid norms). Scores rounded to `roundTo` before
    * the O(k)-heap rank, id tie-break — the Similarity contract. */
  def searchAdc(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, m: Int, subDim: Int,
                k: Int, roundTo: Int = 4): DataFrame = {
    val cb = codebooks.select(col("sub"), col("centroid_id").as("code"),
      col("cvec"), Similarity.dot(col("cvec"), col("cvec")).as("cn2"))
    val qsubs = (0 until m).map { s =>
      queries.select(col(idCol).as("query_id"),
        lit(s).as("sub"),
        slice(col(vecCol), s * subDim + 1, subDim).as("qv"),
        Similarity.norm(col(vecCol)).as("qn"))
    }.reduce(_.unionByName(_))
    val lut = qsubs.join(cb, "sub")
      .select(col("query_id"), col("sub"), col("code"), col("qn"),
        Similarity.dot(col("qv"), col("cvec")).as("d"), col("cn2"))
    val scored = codes.join(broadcast(lut), Seq("sub", "code"))
      .where(col(idCol) =!= col("query_id"))
      .groupBy(col("query_id"), col(idCol).as("neighbor_id"))
      .agg(sum(col("d")).as("adot"), sum(col("cn2")).as("xn2"),
        first(col("qn")).as("qn"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.ScoreFns.scoreRound(
          col("adot") / (col("qn") * sqrt(col("xn2"))), roundTo).as("cos"))
    Similarity.rankTopK(scored, k)
  }
}
