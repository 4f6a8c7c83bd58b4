package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.BoundedMinK

/** Deterministic, oracle-replayable sketches for corpus profiling.
  *
  * Classic streaming sketches (HLL, theta) are not reproducible across
  * engines — their hash families and register layouts differ — so an
  * external SQL oracle could never verify them. Every sketch here is
  * built on the portable md5-derived hash (same idiom as
  * dedup/SimHash.portableHash64), making the estimate a pure function
  * of the input set: DuckDB replays it bit-for-bit, and two cluster
  * runs of any size agree exactly.
  *
  * KMV (k-minimum-values) cardinality, Beyer et al., SIGMOD'07: keep
  * the k smallest distinct hash values of a set; if fewer than k exist
  * the count is exact, else the k-th smallest u estimates
  * |S| ≈ (k-1)·M/u for hashes uniform on [0, M). Error ~ 1/√k.
  * O(k) state per group via the BoundedMinK native aggregate: the
  * shuffle carries at most k longs per group regardless of group size.
  */
object Sketches {

  /** Hash domain: 15 hex digits of md5 = 60 bits, always positive.
    * DuckDB replay: ('0x' || substr(md5(x), 1, 15))::BIGINT. */
  val HashBits = 60
  val HashDomain: Double = math.pow(2, HashBits) // 2^60, exact in double

  /** Portable 60-bit hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** KMV state: the k smallest distinct hash60 values of `valueCol`
    * per group — a mergeable sketch (union = merge + recap). */
  def kmvState(valueCol: Column, k: Int): Column =
    BoundedMinK(hash60(valueCol), k)

  /** Cardinality estimate from a KMV state array (ascending longs).
    * Exact when the group's distinct count is below k. floor (not
    * round) — floor is midpoint-free, so engines can't diverge. */
  def kmvEstimate(state: Column, k: Int): Column = {
    val u = element_at(state, k).cast("double")
    when(size(state) < k, size(state).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(HashDomain) /
        greatest(u, lit(1.0))).cast("long"))
  }

  /** Per-group distinct-cardinality estimate of `valueCol`:
    * (group cols..., n_rows, kmv_distinct). */
  def distinctByGroup(df: DataFrame, groupCol: String, valueCol: String,
                      k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), kmvState(col(valueCol), k).as("__st"))
      .select(col(groupCol), col("n_rows"),
        kmvEstimate(col("__st"), k).as("kmv_distinct"))

  /** KMV set algebra (Beyer et al., SIGMOD'07 §5): |A∪B| and |A∩B|
    * estimates for every pair of per-group sketches.
    *
    * The union sketch is the k smallest of the merged min-sets
    * (KMV's closure under union); the Jaccard numerator `overlap_k`
    * counts union-sketch members present in BOTH input sketches, and
    * |A∩B| ≈ overlap_k/k · |A∪B|. When the union holds fewer than k
    * distinct hashes every figure is exact.
    *
    * Scale shape: the sketch table has one k-long array per group, so
    * the pairwise comparison is a broadcast self-join over
    * (groups choose 2) rows of O(k) state — the corpora themselves are
    * never re-read or joined. All arithmetic is integer/floor
    * (midpoint-free), replayed bit-for-bit by the SQL oracle.
    *
    * Input: `states(groupCol, stCol)` from [[kmvState]]; output:
    * ({groupCol}_a, {groupCol}_b, union_est, overlap_k, inter_est)
    * for every unordered pair a < b. */
  def overlapEstimates(states: DataFrame, groupCol: String, stCol: String,
                       k: Int): DataFrame = {
    val a = states.select(col(groupCol).as(s"${groupCol}_a"), col(stCol).as("__sa"))
    val b = states.select(col(groupCol).as(s"${groupCol}_b"), col(stCol).as("__sb"))
    val paired = a.join(broadcast(b),
        col(s"${groupCol}_a") < col(s"${groupCol}_b"))
      // bind the union sketch to an attribute: it feeds three
      // downstream expressions and would otherwise be re-evaluated
      .withColumn("__mu",
        slice(array_sort(array_union(col("__sa"), col("__sb"))), 1, k))
    val overlapK =
      size(array_intersect(col("__mu"), array_intersect(col("__sa"), col("__sb"))))
    val kk = least(lit(k), size(col("__mu")))
    paired
      .withColumn("union_est", kmvEstimate(col("__mu"), k))
      .withColumn("overlap_k", overlapK.cast("long"))
      .withColumn("inter_est",
        floor(col("overlap_k").cast("double") * col("union_est") / kk)
          .cast("long"))
      .drop("__sa", "__sb", "__mu")
  }
}
