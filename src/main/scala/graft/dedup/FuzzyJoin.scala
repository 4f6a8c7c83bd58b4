package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy-key matching (entity resolution / approximate join).
  *
  * The classic ER shape: candidate pairs come from an EQUI-join on a
  * cheap blocking key — never an all-pairs theta join — so the
  * quadratic edit-distance predicate runs only inside blocks. The
  * same blocking discipline as [[MinHashLSH]] (band buckets) and
  * [[graft.sim.RhpLsh]] (hyperplane buckets), specialised to short
  * keys where Levenshtein is the right metric (product names, entity
  * labels, column headers).
  *
  * 100 TB story: matching runs over the DISTINCT value dictionary
  * (≪ corpus — the fact table never self-joins), the one shuffle is
  * hash(blockKey) on that dictionary, per-task work is bounded by the
  * block-size cap, and the emitted pair count tracks true
  * near-matches, not n². The distance call uses Spark's bounded
  * Levenshtein (threshold arg → the DP early-exits on rows that
  * cannot come in under `maxDist`).
  */
object FuzzyJoin {

  /** Distinct values of `valueCol` whose blocking keys collide and
    * whose Levenshtein distance is in [1, maxDist]; each unordered
    * pair is emitted once (left < right).
    *
    * `blockKeyOf` must be deterministic and should be chosen so true
    * matches share a key (e.g. the last token for "adjective noun"
    * names; a phonetic code or length-bucketed prefix elsewhere).
    * Recall is bounded by the blocking choice — same contract as any
    * LSH family.
    *
    * `maxBlock` caps candidate generation: blocks larger than it are
    * dropped (a degenerate key like "" would otherwise regenerate the
    * all-pairs join that blocking exists to avoid). */
  def selfMatch(df: DataFrame, valueCol: String,
                blockKeyOf: Column => Column, maxDist: Int,
                maxBlock: Int = 10000): DataFrame = {
    val names = df.select(col(valueCol).as("name"))
      .where(col("name").isNotNull).distinct()
      .withColumn("blk", blockKeyOf(col("name")))
    val bounded = names
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("blk")))
      .where(col("bn") <= maxBlock).drop("bn")
    val l = bounded.select(col("blk"), col("name").as("left_name"))
    val r = bounded.select(col("blk"), col("name").as("right_name"))
    l.join(r, Seq("blk"))
      .where(col("left_name") < col("right_name"))
      // threshold form: the DP abandons a row as soon as the running
      // distance exceeds maxDist (returns -1), excluded by between()
      .withColumn("dist",
        levenshtein(col("left_name"), col("right_name"), maxDist))
      .where(col("dist").between(1, maxDist))
      .select("left_name", "right_name", "dist")
  }
}
