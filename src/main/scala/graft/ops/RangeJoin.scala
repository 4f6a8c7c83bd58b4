package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join without the O(points × intervals)
  * blowup: intervals are exploded to the fixed-width time bins they
  * overlap, points map to exactly one bin, and the equi-join on
  * (key, bin) prunes candidates before the BETWEEN predicate.
  *
  * A point meets each interval in at most ONE bin (its own), so no
  * dedup is needed. Bin width trades replication (intervals spanning
  * many bins) against candidate fan-in; pick ~ the median interval
  * length. This is the composition answer to "Spark lacks a range
  * join" — no custom strategy needed, and Catalyst still pushes the
  * final predicate into the joined stream.
  */
object RangeJoin {

  /** Attach interval payload columns to every point falling inside
    * [startCol, endCol] (inclusive) of the same key. Epoch-second
    * comparisons; `binSeconds` is the bin width. */
  def binnedContainment(points: DataFrame, intervals: DataFrame,
                        keyCol: String, tsCol: String,
                        startCol: String, endCol: String,
                        binSeconds: Long): DataFrame = {
    val p = points.withColumn("__bin",
      (col(tsCol).cast("long") / binSeconds).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        (col(startCol).cast("long") / binSeconds).cast("long"),
        (col(endCol).cast("long") / binSeconds).cast("long"))))
    p.join(iv, Seq(keyCol, "__bin"))
      .where(col(tsCol).cast("long").between(
        col(startCol).cast("long"), col(endCol).cast("long")))
      .drop("__bin")
  }
}
