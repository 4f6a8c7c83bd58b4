package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (nearest earlier match per key), composed from built-ins
  * per the custom-operator preference order (compose > custom plan):
  * tag both sides, union, ONE per-key time-ordered window with a
  * null-ignoring last() carry-forward, keep left rows.
  *
  * Scale shape: a single shuffle on the key (the union sorts within
  * partitions) — strictly cheaper than any join formulation, which
  * would shuffle both sides AND need a range predicate. Equal
  * timestamps on the right side must be deduplicated by the caller for
  * deterministic results (the gate query keeps max id per ts).
  */
object AsOfJoin {

  /** For each left row, attach the payload of the latest right row with
    * rightTs <= leftTs for the same key. Output = left columns +
    * `matchedCol` (nullable payload of the matched right row). */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, payloadCol: String,
                   matchedCol: String): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(right.schema(payloadCol).dataType))
    val r = right.select(col(keyCol), col(tsCol),
        col(payloadCol).as("__payload"))
      .withColumn("__side", lit(0))
    val leftCols = left.columns
    val unioned = l.select(
      (leftCols.map(col) :+ col("__side") :+ col("__payload")): _*)
      .unionByName(r.select(
        (leftCols.map(c => if (c == keyCol || c == tsCol) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c))
          :+ col("__side") :+ col("__payload")): _*))
    // right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    // same-instant right row is visible to the left row (<= semantics)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn(matchedCol, last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__side", "__payload")
  }
}
