package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization of an event stream (beyond-reference
  * window op; the stateful building block of event analytics).
  *
  * Batch form: lag + cumulative-sum session indexing — two passes over
  * one (user, ts)-sorted shuffle partition-wise; the standard scalable
  * shape (each user's events land in one partition, no global sort).
  * The streaming analog is session_window(ts, gap) /
  * flatMapGroupsWithState; the batch form is the oracle-checkable
  * ground truth for it.
  */
object Sessionize {

  /** Assign per-user session indexes (0-based) with a new session
    * whenever the gap to the previous event exceeds `gapSeconds`. */
  def withSessionIds(events: DataFrame, userCol: String, tsCol: String,
                     idCol: String, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val gap: Column = col(tsCol).cast("long") -
      lag(col(tsCol).cast("long"), 1).over(byUser)
    events
      .withColumn("__new_session",
        when(gap.isNull || gap > gapSeconds, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__new_session")
  }

  /** Per-session summary rows. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, gapSeconds: Long): DataFrame =
    withSessionIds(events, userCol, tsCol, idCol, gapSeconds)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
}
