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

  // --- streaming form: custom state via flatMapGroupsWithState ---

  final case class SessionEvent(user_id: Long, event_id: Long, ts_us: Long)
  final case class SessionState(startUs: Long, endUs: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start_us: Long,
                                 session_end_us: Long, n_events: Long)

  /** Streaming sessionization with explicit keyed state: events are
    * buffered per user in GroupState; a session CLOSES (and is
    * emitted) when a later event arrives more than `gapSeconds` after
    * its end. The open tail session stays in state across batches —
    * the streaming analog of the batch `sessions` minus each user's
    * final (still-open) session. */
  def streamingSessions(events: org.apache.spark.sql.Dataset[SessionEvent],
                        gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          // micro-batch iterators are unordered: sort this batch's slice
          val evs = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          var cur = state.getOption
          evs.foreach { e =>
            cur match {
              case Some(s) if e.ts_us / 1000000L - s.endUs / 1000000L > gapSeconds =>
                closed += ClosedSession(user, s.startUs, s.endUs, s.n)
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
              case Some(s) =>
                cur = Some(SessionState(s.startUs, e.ts_us, s.n + 1))
              case None =>
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
      .toDF()
  }
}
