package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.{GraftSession, Tables}
import graft.streaming.Sessionize

class StreamSessionSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming sessionization matches batch ground truth for closed sessions") {
    GraftSession.tune(spark)
    // stream the events table, ts normalized by Tables.eventsStream
    // (schema probed from the batch reader — snapshot-vintage-proof)
    val stream = Tables.eventsStream(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[Sessionize.SessionEvent]
    val out = Sessionize.streamingSessions(stream, gapSeconds = 1800)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stream_sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("stream_sessions")
      .select("user_id", "session_start_us", "n_events")
      .as[(Long, Long, Long)].collect().toSet

    // batch ground truth: all sessions except each user's final one
    val batch = Sessionize.sessions(Tables.events(spark, sfDir),
      "user_id", "ts", "event_id", 1800)
    val lastIdx = batch.groupBy("user_id")
      .agg(max("session_idx").as("last_idx"))
    // compare on (user, start-us, n_events)
    val closedUs = batch.join(lastIdx, "user_id")
      .where(col("session_idx") < col("last_idx"))
      .select(col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        col("n_events"))
      .as[(Long, Long, Long)].collect().toSet

    assert(streamed == closedUs,
      s"streaming=${streamed.size} batch-closed=${closedUs.size}")
  }
}
