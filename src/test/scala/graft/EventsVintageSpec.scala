package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.core.{GraftSession, Tables}

/** Snapshot-vintage robustness for the events readers (r7 advice): the
  * driver's events.parquet physical ts type has changed across
  * generations — TIMESTAMP(NANOS) (read as nanos-long under
  * `nanosAsLong`) through round 6, TIMESTAMP(MICROS,false) (= NTZ)
  * from round 7. `Tables.events` and `Tables.eventsStream` must
  * normalize BOTH to the same session-UTC TimestampType instants, so
  * every batch and streaming gate works against any snapshot. The
  * current testdata exercises the NTZ branch; this spec synthesizes
  * the legacy nanos-long layout and pins the other branch. */
class EventsVintageSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val legacyDir = {
    GraftSession.tune(spark)
    val dir = GraftSession.scratch("vintage")
    // legacy shape: ts as a raw nanosecond epoch LONG (what nanosAsLong
    // yields for TIMESTAMP(NANOS) files)
    Tables.events(spark, sfDir)
      .withColumn("ts", unix_micros(col("ts")) * 1000L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("batch reader normalizes nanos-long ts to the same instants") {
    val modern = Tables.events(spark, sfDir)
      .select("event_id", "ts").as[(Long, java.sql.Timestamp)]
      .collect().toMap
    val legacy = Tables.events(spark, legacyDir)
      .select("event_id", "ts").as[(Long, java.sql.Timestamp)]
      .collect().toMap
    assert(legacy.size == modern.size)
    assert(modern.forall { case (id, ts) => legacy(id) == ts },
      "legacy nanos-long snapshot read to different instants")
  }

  test("streaming reader drains a nanos-long snapshot with correct watermark instants") {
    GraftSession.stateScoped(spark, 4) { s =>
      val agg = Tables.eventsStream(s, legacyDir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours"))
        .agg(count(lit(1)).as("n"))
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName("vintage_stream")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val streamed = s.table("vintage_stream")
        .select(col("window.start").as("ws"), col("n"))
        .as[(java.sql.Timestamp, Long)].collect().toMap
      val batch = Tables.events(spark, sfDir)
        .groupBy(window(col("ts"), "6 hours"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("n"))
        .as[(java.sql.Timestamp, Long)].collect().toMap
      assert(streamed == batch,
        s"streamed ${streamed.size} windows != batch ${batch.size}")
    }
  }
}
