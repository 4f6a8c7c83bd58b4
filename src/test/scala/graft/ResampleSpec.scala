package graft

import java.sql.Timestamp
import graft.ops.Resample

/** Forward-fill resampling on hand-built gaps. */
class ResampleSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gaps synthesize buckets carrying the last reading") {
    val s = spark
    import s.implicits._
    // readings at 00:10 and 03:20 → hourly grid 00,01,02,03; hours
    // 01/02 are silent and must carry 1.0
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1.0),
      (1L, ts("2024-01-01 03:20:00"), 4.0)).toDF("k", "t", "v")
    val got = Resample.forwardFill(df, "k", "t", "v", 3600L)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got.length == 4)
    assert(got.map(_._2).toSeq == Seq(1.0, 1.0, 1.0, 4.0))
    assert(got.map(_._3).toSeq == Seq(true, false, false, true))
    // consecutive grid buckets are exactly one step apart
    assert(got.sliding(2).forall(p => p(1)._1 - p(0)._1 == 3600L))
  }

  test("in-bucket collisions resolve to the microsecond-latest reading") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 5.0),
      (1L, ts("2024-01-01 00:50:00"), 7.0),   // later → wins the bucket
      (2L, ts("2024-01-01 00:30:00"), 1.0),
      (2L, ts("2024-01-01 00:30:00"), 2.0)    // exact tie → max value
    ).toDF("k", "t", "v")
    val got = Resample.forwardFill(df, "k", "t", "v", 3600L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(1L -> 7.0, 2L -> 2.0))
  }

  test("linear interpolation draws the straight line across a gap") {
    val s = spark
    import s.implicits._
    // readings 1.0 @00 and 4.0 @03 → hours 01/02 interpolate to 2.0/3.0
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 03:00:00"), 4.0)).toDF("k", "t", "v")
    val got = Resample.interpolateLinear(df, "k", "t", "v", 3600L)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    assert(got.map(_._3).toSeq == Seq(true, false, false, true))
  }

  test("interpolation keeps observed buckets exact and fills per key") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 02:00:00"), 0.0),
      (2L, ts("2024-01-01 01:00:00"), 5.0)).toDF("k", "t", "v")
    val rows = Resample.interpolateLinear(df, "k", "t", "v", 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b0 = rows.filter(_._1 == 1L).map(_._2).min
    assert(rows.map(r => (r._1, r._2 - b0, r._3)).toSet ==
      Set((1L, 0L, 10.0), (1L, 3600L, 5.0), (1L, 7200L, 0.0),
        (2L, 3600L, 5.0)))
  }

  test("keys fill independently — no bleed across partitions") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 02:00:00"), 3.0),
      (2L, ts("2024-01-01 01:00:00"), 9.0)).toDF("k", "t", "v")
    val rows = Resample.forwardFill(df, "k", "t", "v", 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // bucket values are TZ-dependent (Timestamp.valueOf is local
    // time); assert RELATIVE offsets from key 1's first bucket
    val b0 = rows.filter(_._1 == 1L).map(_._2).min
    assert(rows.map(r => (r._1, r._2 - b0, r._3)).toSet ==
      Set((1L, 0L, 1.0), (1L, 3600L, 1.0), (1L, 7200L, 3.0),
        (2L, 3600L, 9.0)))
  }
}
