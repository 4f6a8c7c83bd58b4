package graft

import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.ops.Upsert
import graft.streaming.Sessionize

class UpsertSessionSpec extends SparkSpecBase {
  import spark.implicits._

  test("upsert: update wins by version, ties favor the update batch") {
    GraftSession.tune(spark)
    val path = GraftSession.scratch("spec-upsert")
    val base = Seq((1L, "old", 0L, "p1"), (2L, "keep", 0L, "p1"), (3L, "other", 0L, "p2"))
      .toDF("k", "v", "version", "part")
    Upsert.mergeIntoParquet(spark, path, base, Seq("k"), "version", "part")
    val upd = Seq((1L, "new", 1L, "p1"), (4L, "ins", 0L, "p1"))
      .toDF("k", "v", "version", "part")
    Upsert.mergeIntoParquet(spark, path, upd, Seq("k"), "version", "part")
    val got = spark.read.parquet(path).select("k", "v")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "new", 2L -> "keep", 3L -> "other", 4L -> "ins"))
  }

  test("upsert is idempotent: merging the same batch twice is a no-op") {
    GraftSession.tune(spark)
    val path = GraftSession.scratch("spec-upsert-idem")
    val base = Seq((1L, 10.0, 0L, "p1"), (2L, 20.0, 0L, "p2")).toDF("k", "v", "version", "part")
    Upsert.mergeIntoParquet(spark, path, base, Seq("k"), "version", "part")
    val upd = Seq((1L, 11.0, 1L, "p1")).toDF("k", "v", "version", "part")
    Upsert.mergeIntoParquet(spark, path, upd, Seq("k"), "version", "part")
    val once = spark.read.parquet(path).orderBy("k").collect().map(_.toString).toSeq
    Upsert.mergeIntoParquet(spark, path, upd, Seq("k"), "version", "part")
    val twice = spark.read.parquet(path).orderBy("k").collect().map(_.toString).toSeq
    assert(once == twice)
  }

  test("upsert leaves untouched partitions bit-identical") {
    GraftSession.tune(spark)
    val path = GraftSession.scratch("spec-upsert-parts")
    val base = Seq((1L, 1.0, 0L, "p1"), (2L, 2.0, 0L, "p2")).toDF("k", "v", "version", "part")
    Upsert.mergeIntoParquet(spark, path, base, Seq("k"), "version", "part")
    val p2File = java.nio.file.Files.list(java.nio.file.Paths.get(path, "part=p2"))
      .filter(_.toString.endsWith(".parquet")).findFirst.get
    val mtime = java.nio.file.Files.getLastModifiedTime(p2File)
    Upsert.mergeIntoParquet(spark, path,
      Seq((1L, 9.0, 1L, "p1")).toDF("k", "v", "version", "part"),
      Seq("k"), "version", "part")
    assert(java.nio.file.Files.exists(p2File))
    assert(java.nio.file.Files.getLastModifiedTime(p2File) == mtime)
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    val ev = Seq(
      (7L, 1L, ts(0)), (7L, 2L, ts(1800)),  // exactly gap -> same session
      (7L, 3L, ts(3601)),                    // 1801s after -> new session
      (8L, 4L, ts(0))
    ).toDF("user_id", "event_id", "ts")
    val got = Sessionize.sessions(ev, "user_id", "ts", "event_id", 1800)
      .select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((7L, 0L, 2L), (7L, 1L, 1L), (8L, 0L, 1L)))
  }
}
