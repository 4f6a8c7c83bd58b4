package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.core.GraftSession
import graft.etl.VersionedTable
import graft.streaming.CdcIngest

/** CDC stream → versioned table: per-batch commits, delete ops,
  * replay idempotence. */
class CdcIngestSpec extends SparkSpecBase {

  private def state(root: String): Map[Long, Double] =
    VersionedTable.readLatest(spark, root, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("drains batches into commits; deletes tombstone; replay is a no-op") {
    GraftSession.tune(spark)
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = GraftSession.scratch("cdc")
    val root = s"$base/tbl"
    val ck = s"$base/ck"

    val ms = MemoryStream[(Long, Double, String)]
    val stream = ms.toDF().toDF("k", "v", "op")

    // batch 1: initial inserts
    ms.addData((1L, 1.0, "U"), (2L, 2.0, "U"), (3L, 3.0, "U"))
    CdcIngest.runAvailable(spark, stream, root, Seq("k"), "op", ck)
    assert(state(root) == Map(1L -> 1.0, 2L -> 2.0, 3L -> 3.0))

    // batch 2: update k=2, delete k=1 → one upsert + one delete commit
    ms.addData((2L, 20.0, "U"), (1L, 0.0, "D"))
    CdcIngest.runAvailable(spark, stream, root, Seq("k"), "op", ck)
    assert(state(root) == Map(2L -> 20.0, 3L -> 3.0))
    assert(VersionedTable.versions(spark, root).size == 3) // init + ups + del

    // re-drain with nothing new: no additional commits
    CdcIngest.runAvailable(spark, stream, root, Seq("k"), "op", ck)
    assert(VersionedTable.versions(spark, root).size == 3)

    // time travel still sees the pre-delete state
    val v0 = VersionedTable.readAsOf(spark, root, Seq("k"), 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(v0 == Map(1L -> 1.0, 2L -> 2.0, 3L -> 3.0))
  }

  test("crash between data commits and marker: replay rolls back, no dup versions") {
    GraftSession.tune(spark)
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = GraftSession.scratch("cdc-crash")
    val root = s"$base/tbl"
    val ck = s"$base/ck"

    val ms = MemoryStream[(Long, Double, String)]
    val stream = ms.toDF().toDF("k", "v", "op")
    ms.addData((1L, 1.0, "U"), (2L, 2.0, "U"))
    CdcIngest.runAvailable(spark, stream, root, Seq("k"), "op", ck)
    assert(VersionedTable.versions(spark, root) == Seq(0L))

    // simulate a crashed batch-1 attempt: data committed + tagged, but
    // the last-batch marker was never written
    val partial = VersionedTable.commitUpsert(spark, root,
      Seq((9L, 9.0)).toDF("k", "v"))
    CdcIngest.tagBatch(spark, root, partial, 1L)
    assert(VersionedTable.versions(spark, root) == Seq(0L, 1L))

    // replay of batch 1 (stream redelivers: the checkpoint never saw
    // it complete either) → rollback of the partial dir, then a clean
    // recommit: exactly one new version, correct state
    ms.addData((9L, 9.5, "U"))
    CdcIngest.runAvailable(spark, stream, root, Seq("k"), "op", ck)
    assert(VersionedTable.versions(spark, root) == Seq(0L, 1L))
    assert(state(root) == Map(1L -> 1.0, 2L -> 2.0, 9L -> 9.5))
  }

  test("rollback releases the OCC claim along with the data dir") {
    GraftSession.tune(spark)
    val s = spark
    import s.implicits._
    val base = GraftSession.scratch("cdc-claim")
    val root = s"$base/tbl"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def claimExists(v: Long) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$root/_commits/$v.commit"))

    VersionedTable.init(spark, root, Seq((1L, 1.0)).toDF("k", "v"))
    val torn = VersionedTable.commitUpsert(spark, root,
      Seq((2L, 2.0)).toDF("k", "v"))
    CdcIngest.tagBatch(spark, root, torn, 5L)
    assert(claimExists(torn))

    // marker says batch 4 was the last complete one → v=torn is a
    // leftover of crashed batch 5: both the dir AND the claim must go,
    // so the recommit re-lands at the SAME version number
    CdcIngest.rollbackPartial(spark, root, lastDone = 4L)
    assert(!claimExists(torn))
    assert(VersionedTable.versions(spark, root) == Seq(0L))
    val again = VersionedTable.commitUpsert(spark, root,
      Seq((2L, 2.5)).toDF("k", "v"))
    assert(again == torn)
  }

  test("three-batch replay: crash at batch 2 of 3 keeps versions and marker monotonic") {
    GraftSession.tune(spark)
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = GraftSession.scratch("cdc-3batch")
    val root = s"$base/tbl"
    val ck = s"$base/ck"

    val ms = MemoryStream[(Long, Double, String)]
    val stream = ms.toDF().toDF("k", "v", "op")

    // batches 0 and 1 land cleanly
    ms.addData((1L, 1.0, "U"), (2L, 2.0, "U"))
    CdcIngest.runAvailable(spark, stream, root, Seq("k"), "op", ck)
    ms.addData((3L, 3.0, "U"))
    CdcIngest.runAvailable(spark, stream, root, Seq("k"), "op", ck)
    assert(VersionedTable.versions(spark, root) == Seq(0L, 1L))

    // batch 2 crashes mid-flight: data committed + tagged, no marker
    val torn = VersionedTable.commitUpsert(spark, root,
      Seq((4L, 4.0)).toDF("k", "v"))
    CdcIngest.tagBatch(spark, root, torn, 2L)
    assert(VersionedTable.versions(spark, root) == Seq(0L, 1L, 2L))

    // the stream redelivers batch 2 (checkpoint never saw it finish),
    // then batch 3 arrives: replay rolls the torn v=2 back, recommits
    // it at v=2, and batch 3 lands at v=3 — consecutive, no burn
    ms.addData((4L, 4.5, "U"))
    CdcIngest.runAvailable(spark, stream, root, Seq("k"), "op", ck)
    ms.addData((1L, 0.0, "D"))
    CdcIngest.runAvailable(spark, stream, root, Seq("k"), "op", ck)
    assert(VersionedTable.versions(spark, root) == Seq(0L, 1L, 2L, 3L))
    assert(state(root) == Map(2L -> 2.0, 3L -> 3.0, 4L -> 4.5))

    // replaying with nothing new is still a no-op (marker monotonic)
    CdcIngest.runAvailable(spark, stream, root, Seq("k"), "op", ck)
    assert(VersionedTable.versions(spark, root) == Seq(0L, 1L, 2L, 3L))
  }
}
