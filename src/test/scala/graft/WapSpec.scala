package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, lit}
import graft.core.GraftSession
import graft.etl.{Quality, VersionedTable, Wap}

/** Write-audit-publish: rejection leaves no trace, and the audit sees
  * the post-merge view (cross-batch violations), not just the batch. */
class WapSpec extends SparkSpecBase {

  private def freshTable(rows: Seq[(Long, String)]): String = {
    val s = spark
    import s.implicits._
    val root = GraftSession.scratch("wapspec") + "/tbl"
    VersionedTable.init(spark, root, rows.toDF("k", "u"))
    root
  }

  test("failing batch is rejected whole; state and history untouched") {
    val s = spark
    import s.implicits._
    val root = freshTable(Seq((1L, "a"), (2L, "b")))
    val out = Wap.ingest(spark, root,
      Seq((3L, null.asInstanceOf[String])).toDF("k", "u"), Seq("k"),
      m => Seq(Quality.complete(m, "u")))
    assert(out.committed.isEmpty)
    assert(out.report.exists(r => r._1 == "complete(u)" && !r._4))
    assert(VersionedTable.versions(spark, root) == Seq(0L))
    assert(VersionedTable.readLatest(spark, root, Seq("k")).count() == 2)
  }

  test("cross-batch violation is caught on the post-merge view") {
    val s = spark
    import s.implicits._
    val root = freshTable(Seq((1L, "a"), (2L, "b")))
    def audit(m: DataFrame) = Seq(Quality.unique(m, Seq("u")))
    // batch-locally unique, but "b" is already live under key 2
    val dup = Wap.ingest(spark, root,
      Seq((3L, "b")).toDF("k", "u"), Seq("k"), audit)
    assert(dup.committed.isEmpty, "post-merge duplicate slipped through")
    // same key UPDATE carrying the same value is fine (it shadows,
    // not duplicates) — the merge-on-read audit view must dedup by key
    val upd = Wap.ingest(spark, root,
      Seq((2L, "b")).toDF("k", "u"), Seq("k"), audit)
    assert(upd.committed.contains(1L))
    // and a genuinely fresh value lands
    val ok = Wap.ingest(spark, root,
      Seq((3L, "c")).toDF("k", "u"), Seq("k"), audit)
    assert(ok.committed.contains(2L))
    assert(VersionedTable.readLatest(spark, root, Seq("k")).count() == 3)
  }

  test("empty quarantine reads as an empty frame, not an exception") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.streaming.AuditedIngest
    // a healthy stream that never rejected anything: no _audit dir at
    // all — the normal production state must not throw
    val root = freshTable(Seq((1L, "a")))
    assert(AuditedIngest.quarantined(spark, root).count() == 0)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("u", StringType)))
    val typed = AuditedIngest.quarantined(spark, root, schema)
    assert(typed.schema == schema && typed.count() == 0)
    // _audit/quarantine existing but EMPTY (all batches replayed out)
    // must read the same way
    new java.io.File(AuditedIngest.quarantineDir(root)).mkdirs()
    assert(AuditedIngest.quarantined(spark, root).count() == 0)
    assert(AuditedIngest.replayAll(spark, root, Seq("k"),
      m => Seq(Quality.complete(m, "u")))(identity) == 0)
  }

  test("quarantine replay-after-fix lands the repaired batch and clears it") {
    val s = spark
    import s.implicits._
    import graft.streaming.AuditedIngest
    val root = freshTable(Seq((1L, "a"), (2L, "b")))
    def audit(m: DataFrame) = Seq(Quality.complete(m, "u"))
    // simulate a rejected batch sitting in quarantine under batch=7
    Seq((3L, null.asInstanceOf[String]), (4L, null.asInstanceOf[String]))
      .toDF("k", "u").write
      .parquet(s"${AuditedIngest.quarantineDir(root)}/batch=7")
    // a fix that still fails the audit leaves the quarantine untouched
    assert(!AuditedIngest.replay(spark, root, 7L, Seq("k"), audit)(identity))
    assert(AuditedIngest.quarantined(spark, root).count() == 2)
    assert(VersionedTable.versions(spark, root) == Seq(0L))
    // a real fix commits a version and empties the quarantine
    assert(AuditedIngest.replayAll(spark, root, Seq("k"), audit)(
      b => b.withColumn("u", coalesce(col("u"), lit("fixed")))) == 1)
    assert(AuditedIngest.quarantined(spark, root).count() == 0)
    assert(VersionedTable.versions(spark, root) == Seq(0L, 1L))
    assert(VersionedTable.readLatest(spark, root, Seq("k")).count() == 4)
  }
}
