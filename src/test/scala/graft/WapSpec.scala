package graft

import org.apache.spark.sql.DataFrame
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
}
