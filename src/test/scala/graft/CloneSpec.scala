package graft

import graft.core.GraftSession
import graft.etl.VersionedTable

/** Shallow clone: zero-copy read parity, independent evolution, and
  * the ownership contract (a clone's retention never touches source
  * data). */
class CloneSpec extends SparkSpecBase {

  private def state(root: String, asOf: Long): Map[Long, Double] =
    VersionedTable.readAsOf(spark, root, Seq("k"), asOf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def buildSrc(): String = {
    val s = spark
    import s.implicits._
    val root = GraftSession.scratch("clonespec-src") + "/tbl"
    VersionedTable.init(spark, root,
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v"))
    VersionedTable.commitUpsert(spark, root, Seq((2L, 20.0)).toDF("k", "v"))
    VersionedTable.commitDelete(spark, root, Seq(1L).toDF("k"))
    root
  }

  test("clone reads every version identically without copying a byte") {
    val src = buildSrc()
    val dst = GraftSession.scratch("clonespec-dst") + "/tbl"
    assert(VersionedTable.cloneShallow(spark, src, dst) == Seq(0L, 1L, 2L))
    (0L to 2L).foreach(v => assert(state(dst, v) == state(src, v), s"v=$v"))
    // zero-copy: the clone owns no data files yet
    assert(!new java.io.File(s"$dst/data").exists())
  }

  test("clone evolves independently; source never observes clone writes") {
    val s = spark
    import s.implicits._
    val src = buildSrc()
    val dst = GraftSession.scratch("clonespec-evolve") + "/tbl"
    VersionedTable.cloneShallow(spark, src, dst)
    VersionedTable.commitUpsert(spark, dst,
      Seq((3L, 30.0), (4L, 4.0)).toDF("k", "v"))
    assert(state(dst, 3L) == Map(2L -> 20.0, 3L -> 30.0, 4L -> 4.0))
    assert(VersionedTable.versions(spark, src) == Seq(0L, 1L, 2L))
    assert(state(src, 2L) == Map(2L -> 20.0, 3L -> 3.0))
  }

  test("expiring the clone drops only manifests — source data survives") {
    val s = spark
    import s.implicits._
    val src = buildSrc()
    val dst = GraftSession.scratch("clonespec-expire") + "/tbl"
    VersionedTable.cloneShallow(spark, src, dst)
    VersionedTable.compact(spark, dst, Seq("k"))                      // v3 owned
    val removed = VersionedTable.expire(spark, dst, keepFrom = 3L)
    assert(removed == Seq(0L, 1L, 2L))
    // the clone's head still answers (from its own compacted snapshot)
    assert(state(dst, 3L) == Map(2L -> 20.0, 3L -> 3.0))
    // and the SOURCE is fully intact: data dirs were borrowed, not owned
    (0L to 2L).foreach(v =>
      assert(state(src, v).nonEmpty || v == 9L, s"src v=$v unreadable"))
    assert(state(src, 1L) == Map(1L -> 1.0, 2L -> 20.0, 3L -> 3.0))
  }

  test("expiring the SOURCE orphans the clone's borrowed versions (documented hazard)") {
    val s = spark
    import s.implicits._
    val src = buildSrc()
    val dst = GraftSession.scratch("clonespec-hazard") + "/tbl"
    VersionedTable.cloneShallow(spark, src, dst)
    // give the source a snapshot so its early history can expire
    VersionedTable.compact(spark, src, Seq("k"))                      // src v3
    VersionedTable.expire(spark, src, keepFrom = 3L)                  // drops v0-v2
    // the clone's manifests still list the borrowed versions...
    assert(VersionedTable.versions(spark, dst) == Seq(0L, 1L, 2L))
    // ...but their data is gone: reads fail — exactly the contract
    // documented on cloneShallow (expire sources only past every
    // clone's horizon)
    VersionedTable.invalidateCache(spark, dst)
    intercept[Exception] { state(dst, 2L) }
  }

  test("cloning into a non-empty table is refused") {
    val src = buildSrc()
    intercept[IllegalArgumentException] {
      VersionedTable.cloneShallow(spark, src, src)
    }
  }
}
