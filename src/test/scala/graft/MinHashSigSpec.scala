package graft

import graft.core.Tables
import graft.dedup.{MinHashLSH, Shingles}

class MinHashSigSpec extends SparkSpecBase {

  test("native MinHashSig kernel is bit-identical to the declarative path") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val ds = Shingles.docShingles(docs, "doc_id", "text", 3)
    val declarative = MinHashLSH.signatures(ds, "doc_id", 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = MinHashLSH.signaturesNative(ds, "doc_id", 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet == declarative.keySet)
    native.foreach { case (id, sig) =>
      assert(sig == declarative(id), s"doc $id signature mismatch")
    }
  }

  test("native SimHashSig kernel is bit-identical to the declarative path") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val ds = Shingles.docShingles(docs, "doc_id", "text", 3)
    val declarative = graft.dedup.SimHash.signatures(ds, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = graft.dedup.SimHash.signaturesNative(ds, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == declarative)
  }

  test("portable SimHashSig kernel is bit-identical to the declarative md5 path") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val ds = Shingles.docShingles(docs, "doc_id", "text", 3)
    val declarative = graft.dedup.SimHash.signaturesPortable(ds, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = ds.select(org.apache.spark.sql.functions.col("doc_id"),
        graft.plans.SimHashSig(
          org.apache.spark.sql.functions.col("shingles"), portable = true)
          .as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.nonEmpty && native == declarative)
  }

  test("native kernel: empty array yields all-MaxValue sentinel") {
    import spark.implicits._
    val df = Seq(Seq.empty[String], Seq("a b c")).toDF("shingles")
    val sigs = df.select(graft.plans.MinHashSig(
      org.apache.spark.sql.functions.col("shingles"), 4,
      MinHashLSH.Prime, MinHashLSH.permConsts(4)).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0).forall(_ == Long.MaxValue))
    assert(sigs(1).forall(_ != Long.MaxValue))
  }
}
