package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.curate.Sampling
import graft.dedup.ExactDedup
import graft.text.HashedClassifier

/** Hashed linear classifier, leakage-safe cluster split, and the
  * Bloom-prefilter incremental dedup path. */
class ClassifierClusterSplitSpec extends SparkSpecBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("HashedClassifier.score matches an independent reference computation") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "Alpha beta gamma"), (2L, "delta delta"),
      (3L, "x")).toDF("doc_id", "text")
    val got = HashedClassifier.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def expected(text: String): Double = {
      val toks = text.trim.toLowerCase.split("\\s+")
      val mean = toks.map { t =>
        (Integer.parseInt(md5hex(t).take(2), 16) - 128) / 256.0
      }.sum / toks.length
      BigDecimal(1.0 / (1.0 + math.exp(-mean)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for ((id, text) <- Seq(1L -> "Alpha beta gamma", 2L -> "delta delta",
        3L -> "x"))
      assert(got(id) == expected(text), s"doc $id")
  }

  test("classifier plan broadcasts the weight table and never sorts") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = HashedClassifier.score(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("clusterSafeSplit puts every member of a near-dup cluster in one split") {
    val s = spark
    import s.implicits._
    // chain 1-2-3 forms one cluster; 10 and 11 are singletons
    val docs = Seq(1L, 2L, 3L, 10L, 11L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster")
    val out = Sampling.clusterSafeSplit(docs, "doc_id", clusters)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Set(out(1L), out(2L), out(3L)).size == 1,
      "cluster members split apart: " + out)
    // singletons degrade to plain hashSplit of their own id
    val plain = Sampling.hashSplit(Seq(10L, 11L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(10L) == plain(10L) && out(11L) == plain(11L))
  }

  test("dedupAgainstBloom is identical to the plain anti-join, even at fpp 0.5") {
    val s = spark
    import s.implicits._
    val seen = (0L until 200L).map(i => (i, s"seen doc number $i"))
      .toDF("id", "text")
    val fresh = ((0L until 50L).map(i => (1000 + i, s"seen doc number ${i * 4}")) ++
      (0L until 100L).map(i => (2000 + i, s"fresh doc number $i")))
      .toDF("id", "text")
    val plain = ExactDedup.dedupAgainst(fresh, seen, "text")
      .select("id").as[Long].collect().toSet
    // high fpp forces genuine false positives through the verify join
    val bloom = ExactDedup.dedupAgainstBloom(fresh, seen, "text", fpp = 0.5)
      .select("id").as[Long].collect().toSet
    assert(bloom == plain)
    assert(plain == (0L until 100L).map(2000 + _).toSet)
  }
}
