package graft

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.sim.{AnnIndex, KMeans, Similarity}

/** AnnIndex: the persisted IVF index must answer exactly like a
  * freshly built one, and the bucket-partitioned layout must let the
  * probe read prune unprobed bucket directories. */
class AnnIndexSpec extends SparkSpecBase {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val path = {
    val p = GraftSession.scratch("annidx-spec")
    AnnIndex.build(emb, "vec_id", "embedding", k = 16, iterations = 2, p)
    p
  }
  private def queries = emb.where(col("vec_id") >= 100 && col("vec_id") < 110)

  test("persisted index answers byte-identically to a fresh build") {
    val fresh = {
      val cents = KMeans.train(emb, "vec_id", "embedding", 16, 2)
      Similarity.Ivf.search(
        Similarity.Ivf.assign(emb, cents, "vec_id", "embedding"), cents,
        queries, "vec_id", "embedding", k = 5, nprobe = 4)
    }
    val saved = AnnIndex.search(spark, path, queries,
      "vec_id", "embedding", k = 5, nprobe = 4)
    val f = fresh.orderBy("query_id", "rank").collect().toSeq
    val s = saved.orderBy("query_id", "rank").collect().toSeq
    assert(f == s)
    assert(f.nonEmpty)
  }

  test("delete tombstones retire vectors from every search; rebuild clears them") {
    // own path: the shared `path` must stay tombstone-free for the
    // other tests
    val p = GraftSession.scratch("annidx-del-spec")
    AnnIndex.build(emb, "vec_id", "embedding", k = 16, iterations = 2, p)
    val before = AnnIndex.search(spark, p, queries,
      "vec_id", "embedding", k = 5, nprobe = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    val victims = before.take(3)
    AnnIndex.delete(spark, p,
      victims.toSeq.toDF_(spark, "vec_id"), "vec_id")
    val after = AnnIndex.search(spark, p, queries,
      "vec_id", "embedding", k = 5, nprobe = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !after.contains(v)),
      s"deleted ids still served: ${victims.intersect(after)}")
    assert(after.nonEmpty, "delete must not empty unrelated results")
    // deleting an unknown id is a no-op
    AnnIndex.delete(spark, p, Seq(-1L).toDF_(spark, "vec_id"), "vec_id")
    assert(AnnIndex.search(spark, p, queries, "vec_id", "embedding",
      k = 5, nprobe = 4).select("neighbor_id")
      .collect().map(_.getLong(0)).toSet == after)
    // a retrain is a fresh generation: tombstones are cleared
    AnnIndex.build(emb, "vec_id", "embedding", k = 16, iterations = 2, p)
    val rebuilt = AnnIndex.search(spark, p, queries,
      "vec_id", "embedding", k = 5, nprobe = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(rebuilt == before, "rebuild must serve the full corpus again")
  }

  private implicit class SeqToDf(s: Seq[Long]) {
    def toDF_(spark: org.apache.spark.sql.SparkSession,
              name: String): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      s.toDF(name)
    }
  }

  test("assignment is partitioned by bucket and the probe read prunes directories") {
    // layout: one directory per centroid bucket
    val dirs = new java.io.File(s"$path/assignment").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirs.count(_.startsWith("bucket=")) == 16, dirs.toString)
    // the probe plan must carry a partition filter on bucket (dynamic
    // partition pruning against the broadcast probe set), so only
    // ~nprobe of k directories are scanned at execution time
    val plan = AnnIndex.search(spark, path, queries,
        "vec_id", "embedding", k = 5, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the assignment scan:\n$plan")
  }

  test("append assigns against frozen centroids — equal to assigning all at once") {
    val p = GraftSession.scratch("annidx-append")
    val evens = emb.where(col("vec_id") % 2 === 0)
    val odds = emb.where(col("vec_id") % 2 === 1)
    AnnIndex.build(evens, "vec_id", "embedding", k = 16, iterations = 2, p)
    val before = AnnIndex.assignment(spark, p).count()
    AnnIndex.append(spark, p, odds, "vec_id", "embedding")
    // nothing lost, nothing re-assigned: grown index holds every vector once
    val grown = AnnIndex.assignment(spark, p)
    assert(grown.count() == emb.count())
    assert(grown.select("vec_id").distinct().count() == emb.count())
    assert(before < grown.count())
    // appended rows sit where a bulk assign against the SAME frozen
    // centroids would put them (append must not have retrained)
    val cents = AnnIndex.centroids(spark, p)
    val bulk = Similarity.Ivf.assign(emb, cents, "vec_id", "embedding")
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = grown.select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == bulk)
  }
}
