package graft

import org.apache.spark.sql.functions._
import graft.dedup.{MinHashLSH, Shingles}

/** Skew gates for the LSH family: a corpus where one key is degenerate
  * (1200 byte-identical docs/payloads/embeddings — the boilerplate-mass
  * shape that makes uncapped bucket self-joins quadratic). Each path
  * must (a) form NO pairs from the degenerate mass (the cap excludes
  * it) and (b) still find the genuinely duplicated planted pair — so
  * the candidate volume is provably bounded by the cap, not by the
  * skew. */
class SkewRobustnessSpec extends SparkSpecBase {
  import spark.implicits._

  private val massText =
    "the same boilerplate footer text repeated on every single page of the crawl"
  private val pairText =
    "a genuinely duplicated document that appears exactly twice in the corpus today"

  test("minhash LSH skips the degenerate bucket but keeps true pairs") {
    val docs = ((0L until 1200L).map(i => (i, massText)) ++
      Seq((2000L, pairText), (2001L, pairText))).toDF("doc_id", "text")
    val ds = Shingles.docShingles(docs, "doc_id", "text", 3)
    val sigs = MinHashLSH.signaturesNative(ds, "doc_id", 64)
    val cands = MinHashLSH.candidatePairs(sigs, "doc_id", 16, 64,
        maxBucketSize = 1000)
      .as[(Long, Long)].collect().toSet
    assert(cands == Set((2000L, 2001L)),
      s"degenerate mass must not form pairs: got ${cands.size} candidates")
  }

  test("phash banding skips identical-payload mass but keeps true pairs") {
    val rows = ((0L until 1200L).map(i => (i, massText)) ++
      Seq((2000L, pairText), (2001L, pairText))).toDF("doc_id", "text")
    val payloads = rows.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))
    val sigs = graft.multimodal.Phash.signatures(payloads)
    val pairs = graft.multimodal.Phash.nearPairs(sigs, maxHamming = 3,
        maxBucketSize = 1000)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2000L, 2001L)),
      s"expected only the planted pair, got ${pairs.take(5)} (${pairs.size})")
  }

  test("semdedup excludes the degenerate sub-bucket, keeps the planted dup") {
    val rnd = new scala.util.Random(7)
    def randVec(): Seq[Float] = Seq.fill(16)(rnd.nextFloat() * 2 - 1)
    val mass = randVec()
    val dup = randVec()
    val rows = ((0L until 1200L).map(i => (i, mass)) ++
      (2000L until 2020L).map(i => (i, randVec())) ++
      Seq((3000L, dup), (3001L, dup.map(_ * 2f): Seq[Float])))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val pairs = graft.sim.SemDedup.cappedPairs(rows, "vec_id", "embedding",
        k = 4, iterations = 2, tau = 0.99, maxBucketSize = 100)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((3000L, 3001L)),
      s"expected only the planted pair, got ${pairs.take(5)} (${pairs.size})")
  }
}
