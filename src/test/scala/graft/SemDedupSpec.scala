package graft

import org.apache.spark.sql.functions._
import graft.sim.SemDedup

class SemDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  test("exact duplicate vectors collapse to the lowest id") {
    val base = (0L until 8L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1))
    }
    // 100 & 101 duplicate vector 3's direction exactly (scaled: same cosine)
    val dups = Seq((100L, base(3)._2.map(_ * 2f): Seq[Float]),
      (101L, base(3)._2))
    val emb = vecs(base ++ dups: _*)
    val out = SemDedup.survivors(emb, "vec_id", "embedding",
        k = 4, iterations = 2, tau = 0.999)
      .as[(Long, Int)].collect().toMap
    assert(out.contains(3L), "lowest id of the duplicate set survives")
    assert(!out.contains(100L) && !out.contains(101L),
      s"higher-id duplicates must drop, got ${out.keySet}")
    assert(out.size == 8, "only the two injected dups are dropped")
  }

  test("orthogonal vectors all survive at a high threshold") {
    val emb = vecs((0L until 6L).map { i =>
      (i, (0 until 8).map(d => if (d == i.toInt) 1f else 0f).toSeq)
    }: _*)
    val out = SemDedup.survivors(emb, "vec_id", "embedding",
      k = 2, iterations = 1, tau = 0.9)
    assert(out.count() == 6)
  }
}
