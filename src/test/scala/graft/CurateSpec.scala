package graft

import org.apache.spark.sql.functions._
import graft.curate.{Decontam, Packing, Sampling}

/** Curation ops: split stability, quota determinism, decontamination
  * correctness, next-fit packing invariants. */
class CurateSpec extends SparkSpecBase {

  test("hashSplit is a pure function of the id (stable across runs)") {
    val s = spark
    import s.implicits._
    val df = (0L until 200L).toDF("id")
    val once = Sampling.hashSplit(df, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val again = Sampling.hashSplit(df.repartition(7), "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once == again)
    // all three splits are populated and train dominates
    val dist = once.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(dist.keySet == Set("train", "val", "test"))
    assert(dist("train") > dist("val") && dist("train") > dist("test"))
  }

  test("perGroupQuota keeps at most quota rows per group, deterministically") {
    val s = spark
    import s.implicits._
    val df = (0L until 100L).map(i => (s"g${i % 3}", i)).toDF("g", "id")
    val a = Sampling.perGroupQuota(df, "g", "id", quota = 5)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    val b = Sampling.perGroupQuota(df.repartition(11), "g", "id", quota = 5)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
    assert(a.groupBy(_._1).values.forall(_.length == 5))
  }

  test("temperatureMix upweights rare sources and hits the target size") {
    val s = spark
    import s.implicits._
    // 900 common + 100 rare
    val df = ((0L until 900L).map(i => ("common", i)) ++
      (900L until 1000L).map(i => ("rare", i))).toDF("src", "id")
    val mixed = Sampling.temperatureMix(df, "src", "id",
      alpha = 0.5, totalTarget = 200)
    val bySrc = mixed.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt weighting: 30/(30+10) and 10/40 of 200 → 150 / 50
    assert(bySrc == Map("common" -> 150L, "rare" -> 50L))
    // rare share tripled vs its corpus share (10% → 25%)
    // determinism across partitionings
    val again = Sampling.temperatureMix(df.repartition(13), "src", "id",
      alpha = 0.5, totalTarget = 200)
      .orderBy("src", "id").collect().map(_.getLong(1)).toSeq
    assert(again == mixed.orderBy("src", "id").collect().map(_.getLong(1)).toSeq)
  }

  test("contaminated finds exactly the docs sharing an n-gram with bench") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),   // shares "quick brown fox"
      (2L, "totally unrelated text here"),
      (3L, "lazy dogs sleep all day long") // shares both bench 3-grams of doc 20
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "a quick brown fox runs"),
      (20L, "lazy dogs sleep all day")
    ).toDF("doc_id", "text")
    val out = Decontam.contaminated(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 1L), (3L, 3L)))
  }

  test("embeddingContaminated flags exactly the planted near-bench vectors") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),   // exact bench direction
      (2L, Seq(0.99, 0.14, 0.0)), // ~0.990 cosine to bench 1 — above τ
      (3L, Seq(0.0, 1.0, 0.0)),   // orthogonal
      (4L, Seq(-1.0, 0.0, 0.0)),  // opposite
      (5L, Seq(0.6, 0.0, 0.8))    // 0.6 cosine — below τ
    ).toDF("id", "vec")
    val bench = Seq(
      (10L, Seq(2.0, 0.0, 0.0))   // scaled copy of the x-axis
    ).toDF("id", "vec")
    val out = Decontam.embeddingContaminated(corpus, bench, "id", "vec", tau = 0.9)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((1L, 1L), (2L, 1L)))
    assert(out(0)._3 == 1.0)
    assert(out(1)._3 > 0.98 && out(1)._3 < 1.0)
  }

  test("embeddingContaminated never flags zero-norm vectors (NaN cosine guard)") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, Seq(0.0, 0.0, 0.0)),  // zero corpus vector: cosine is 0/0
      (2L, Seq(1.0, 0.0, 0.0))   // genuine match, must still flag
    ).toDF("id", "vec")
    val bench = Seq(
      (10L, Seq(0.0, 0.0, 0.0)), // zero bench vector too
      (11L, Seq(1.0, 0.0, 0.0))
    ).toDF("id", "vec")
    val out = Decontam.embeddingContaminated(corpus, bench, "id", "vec", tau = 0.9)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // without the isnan guard Spark's NaN-above-everything ordering
    // would flag ids 1 AND 2 against the zero bench vector
    assert(out.toSeq == Seq((2L, 1L)))
  }

  test("nextFitPack: exact next-fit bins on a single partition") {
    val s = spark
    import s.implicits._
    // budget 10: [4,5] closes at 9 (adding 3 would overflow), [3,7],
    // [12] oversized alone, [6,4] fills exactly, [2]
    val docs = Seq(4L, 5L, 3L, 7L, 12L, 6L, 4L, 2L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "toks")
      .coalesce(1)
    val bins = Packing.nextFitPack(docs, "id", "toks", budget = 10)
      .orderBy("bin").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getSeq[Long](3)))
    assert(bins.toSeq == Seq(
      (2, 9L, Seq(0L, 1L)), (2, 10L, Seq(2L, 3L)), (1, 12L, Seq(4L)),
      (2, 10L, Seq(5L, 6L)), (1, 2L, Seq(7L))))
  }

  test("nextFitPack invariants hold across partitions on real data") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(graft.dedup.Shingles.tokens(col("text"))).as("n_toks"))
      .repartition(8, col("doc_id")).sortWithinPartitions("doc_id")
    val nDocs = docs.count()
    val tokSum = docs.agg(sum("n_toks")).first().getLong(0)
    val bins = Packing.nextFitPack(docs, "doc_id", "n_toks", budget = 2048)
      .collect()
    // every doc lands in exactly one bin; token totals are preserved
    assert(bins.map(_.getInt(1).toLong).sum == nDocs)
    assert(bins.map(_.getLong(2)).sum == tokSum)
    assert(bins.map(_.getLong(0)).distinct.length == bins.length)
    // no multi-doc bin exceeds the budget
    assert(bins.filter(_.getInt(1) > 1).forall(_.getLong(2) <= 2048))
  }
}
