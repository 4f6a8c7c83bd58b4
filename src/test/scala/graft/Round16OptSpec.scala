package graft

import org.apache.spark.sql.functions._

/** Round-16 optimization pins: every optimization that changed an
  * operator's INTERNALS gets a behavioral test proving the rewrite is
  * output-identical to the shape it replaced.
  */
class Round16OptSpec extends SparkSpecBase {
  import spark.implicits._

  /** Modularity read off a CONTRACTED graph must equal modularity
    * computed on the original edges — the identity the r16
    * graphLouvainMultilevel rewrite leans on (contraction preserves
    * m2, K_c and the intra self-loop mass W_c; integer-valued weights
    * make the double sums exact). Checked on the planted-clique
    * fixture for BOTH levels. */
  test("contracted-graph modularity equals original-edge modularity") {
    val cliqueA = Seq(1L, 2L, 3L, 4L)
    val cliqueB = Seq(11L, 12L, 13L, 14L)
    def clique(ns: Seq[Long]) =
      for { a <- ns; b <- ns if a != b } yield (a, b, 1.0)
    val edges = (clique(cliqueA) ++ clique(cliqueB) ++
      Seq((4L, 11L, 1.0), (11L, 4L, 1.0)))
      .toDF("src", "dst", "w")

    import graft.graph.Louvain
    val a1 = Louvain.sweep(edges)
    val sup = Louvain.contract(edges, a1)

    def fromOriginal(assign: org.apache.spark.sql.DataFrame)
        : (Long, Double) = {
      val t = Louvain.modularity(edges, assign)
        .agg(count(lit(1)), sum("q_term")).collect()(0)
      (t.getLong(0), t.getDouble(1))
    }
    def fromContracted(g: org.apache.spark.sql.DataFrame)
        : (Long, Double) = {
      val deg = g.groupBy(col("src").as("community"))
        .agg(sum("w").as("kc"))
      val m2 = deg.agg(sum("kc").as("m2"))
      val selfw = g.where(col("src") === col("dst"))
        .select(col("src").as("community"), col("w").as("wc"))
      val t = deg.join(selfw, Seq("community"), "left")
        .na.fill(0.0, Seq("wc"))
        .crossJoin(broadcast(m2))
        .agg(count(lit(1)), sum(col("wc") / col("m2")
          - (col("kc") / col("m2")) * (col("kc") / col("m2"))))
        .collect()(0)
      (t.getLong(0), t.getDouble(1))
    }

    val (n1o, q1o) = fromOriginal(a1)
    val (n1c, q1c) = fromContracted(sup)
    assert(n1c == n1o, s"level-1 community count $n1c != $n1o")
    assert(q1c == q1o, s"level-1 modularity $q1c != $q1o (must be exact)")

    // level 2: composed assignment on original edges vs the doubly-
    // contracted graph
    val a2 = Louvain.sweep(sup)
    val sup2 = Louvain.contract(sup, a2)
    val composed = a1.select(col("node"), col("community").as("__c"))
      .join(a2.select(col("node").as("__c"), col("community")), "__c")
      .select("node", "community")
    val (n2o, q2o) = fromOriginal(composed)
    val (n2c, q2c) = fromContracted(sup2)
    assert(n2c == n2o, s"level-2 community count $n2c != $n2o")
    assert(q2c == q2o, s"level-2 modularity $q2c != $q2o (must be exact)")
  }

  /** The synthetic payload generators repartition the id list to core
    * count before the encode map (single-row-group testdata otherwise
    * serializes the codec work on one task). The repartition must not
    * change WHAT is generated — same (doc_id, payload) set — and must
    * actually widen the stage. */
  test("payload generators parallelize without changing content") {
    val ids = spark.range(0, 40).select(col("id").as("doc_id"))
      .coalesce(1)
    val out = graft.multimodal.SyntheticImages.withPngPayload(ids)
    assert(out.rdd.getNumPartitions > 1,
      "payload generation still single-partition")
    val got = out.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(got.keySet == (0L until 40L).toSet)
    // content identical to a direct single-threaded encode
    (0L until 40L).foreach { id =>
      val direct = graft.multimodal.SyntheticImages.withPngPayload(
        spark.range(id, id + 1).select(col("id").as("doc_id")))
        .collect()(0).getAs[Array[Byte]](1).toSeq
      assert(got(id) == direct, s"payload for id $id differs")
    }
  }
}
