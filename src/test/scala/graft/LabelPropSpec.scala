package graft

import org.apache.spark.sql.functions._
import graft.graph.LabelProp

/** Synchronous label propagation on graphs whose community structure
  * is hand-computable, plus the tie-order contract that makes the
  * operator deterministic (and therefore oracle-able). */
class LabelPropSpec extends SparkSpecBase {

  private def sym(pairs: Seq[(Long, Long, Double)]) = {
    val s = spark
    import s.implicits._
    (pairs ++ pairs.map { case (a, b, w) => (b, a, w) })
      .toDF("src", "dst", "w")
  }

  test("two disjoint triangles converge to two communities") {
    val edges = sym(Seq(
      (1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0),
      (7L, 8L, 1.0), (8L, 9L, 1.0), (7L, 9L, 1.0)))
    val labels = LabelProp.run(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // within a triangle every node sees the same two neighbor labels
    // each round; the min-label tie-break pulls all three to the
    // component minimum
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L), labels.toString)
  }

  test("max-weight label wins over the min-label tie-break") {
    // node 3's neighbors: 1 (w=10) and 2 (w=1) — after one round it
    // must carry label 1's weight-dominant label even though labels
    // tie at count 1 each and 1 < 2 would also pick 1; flip the
    // weights to make the ORDER the deciding factor
    val edges = sym(Seq((1L, 3L, 1.0), (2L, 3L, 10.0)))
    val labels = LabelProp.run(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(3L) == 2L, s"weight should beat label order: $labels")
  }

  test("ties on weight break to the smallest label") {
    val edges = sym(Seq((5L, 3L, 2.0), (4L, 3L, 2.0)))
    val labels = LabelProp.run(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(3L) == 4L, s"tie must break to min label: $labels")
  }

  test("updates are synchronous: round n reads only round n-1 labels") {
    // path 1-2-3: after ONE synchronous round labels are (2,1,2) —
    // node 2 adopts min neighbor label 1, nodes 1 and 3 adopt 2's OLD
    // label 2 (an asynchronous sweep could give 3 label 1 instead)
    val edges = sym(Seq((1L, 2L, 1.0), (2L, 3L, 1.0)))
    val labels = LabelProp.run(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 2L, 2L -> 1L, 3L -> 2L), labels.toString)
  }

  test("output covers every node exactly once") {
    val edges = sym(Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (4L, 5L, 3.0)))
    val out = LabelProp.run(edges, iters = 2)
    assert(out.groupBy("node").count().where(col("count") > 1).isEmpty)
    assert(out.count() == 5)
  }
}
