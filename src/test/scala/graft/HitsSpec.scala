package graft

import org.apache.spark.sql.functions._
import graft.graph.Hits

/** Pins Hits.run's telescoped-normalization equivalence: running the
  * power iteration raw and L1-normalizing ONCE at the end must equal
  * the textbook normalize-every-half-step recursion (the scalar
  * factors cancel — that identity is what lets the loop body be one
  * join + one aggregate per half-step). The reference recursion is
  * replayed here in plain Scala on a small fixed digraph. */
class HitsSpec extends SparkSpecBase {
  import spark.implicits._

  test("telescoped HITS equals the step-normalized recursion") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (2L, 4L))
    val df = edges.toDF("src", "dst")
    val got = Hits.run(df, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap

    // reference: normalize after every half-step
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = Map.empty[Long, Double]
    for (_ <- 1 to 2) {
      val rawA = nodes.map(n =>
        n -> edges.filter(_._2 == n).map(e => hub(e._1)).sum).toMap
      val sa = rawA.values.sum
      auth = rawA.map { case (k, v) => k -> v / sa }
      val rawH = nodes.map(n =>
        n -> edges.filter(_._1 == n).map(e => auth(e._2)).sum).toMap
      val sh = rawH.values.sum
      hub = rawH.map { case (k, v) => k -> v / sh }
    }
    for (n <- nodes) {
      assert(math.abs(got(n)._1 - auth(n)) < 1e-12,
        s"auth($n): got ${got(n)._1}, want ${auth(n)}")
      assert(math.abs(got(n)._2 - hub(n)) < 1e-12,
        s"hub($n): got ${got(n)._2}, want ${hub(n)}")
    }
    // a node never cited (only cites) must carry authority exactly 0
    val df2 = Seq((9L, 1L), (1L, 2L)).toDF("src", "dst")
    val m = Hits.run(df2, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(9L) == 0.0)
  }
}
