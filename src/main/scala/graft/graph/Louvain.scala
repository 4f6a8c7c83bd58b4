package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One synchronous Louvain sweep from singleton communities — the
  * modularity-greedy step between [[LabelProp]] (no objective) and a
  * full multi-level Louvain (inherently sequential; Blondel et al.
  * 2008 §2). With every community a singleton, the gain of moving
  * node i into neighbor j's community reduces to the closed form
  *
  *   ΔQ(i→j) = w_ij/m − k_i·k_j/(2m²)
  *
  * (k = weighted degree, m = total undirected weight), so one sweep
  * is: every node adopts the POSITIVE-gain argmax neighbor
  * simultaneously, ties broken by the smaller neighbor id — the
  * synchronous total-order discipline that makes the sweep
  * oracle-replayable, exactly the LabelProp rationale (the classic
  * asynchronous sweep is visit-order-dependent and unverifiable).
  *
  * Execution shape: degrees are ONE keyed aggregation of the edge
  * list; the gain table is the edge list joined twice to the V-row
  * degree table (keyed equi-joins); the per-node argmax is a
  * max(struct) aggregation (partial, map-side — no window, no sort);
  * the modularity audit is two more keyed aggregations (intra-weight
  * per community via an assignment join, degree mass per community).
  * Nothing is ∝ V² and nothing sorts the edge list at any scale.
  */
object Louvain {

  /** Community assignment after one synchronous singleton sweep over
    * a SYMMETRIC weighted edge list (both directions present).
    * Output: (node, community) — community is the ORIGINAL id of the
    * adopted neighbor (or the node itself when no positive gain).
    * Gains are rounded to 8 dp before the argmax so engines agree. */
  def sweep(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src").as("node"))
      .agg(sum("w").as("k"))
    val m = deg.agg((sum("k") / 2.0).as("m"))
    val gains = edges
      .join(deg.select(col("node").as("src"), col("k").as("ki")), "src")
      .join(deg.select(col("node").as("dst"), col("k").as("kj")), "dst")
      .crossJoin(broadcast(m))
      .select(col("src"),
        col("dst"),
        round(col("w") / col("m")
          - (col("ki") * col("kj")) / (lit(2.0) * col("m") * col("m")), 8)
          .as("gain"))
    // argmax as max(struct(gain, -dst)): partial-aggregable, ties to
    // the smallest neighbor id (the Ivf.assign discipline)
    val best = gains.groupBy("src")
      .agg(max(struct(col("gain"), (-col("dst")).as("nd"))).as("b"))
      .select(col("src").as("node"),
        when(col("b.gain") > 0, -col("b.nd")).otherwise(col("src"))
          .as("community"))
    best
  }

  /** Newman modularity of an assignment over the same symmetric edge
    * list: Q = Σ_c [ W_c/(2m) − (K_c/(2m))² ], W_c counting BOTH
    * directions of intra-community weight. Exact-integer masses in
    * doubles; the community-sum order is normalized by rounding. */
  def modularity(edges: DataFrame, assign: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src").as("node")).agg(sum("w").as("k"))
    val m2 = deg.agg(sum("k").as("m2")) // = 2m
    val intra = edges
      .join(assign.select(col("node").as("src"), col("community").as("cs")),
        "src")
      .join(assign.select(col("node").as("dst"), col("community").as("cd")),
        "dst")
      .where(col("cs") === col("cd"))
      .groupBy(col("cs").as("community")).agg(sum("w").as("wc"))
    val mass = deg.join(assign, "node")
      .groupBy("community").agg(sum("k").as("kc"),
        count(lit(1)).as("n_nodes"))
    mass.join(intra, Seq("community"), "left")
      .na.fill(0.0, Seq("wc"))
      .crossJoin(broadcast(m2))
      .select(col("community"), col("n_nodes"),
        (col("wc") / col("m2")
          - (col("kc") / col("m2")) * (col("kc") / col("m2"))).as("q_term"))
  }
}
