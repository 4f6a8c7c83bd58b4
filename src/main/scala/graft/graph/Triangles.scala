package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting + global clustering coefficient — the standard
  * graph-cohesion statistics (spam/link-farm detection over crawl
  * graphs, community density for corpus-source QA).
  *
  * Degree-ordered orientation: every undirected edge {a,b} is directed
  * from its lower-(degree, id) endpoint to the higher one, turning the
  * graph into a DAG in which each triangle {x,y,z} (rank order) is
  * counted exactly once, as wedge x→y, x→z closed by edge y→z. The
  * orientation is the whole scale story: out-degree in the oriented
  * graph is bounded by O(√E) (a node of degree d only keeps out-edges
  * to HIGHER-degree neighbors, of which there are at most ~√(2E)), so
  * the wedge self-join — the only quadratic-looking step — generates
  * Σ outdeg² = O(E^1.5) candidates worst-case instead of Σ deg²,
  * which a single skewed hub would otherwise drive to E². All three
  * steps are plain keyed shuffles (degree agg, wedge join on the
  * common source, closure join on the (y,z) pair); nothing is
  * collected, no windows over the full graph.
  */
object Triangles {

  /** One-row stats for an edge list given as (a, b) pairs: direction
    * and duplicates are ignored, self-loops dropped. Returns
    * (n_triangles, n_wedges, clustering) where n_wedges = Σ d(d−1)/2
    * over plain degrees and clustering = 3·triangles / wedges (the
    * transitivity ratio; 0 when the graph has no wedges). */
  def stats(pairs: DataFrame): DataFrame = {
    val und = pairs
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    // orient each edge toward the higher (degree, id); carry the
    // out-endpoint's degree so the wedge join can order its two legs
    // without a global rank (a row_number over all nodes would funnel
    // V rows through one partition)
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
    // wedges at the lowest-ranked corner, legs ordered by (deg, id)
    val e1 = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val e2 = oriented.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = e1.join(e2, Seq("u"))
      .where(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("x"), col("y"))
    val tri = wedges
      .join(oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      .agg(count(lit(1)).as("n_triangles"))
    // per-node wedge count stays integral (d(d−1) is even; integer
    // halving per term, then a long sum — no float accumulation)
    val wedgeTotal = deg
      .agg(sum(((col("d") * (col("d") - 1)) / lit(2)).cast("long"))
        .as("n_wedges"))
    tri.crossJoin(broadcast(wedgeTotal))
      .select(col("n_triangles"), col("n_wedges"),
        when(col("n_wedges") === 0, lit(0.0))
          .otherwise(round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .as("clustering"))
  }

  /** LOCAL clustering coefficient per node: (id, degree, n_triangles,
    * coeff = 2·t / (d·(d−1))) for every node with degree ≥ 2 (the
    * coefficient is undefined below). Same degree-ordered O(E^1.5)
    * enumeration as [[stats]] — each triangle found once, then its
    * THREE corners exploded map-side and counted per node, so the
    * per-node redistribution adds one keyed aggregate over 3T rows,
    * never a second wedge pass. Nodes in no triangle get coeff 0 via
    * the left join (absence of evidence is a 0 coefficient, not a
    * dropped row). */
  def perNode(pairs: DataFrame): DataFrame = {
    val und = pairs
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
    val e1 = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val e2 = oriented.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = e1.join(e2, Seq("u"))
      .where(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("u"), col("x"), col("y"))
    val triCorners = wedges
      .join(oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      .select(explode(array(col("u"), col("x"), col("y"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    deg.where(col("d") >= 2)
      .join(triCorners, Seq("id"), "left")
      .select(col("id"), col("d").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        round(lit(2.0) * coalesce(col("n_triangles"), lit(0L))
          / (col("d") * (col("d") - 1)), 6).as("coeff"))
  }
}
