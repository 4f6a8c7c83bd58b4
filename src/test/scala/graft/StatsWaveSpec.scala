package graft

import org.apache.spark.sql.functions._
import graft.graph.Bfs
import graft.sim.Gram

/** Round-12 wave pins.
  *
  * The DuckDB gate already replays every new query end-to-end; what it
  * can NOT see is whether the Spark-side algebra equals the textbook
  * definition (a matching oracle only proves both engines run the same
  * formula). These tests re-derive the statistics from first
  * principles in plain Scala — brute-force tau/rho on the collected
  * binned pairs, hand-walked BFS hops, an O(n·d²) gram loop — and pin
  * the operators against them. */
class StatsWaveSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("Bfs.levels finds min-hop distances on a known graph") {
    // 1→2→3→4→5 path plus a shortcut 1→4 and an unreachable node 9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (8L, 9L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = Bfs.levels(edges, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L),
      s"got $got")
  }

  test("Bfs.levels short-circuits when the frontier empties") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Bfs.levels(edges, Seq(1L).toDF("node"), maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L))
  }

  test("Gram.upperTriangle equals the brute-force gram matrix") {
    val rnd = new scala.util.Random(7)
    val dim = 5
    val vecs = Seq.fill(40)(Array.fill(dim)(rnd.nextFloat() - 0.5f))
    val df = vecs.map(v => Tuple1(v)).toDF("embedding")
      .repartition(4) // exercise the partial-per-partition merge
    val got = Gram.upperTriangle(df, "embedding", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    for (i <- 0 until dim; j <- i until dim) {
      val want = vecs.map(v => v(i).toDouble * v(j).toDouble).sum
      assert(math.abs(got((i.toLong, j.toLong)) - want) < 1e-9,
        s"g($i,$j): got ${got((i.toLong, j.toLong))}, want $want")
    }
    assert(got.size == dim * (dim + 1) / 2)
  }

  test("binned Kendall tau-b and Spearman rho match brute force at sf0.001") {
    val pairs = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") / 5000).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    // brute-force tau-b over all O(n²) pairs (n ≈ 6k — fine in a test)
    var conc = 0L; var disc = 0L
    for (i <- pairs.indices; j <- (i + 1) until pairs.length) {
      val ((x1, y1), (x2, y2)) = (pairs(i), pairs(j))
      val sx = java.lang.Long.compare(x1, x2)
      val sy = java.lang.Long.compare(y1, y2)
      if (sx * sy > 0) conc += 1 else if (sx * sy < 0) disc += 1
    }
    val n = pairs.length.toLong
    val n0 = n * (n - 1) / 2.0
    val n1 = pairs.groupBy(_._1).values
      .map(g => g.length.toLong * (g.length - 1) / 2.0).sum
    val n2 = pairs.groupBy(_._2).values
      .map(g => g.length.toLong * (g.length - 1) / 2.0).sum
    val wantTau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))

    val gotK = queries.StatsQueries.xKendallTau(spark, sf).collect()(0)
    assert(gotK.getAs[Long]("concordant") == conc, "concordant mass")
    assert(gotK.getAs[Long]("discordant") == disc, "discordant mass")
    assert(math.abs(gotK.getAs[Double]("tau_b") - wantTau) < 1e-6)

    // brute-force Spearman: average ranks, Pearson on them
    def midranks(vs: Array[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lo = sorted.indexWhere(_ == v) + 1
        val hi = sorted.lastIndexWhere(_ == v) + 1
        v -> (lo + hi) / 2.0
      }.toMap
    }
    val rx = midranks(pairs.map(_._1))
    val ry = midranks(pairs.map(_._2))
    val xs = pairs.map(p => rx(p._1)); val ys = pairs.map(p => ry(p._2))
    val mx = xs.sum / n; val my = ys.sum / n
    val wantRho = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum /
      math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
        ys.map(b => (b - my) * (b - my)).sum)
    val gotRho = queries.StatsQueries.xSpearmanBinned(spark, sf)
      .collect()(0).getAs[Double]("rho_spearman")
    assert(math.abs(gotRho - wantRho) < 1e-6, s"rho: $gotRho vs $wantRho")
  }

  test("BH-adjusted p-values are valid (bounds, order, step-up shape)") {
    val rows = queries.StatsQueries.xFdrBh(spark, sf)
      .select("p_raw", "p_bh").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.nonEmpty)
    for ((p, bh) <- rows) {
      assert(bh >= p - 1e-12, s"adjusted below raw: $p -> $bh")
      assert(bh <= 1.0 + 1e-12)
    }
    // monotone: sorting by raw p must sort adjusted p too
    val byRaw = rows.sortBy(_._1).map(_._2)
    assert(byRaw.zip(byRaw.tail).forall { case (a, b) => a <= b + 1e-12 },
      "BH adjustment is not monotone in raw p")
  }

  test("Holt telescoped weights equal the unrolled recursion") {
    // run the TRUE recursion (l=b=0 before the first point) on unit
    // impulses: the state after j steps of zeros IS the lag-j weight
    val a = 0.5; val b = 0.3
    for (j <- 0 to 8) {
      var l = 0.0; var t = 0.0
      val xs = 1.0 +: Seq.fill(j)(0.0) // impulse, then j zeros
      for (x <- xs) {
        val l1 = a * x + (1 - a) * (l + t)
        val t1 = b * (l1 - l) + (1 - b) * t
        l = l1; t = t1
      }
      val (wl, wt) = queries.StatsQueries.holtWeights(j)
      assert(math.abs(wl - l) < 1e-15, s"level weight $j: $wl vs $l")
      assert(math.abs(wt - t) < 1e-15, s"trend weight $j: $wt vs $t")
    }
  }

  test("Markov stationary distribution matches driver-side power iteration") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nt", lead(col("event_type"), 1).over(w))
      .where(col("nt").isNotNull)
      .groupBy("event_type", "nt").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rowTot = trans.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._3).sum.toDouble }
    val p = trans.map { case (f, t, n) => (f, t) -> n / rowTot(f) }.toMap
    val states = (trans.map(_._1) ++ trans.map(_._2)).distinct.sorted
    var pi = states.map(_ -> 1.0 / states.size).toMap
    for (_ <- 1 to 6)
      pi = states.map(s => s -> trans.collect {
        case (f, t, _) if t == s => pi(f) * p((f, t))
      }.sum).toMap
    val z = pi.values.sum
    val got = queries.StatsQueries.xMarkovStationary(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (s <- states)
      assert(math.abs(got(s) - pi(s) / z) < 1e-6,
        s"pi($s): ${got(s)} vs ${pi(s) / z}")
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
  }

  test("decile lift table partitions the corpus and caps capture at 1") {
    val rows = queries.StatsQueries.xDecileLift(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L),
      "expected exactly deciles 0..9")
    val total = graft.core.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "decile counts must sum")
    // each decile holds ~N/10 (fine-bin quantization slack: a decile
    // boundary lands inside a bin, so a decile can be off by up to the
    // heaviest bin's mass — a few % of N at sf0.001's 1.5k rows)
    for (r <- rows)
      assert(math.abs(r.getLong(1) - total / 10.0) <= total * 0.03,
        s"decile ${r.getLong(0)} holds ${r.getLong(1)} of $total")
    val caps = rows.sortBy(_.getLong(0)).map(_.getAs[Double]("cum_capture"))
    assert(caps.zip(caps.tail).forall { case (x, y) => x <= y + 1e-12 })
    assert(math.abs(caps.last - 1.0) < 1e-9, "full capture at decile 9")
  }

  test("HLL estimate lands within the b=12 error budget on known cardinalities") {
    import graft.sketch.Hll
    for (n <- Seq(500, 20000)) {
      val df = spark.range(n.toLong).select(col("id").cast("string").as("v"))
      val est = Hll.estimate(Hll.registers(df, col("v")))
        .collect()(0).getDouble(0)
      // σ ≈ 1.04/√4096 ≈ 1.6%; allow 4σ plus linear-counting slack
      assert(math.abs(est - n) / n < 0.07, s"HLL($n) = $est")
    }
  }

  test("HLL registers merge by max (sketch of union = max of sketches)") {
    import graft.sketch.Hll
    val a = spark.range(0, 3000).select(col("id").cast("string").as("v"))
    val b = spark.range(2000, 6000).select(col("id").cast("string").as("v"))
    val merged = Hll.registers(a, col("v"))
      .unionByName(Hll.registers(b, col("v")))
      .groupBy("bucket").agg(max("maxrho").as("maxrho"))
    val whole = Hll.registers(a.unionByName(b), col("v"))
    val em = Hll.estimate(merged).collect()(0).getDouble(0)
    val ew = Hll.estimate(whole).collect()(0).getDouble(0)
    assert(em == ew, s"merged $em != whole $ew")
  }

  test("SAX words cover the full month with the fixed alphabet") {
    val rows = queries.StatsQueries.tsSax(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val word = r.getAs[String]("sax_word")
      assert(word.length == r.getAs[Long]("n_segments").toInt)
      assert(word.forall("abcd".contains(_)), s"alien symbol in $word")
    }
  }
}
