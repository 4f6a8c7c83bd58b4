package graft

import org.apache.spark.sql.functions._
import graft.geo.Geo
import graft.ml.Featurize

/** Round-13 wave pins: geospatial grid operators, featurization, and
  * Theil–Sen. The DuckDB oracles replay each gate end-to-end; these
  * tests pin the Spark-side algebra against first principles — an
  * UNPRUNED all-pairs radius join (the one-ring losslessness proof,
  * exercised on data), a hand-computed haversine, brute-force hashing
  * vectors, a leave-fold-out encoding recomputed in plain Scala, and
  * the sequential Theil–Sen median-of-slopes. */
class GeoFeatSpec extends SparkSpecBase {
  import spark.implicits._

  // --- geo ---------------------------------------------------------

  test("haversine matches hand values (1 deg lat ~ 111.19 km; wrap-safe)") {
    val df = Seq((0.0, 0.0, 1.0, 0.0), (5.0, 17.9, 5.0, -17.9))
      .toDF("lat1", "lon1", "lat2", "lon2")
      .select(Geo.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("d"))
    val Array(oneDeg, wrap) = df.collect().map(_.getDouble(0))
    assert(math.abs(oneDeg - 111.19) < 0.01, s"1 deg lat = $oneDeg")
    // 35.8 deg of longitude at lat 5: NOT neighbors; sin(dlam/2) must
    // not alias it to 0.2 deg (it is 2pi-periodic, not linear)
    assert(wrap > 3900.0, s"wrap distance = $wrap")
  }

  test("radiusJoin (one-ring pruned) equals the unpruned all-pairs join") {
    val pts = Geo.points(
      spark.range(1, 2001).toDF("id"), "id", "cust")
    val probes = Geo.points(
      spark.range(1, 41).toDF("id"), "id", "site")
    val pruned = Geo.radiusJoin(pts, probes, 50.0)
      .select("probe_id", "id", "dist_km")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = pts.select(col("id"), col("lat"), col("lon"))
      .crossJoin(probes.select(col("id").as("probe_id"),
        col("lat").as("plat"), col("lon").as("plon")))
      .withColumn("dist_km",
        round(Geo.haversineKm(col("plat"), col("plon"), col("lat"), col("lon")), 4))
      .where(col("dist_km") <= 50.0)
      .select("probe_id", "id", "dist_km")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty, "degenerate test: no pairs within radius")
    assert(pruned == brute,
      s"pruned=${pruned.size} brute=${brute.size}; missing=${(brute -- pruned).take(5)}")
  }

  test("synthetic latitudes stay inside the one-ring proof band [-6, 6)") {
    val mm = Geo.points(spark.range(1, 5001).toDF("id"), "id", "x")
      .agg(min("lat"), max("lat"), min("lon"), max("lon"))
      .collect()(0)
    assert(mm.getDouble(0) >= -6.0 && mm.getDouble(1) < 6.0, s"lat range $mm")
    assert(mm.getDouble(2) >= -18.0 && mm.getDouble(3) < 18.0, s"lon range $mm")
  }

  // --- featurization ------------------------------------------------

  test("hashingTrick equals brute-force bucket counts and conserves mass") {
    val docs = Seq((1L, Seq("a", "b", "a", "c")), (2L, Seq("b", "b")),
      (3L, Seq.empty[String])).toDF("doc_id", "toks")
    val got = Featurize.hashingTrick(docs, "doc_id", col("toks"), 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def bucket(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("ht:" + t).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 16
    }
    val want = Seq(1L -> Seq("a", "b", "a", "c"), 2L -> Seq("b", "b"))
      .flatMap { case (d, ts) => ts.map(t => (d, bucket(t))) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want, s"got $got want $want")
    assert(got.values.sum == 6, "token mass not conserved")
  }

  test("targetEncodeOof: group-aware folds, leave-fold-out algebra") {
    val rows = (1L to 200L).map(i =>
      (i % 7, s"cat${i % 3}", (i % 11).toDouble)) // (user, cat, value)
    val df = rows.toDF("user_id", "event_type", "value")
    val got = Featurize.targetEncodeOof(df, "event_type", "value", "user_id",
        folds = 3, smoothing = 5.0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    def fold(u: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("fold:" + u).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 3
    }
    val tagged = rows.map { case (u, c, v) => (c, fold(u), v) }
    val prior = tagged.map(_._3).sum / tagged.size
    val want = tagged.groupBy(t => (t._1, t._2)).map { case ((c, f), g) =>
      val all = tagged.filter(_._1 == c)
      val nC = all.size.toDouble; val sC = all.map(_._3).sum
      val nCf = g.size.toDouble; val sCf = g.map(_._3).sum
      (c, f) -> (g.size.toLong,
        (sC - sCf + 5.0 * prior) / (nC - nCf + 5.0))
    }
    assert(got.keySet == want.keySet)
    for ((k, (n, e)) <- want) {
      assert(got(k)._1 == n, s"$k n")
      assert(math.abs(got(k)._2 - e) < 1e-9, s"$k enc got=${got(k)._2} want=$e")
    }
  }

  test("phoneticKey strips vowels after the first letter, RE2-safe") {
    val got = Seq("goldenrod", "a", "Aeiou", "lace")
      .toDF("w").select(Featurize.phoneticKey(col("w"))).as[String].collect()
    assert(got.toSeq == Seq("Gldnrd", "A", "A", "Lc"), got.toSeq.toString)
  }

  // --- privacy -------------------------------------------------------

  test("priv_k_anonymity equals a brute-force QI group audit on sf0.001") {
    val row = graft.queries.PrivacyQueries.privKAnonymity(spark, sfDir).collect()(0)
    val groups = graft.core.Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), math.floor(r.getDouble(2) / 1000.0)))
      .groupBy(identity).map(_._2.size.toLong).toSeq
    assert(row.getAs[Long]("n_groups") == groups.size.toLong)
    assert(row.getAs[Long]("n_rows") == groups.sum)
    assert(row.getAs[Long]("k_achieved") == groups.min)
    assert(row.getAs[Long]("groups_below_k") == groups.count(_ < 5).toLong)
    assert(row.getAs[Long]("rows_suppressed") == groups.filter(_ < 5).sum)
  }

  test("priv_dp_counts: noise is inverse-CDF Laplace of the salted uniform") {
    val rows = graft.queries.PrivacyQueries.privDpCounts(spark, sfDir).collect()
    val truth = graft.core.Tables.customer(spark, sfDir)
      .groupBy("c_nationkey").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    for (r <- rows) {
      val nk = r.getInt(0)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("dp:" + nk).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 1.152921504606846976e18
      val noise = -2.0 * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
      val want = truth(nk) + noise
      assert(math.abs(r.getDouble(1) - want) < 1e-5, s"nation $nk")
    }
  }

  // --- theil-sen -----------------------------------------------------

  test("x_mann_kendall equals the brute-force S statistic on sf0.001") {
    val row = graft.queries.StatsQueries.xMannKendall(spark, sfDir).collect()(0)
    val m = graft.core.Tables.orders(spark, sfDir)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("x"))
      .agg(sum("o_totalprice").as("y"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    val s = (for { i <- m.indices; j <- (i + 1) until m.size }
      yield math.signum(m(j)._2 - m(i)._2).toLong).sum
    val n = m.size.toDouble
    val z = (s - math.signum(s.toDouble)) / math.sqrt(n * (n - 1) * (2 * n + 5) / 18.0)
    assert(row.getAs[Long]("n_points") == m.size.toLong)
    assert(row.getAs[Long]("s_stat") == s, s"S ${row.getAs[Long]("s_stat")} vs $s")
    // the no-ties Var(S) form is only valid when the published tie
    // count is zero (r13 advice: make a violated assumption visible)
    assert(row.getAs[Long]("n_ties") == 0L)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-6)
  }

  test("x_isotonic equals the sequential PAV loop on sf0.001") {
    val rows = graft.queries.StatsQueries.xIsotonic(spark, sfDir).collect()
    // rebuild the bin table, then run the TRUE sequential
    // pool-adjacent-violators algorithm and compare fits
    val bins = rows.map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n").toDouble,
      r.getAs[Double]("frac_pos")))
    // PAV over (weight, mean) blocks
    case class Block(w: Double, s: Double) { def mean: Double = s / w }
    val stack = scala.collection.mutable.Stack[Block]()
    for ((_, w, frac) <- bins) {
      var blk = Block(w, frac * w)
      while (stack.nonEmpty && stack.top.mean >= blk.mean) {
        val t = stack.pop(); blk = Block(t.w + blk.w, t.s + blk.s)
      }
      stack.push(blk)
    }
    // expand block fits back to bins (blocks carry bin counts as weights)
    val perBin = {
      val out = scala.collection.mutable.ArrayBuffer[Double]()
      var idx = 0
      for (b <- stack.toSeq.reverse) {
        val nBins = {
          // count how many bins this block absorbed by matching weights
          var acc = 0.0; var k = 0
          while (acc < b.w - 1e-9) { acc += bins(idx + k)._2; k += 1 }
          k
        }
        for (_ <- 0 until nBins) out += b.mean
        idx += nBins
      }
      out.toSeq
    }
    assert(perBin.size == bins.length)
    for (((r, want), i) <- rows.zip(perBin).zipWithIndex) {
      val got = r.getAs[Double]("iso_fit")
      assert(math.abs(got - want) < 5e-6, s"bin $i: minimax=$got pav=$want")
    }
    // and the fit must be monotone non-decreasing
    val f = rows.map(_.getAs[Double]("iso_fit"))
    assert(f.zip(f.tail).forall { case (a, b) => a <= b + 1e-9 }, f.mkString(","))
  }

  test("x_theil_sen equals the sequential median-of-slopes on sf0.001") {
    val row = graft.queries.StatsQueries.xTheilSen(spark, sfDir).collect()(0)
    val m = graft.core.Tables.orders(spark, sfDir)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("x"))
      .agg(sum("o_totalprice").as("y"))
      .collect().map(r => (r.getInt(0).toLong, r.getDouble(1))).sortBy(_._1)
    def lowerMedian(xs: Seq[Double]): Double = xs.sorted.apply((xs.size + 1) / 2 - 1)
    val slopes = for {
      i <- m.indices; j <- (i + 1) until m.size
    } yield BigDecimal((m(j)._2 - m(i)._2) / (m(j)._1 - m(i)._1))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val slope = lowerMedian(slopes)
    val intercept = lowerMedian(m.toSeq.map { case (x, y) =>
      BigDecimal(y - slope * x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    })
    assert(row.getAs[Long]("n_points") == m.size.toLong)
    assert(row.getAs[Long]("n_pairs") == slopes.size.toLong)
    assert(row.getAs[Double]("slope") == slope,
      s"slope ${row.getAs[Double]("slope")} vs $slope")
    assert(row.getAs[Double]("intercept") == intercept,
      s"intercept ${row.getAs[Double]("intercept")} vs $intercept")
  }
}
