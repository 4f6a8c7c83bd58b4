package graft

import org.apache.spark.sql.functions._

/** Round-15 third-wave pins: first-principles fixtures for the five
  * wave-D operators (Shapley attribution, Getis–Ord Gi*, power
  * analysis, overdispersion, burstiness). */
class Round15cSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val baseTs = java.sql.Timestamp.valueOf("2024-06-01 09:00:00")
  private def ts(offsetDays: Int, i: Int) =
    new java.sql.Timestamp(baseTs.getTime + offsetDays * 86400000L + i)

  test("Shapley attribution: single-channel fixture gets ALL the credit, and the conservation law holds") {
    // 10 users exposed only to 'view' who all convert; 10 users
    // exposed only to 'click' who never convert. v is monotone
    // (subset-sum), so view's marginal is the full 10 in EVERY
    // coalition => phi_view = 10 exactly; every other channel = 0.
    val rows =
      (1L to 10L).flatMap(u => Seq(
        (u * 10, ts(0, u.toInt), u, "view", 1.0, "{}"),
        (u * 10 + 1, ts(1, u.toInt), u, "purchase", 1.0, "{}"))) ++
        (11L to 20L).map(u => (u * 10, ts(0, u.toInt), u, "click", 1.0, "{}"))
    val dir = tmpDir("graft-shap-")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.AnalyticsQueries
      .xShapleyAttribution(spark, dir).collect()
    val phi = out.map(r => r.getString(0) -> r.getAs[Double]("shapley")).toMap
    assert(phi("view") == 10.0, phi.toString)
    assert(phi("click") == 0.0 && phi("error") == 0.0 && phi("signup") == 0.0)
    assert(out.head.getAs[Long]("total_conversions") == 10L)
    assert(out.head.getAs[Long]("baseline_conversions") == 0L)
    // conservation on REAL data: sum(phi) = v(full) - v(empty), up to
    // the 6dp rounding of four addends
    val real = graft.queries.AnalyticsQueries
      .xShapleyAttribution(spark, sfDir).collect()
    val total = real.head.getAs[Long]("total_conversions")
    val base = real.head.getAs[Long]("baseline_conversions")
    val sumPhi = real.map(_.getAs[Double]("shapley")).sum
    assert(math.abs(sumPhi - (total - base)) < 1e-4,
      s"conservation broken: $sumPhi vs ${total - base}")
  }

  test("Gi* hotspots: ring sizes honor the grid topology and the ranking is sound") {
    val out = graft.queries.GeoQueries.geoHotspots(spark, sfDir)
      .collect()
    assert(out.length == 20)
    // longitude wraps, latitude clips: interior cells see 9 neighbors,
    // the two latitude edge rows see 6 — nothing else is possible
    out.foreach { r =>
      val w = r.getAs[Long]("w_neighbors")
      val y = r.getAs[Long]("cell_y")
      if (y == 0 || y == 11) assert(w == 6L, r.toString)
      else assert(w == 9L, r.toString)
    }
    val gis = out.map(_.getAs[Double]("gi_star"))
    assert(gis.sliding(2).forall(w => w(1) <= w(0)), "not sorted desc")
    assert(gis.head > 0.0, "top hotspot should sit above the mean")
  }

  test("power analysis sizes the experiment from the emitted statistics") {
    val r = graft.queries.StatsQueries.xPowerAnalysis(spark, sfDir)
      .collect()(0)
    val sigma2 = r.getAs[Double]("sigma2_pooled")
    val mde = r.getAs[Double]("mde")
    val n = r.getAs[Long]("n_required_per_arm")
    // events value ~ U-ish with sd ~49 at every SF (driver synthetic);
    // the pooled variance must sit in that neighborhood
    assert(sigma2 > 1000 && sigma2 < 5000, s"sigma2 $sigma2")
    // closed form recomputed from the emitted (rounded) stats — ceil
    // boundary tolerance of 1
    val za = 1.959963985; val zb = 0.8416212336
    val expected = math.ceil(2.0 * sigma2 * math.pow(za + zb, 2)
      / (mde * mde)).toLong
    assert(math.abs(n - expected) <= 1, s"n $n vs $expected")
    assert(n > 0)
  }

  test("overdispersion flags a bursty series and stays quiet on a constant one") {
    // 'steady': exactly 10 events/day for 20 days (VMR = 0);
    // 'bursty': 1/day for 19 days then 181 on day 20 (VMR >> 1.5)
    val steady = for (d <- 0 until 20; i <- 1 to 10)
      yield ((d * 100 + i).toLong, ts(d, i), 1L, "steady", 1.0, "{}")
    val bursty = (0 until 19).map(d =>
      ((10000 + d).toLong, ts(d, 50), 2L, "bursty", 1.0, "{}")) ++
      (1 to 181).map(i => ((20000 + i).toLong, ts(19, i), 2L, "bursty", 1.0, "{}"))
    val dir = tmpDir("graft-vmr-")
    (steady ++ bursty)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.StatsQueries.xOverdispersion(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("steady").getAs[Double]("vmr") == 0.0)
    assert(!out("steady").getAs[Boolean]("overdispersed"))
    assert(out("bursty").getAs[Double]("vmr") > 100.0,
      out("bursty").toString)
    assert(out("bursty").getAs[Boolean]("overdispersed"))
    assert(out("bursty").getAs[Long]("n_events") == 200L)
  }

  test("QTE is zero at every quantile on a constant outcome, sane on real data") {
    val rows = (1L to 400L).map(k => (k, "O", 5000.0, "1-URGENT"))
    val dir = tmpDir("graft-qte-")
    rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val flat = graft.queries.StatsQueries.xQte(spark, dir).collect()
    assert(flat.length == 5)
    flat.foreach { r =>
      assert(r.getAs[Long]("qte") == 0L, r.toString)
      assert(r.getAs[Long]("quantile_control") == 5000L)
    }
    // real data: quantiles are nondecreasing in q within each arm and
    // the hash arms are exchangeable, so |qte| stays a small fraction
    // of the quantile itself
    val real = graft.queries.StatsQueries.xQte(spark, sfDir)
      .orderBy("q").collect()
    val qc = real.map(_.getAs[Long]("quantile_control"))
    val qt = real.map(_.getAs[Long]("quantile_treated"))
    assert(qc.sliding(2).forall(w => w(1) >= w(0)))
    assert(qt.sliding(2).forall(w => w(1) >= w(0)))
    real.foreach { r =>
      assert(math.abs(r.getAs[Long]("qte")) <
        r.getAs[Long]("quantile_control") / 2, r.toString)
    }
  }

  test("ESD unmasks a second outlier a single-pass z-score would hide") {
    val rows = (0 until 30).flatMap { day =>
      val v = if (day == 28) 1000.0 else if (day == 29) 900.0
              else 10.0 + (day % 3)
      Seq(((day * 10 + 1).toLong, ts(day, 1), 1L, "view", v, "{}"))
    }
    val dir = tmpDir("graft-esd-")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.StatsQueries.xEsdAnomalies(spark, dir)
      .orderBy("d").collect()
    assert(out.length == 30)
    assert(out(28).getAs[Int]("removed_round") == 1, out(28).toString)
    assert(out(29).getAs[Int]("removed_round") == 2, out(29).toString)
    assert(out.take(28).forall(_.getAs[Int]("removed_round") == 0))
    // real data must not mark more than the 3-round budget
    val real = graft.queries.StatsQueries.xEsdAnomalies(spark, sfDir)
      .collect()
    assert(real.count(_.getAs[Int]("removed_round") > 0) <= 3)
  }

  test("RAKE scores a repeated two-word phrase above its member words") {
    // doc1: "deep learning of deep learning" -> phrase "deep learning"
    // twice; doc2: "learning the rate" -> "learning", "rate".
    // freq: deep 2, learning 3, rate 1
    // degree: deep 4, learning 5, rate 1
    // score("deep learning") = 4/2 + 5/3 = 3.6667 (top)
    val docs = Seq((1L, "deep learning of deep learning"),
      (2L, "learning the rate"))
    val dir = tmpDir("graft-rake-")
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextQueries.textRake(spark, dir).collect()
    assert(out.head.getString(0) == "deep learning", out.head.toString)
    assert(out.head.getAs[Long]("n_occurrences") == 2L)
    assert(math.abs(out.head.getAs[Double]("score") - 3.6667) < 1e-4)
    val byPhrase = out.map(r => r.getString(0) -> r.getAs[Double]("score"))
      .toMap
    assert(byPhrase("learning") < byPhrase("deep learning"))
    assert(byPhrase("rate") == 1.0)
  }

  test("burstiness ranks a one-doc burst far above an evenly spread term") {
    // 'zzz': 50 occurrences inside ONE doc  => E[df]/df ~ 34
    // 'the': once in each of 60 docs        => E[df]/df ~ 0.63
    val docs = (1L to 60L).map { i =>
      if (i == 1) (i, ("the " + Seq.fill(50)("zzz").mkString(" ")))
      else (i, "the filler" + i)
    }
    val dir = tmpDir("graft-burst-")
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextQueries.textBurstiness(spark, dir)
      .collect()
    // only 'zzz' (tf 50) and 'the' (tf 60) clear the tf >= 20 floor
    assert(out.length == 2, out.mkString(";"))
    assert(out(0).getString(0) == "zzz")
    assert(out(0).getAs[Double]("burstiness") > 10.0)
    assert(out(1).getString(0) == "the")
    assert(out(1).getAs[Double]("burstiness") < 1.0)
  }
}
