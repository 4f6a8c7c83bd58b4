package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Round-15 randomized property pins (seeded `scala.util.Random`, the
  * AsOfJoinSpec discipline — scalatestplus-scalacheck is not on the
  * offline classpath): the new operators re-derived against
  * independent in-test implementations on GENERATED inputs, so the
  * pins cover input shapes no hand fixture anticipates. */
class Round15dSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("Kneser–Ney matches the independent reimplementation on random corpora") {
    val rnd = new Random(4242)
    val vocab = Vector("a", "b", "c", "dd", "ee", "ff", "gg")
    for (trial <- 1 to 5) {
      val docs = (1L to (3 + rnd.nextInt(5))).map { id =>
        val n = 2 + rnd.nextInt(12)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val D = 0.75
      val bigrams = docs.flatMap { case (id, t) =>
        val w = t.split("\\s+").filter(_.nonEmpty)
        w.zip(w.tail).map(p => (id, p))
      }
      val cab = bigrams.groupBy(_._2).map { case (p, xs) => p -> xs.size }
      val ctxa = cab.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
      val n1f = cab.groupBy(_._1._1).map { case (a, m) => a -> m.size }
      val n1b = cab.groupBy(_._1._2).map { case (b, m) => b -> m.size }
      val bb = cab.size.toDouble
      def p(a: String, b: String): Double =
        (cab((a, b)) - D) / ctxa(a) +
          ((D * n1f(a)) / ctxa(a)) * (n1b(b) / bb)
      val expected = docs.flatMap { case (id, t) =>
        val w = t.split("\\s+").filter(_.nonEmpty)
        val bs = w.zip(w.tail)
        if (bs.isEmpty) None
        else Some(id -> bs.map { case (a, b) => math.log(p(a, b)) }.sum / bs.size)
      }.toMap
      val got = graft.text.Vocab
        .kneserNeyLogProb(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == expected.keySet, s"trial $trial keys")
      got.foreach { case (id, v) =>
        assert(math.abs(v - expected(id)) < 1e-5,
          s"trial $trial doc $id: got $v expected ${expected(id)}")
      }
      // every context's probability mass must close to 1
      ctxa.keys.foreach { a =>
        val seen = cab.collect { case ((x, b), _) if x == a => p(a, b) }.sum
        val unseen = n1b.keys.toSeq.filterNot(b => cab.contains((a, b)))
          .map(b => ((D * n1f(a)) / ctxa(a)) * (n1b(b) / bb)).sum
        assert(math.abs(seen + unseen - 1.0) < 1e-9, s"trial $trial ctx $a")
      }
    }
  }

  test("Shapley conservation and symmetry hold on random exposure logs") {
    val rnd = new Random(1515)
    val types = Vector("click", "error", "signup", "view")
    val baseTs = java.sql.Timestamp.valueOf("2024-07-01 10:00:00")
    for (trial <- 1 to 3) {
      val rows = (1L to (20 + rnd.nextInt(30))).flatMap { u =>
        val exposures = types.filter(_ => rnd.nextBoolean())
        val conv = rnd.nextBoolean()
        val evs = exposures.zipWithIndex.map { case (t, i) =>
          (u * 100 + i, new java.sql.Timestamp(baseTs.getTime + i), u, t,
            1.0, "{}")
        }
        if (conv)
          evs :+ ((u * 100 + 99, new java.sql.Timestamp(baseTs.getTime + 99),
            u, "purchase", 1.0, "{}"))
        else evs
      }.filter(_ => true)
      if (rows.nonEmpty) {
        val dir = tmpDir(s"graft-shapr$trial-")
        rows.toDF("event_id", "ts", "user_id", "event_type", "value",
            "props")
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
        val out = graft.queries.AnalyticsQueries
          .xShapleyAttribution(spark, dir).collect()
        assert(out.length == 4)
        val total = out.head.getAs[Long]("total_conversions")
        val base = out.head.getAs[Long]("baseline_conversions")
        val sumPhi = out.map(_.getAs[Double]("shapley")).sum
        // conservation: Σφ = v(full) − v(∅), to 6dp rounding × 4 terms
        assert(math.abs(sumPhi - (total - base)) < 1e-4,
          s"trial $trial: $sumPhi vs ${total - base}")
        // nonnegativity: v is monotone, so every marginal is ≥ 0
        out.foreach(r =>
          assert(r.getAs[Double]("shapley") >= 0.0, r.toString))
      }
    }
  }

  test("Huber IRLS is a contraction toward the bulk on random contaminated samples") {
    val rnd = new Random(777)
    for (trial <- 1 to 3) {
      val n = 50 + rnd.nextInt(100)
      val bulk = (1 to n).map(i =>
        (i.toLong, 0, 500.0 + rnd.nextGaussian() * 50.0))
      val nOut = 1 + rnd.nextInt(3)
      val outliers = (1 to nOut).map(i =>
        ((n + i).toLong, 0, 50000.0 + rnd.nextInt(10000)))
      val dir = tmpDir(s"graft-hubr$trial-")
      (bulk ++ outliers).toDF("c_custkey", "c_nationkey", "c_acctbal")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      val r = graft.queries.StatsQueries.xHuberMean(spark, dir)
        .collect()(0)
      val plain = r.getAs[Double]("mean_plain")
      val huber = r.getAs[Double]("huber_mean")
      val bulkMean = bulk.map(_._3).sum / bulk.size
      // the robust estimate must sit closer to the uncontaminated bulk
      // mean than the plain mean does, for every contamination draw
      assert(math.abs(huber - bulkMean) < math.abs(plain - bulkMean),
        s"trial $trial: huber $huber plain $plain bulk $bulkMean")
      assert(r.getAs[Long]("n_downweighted") >= nOut.toLong - 0)
    }
  }

  test("QTE quantile indices honor the ceil(q*n) order-statistic definition") {
    val rnd = new Random(909)
    // one priority, known multiset of prices: recompute each arm's
    // binned quantile independently from the hash-split definition
    val rows = (1L to 300L).map(k =>
      (k, "O", 1000.0 + rnd.nextInt(200) * 1000.0, "1-URGENT"))
    val dir = tmpDir("graft-qter-")
    rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    def arm(k: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(h, 16) % 2).toInt
    }
    val byArm = rows.groupBy(r => arm(r._1))
      .map { case (a, rs) =>
        a -> rs.map(r => math.ceil(r._3 / 1000.0).toLong * 1000L)
          .toVector.sorted
      }
    val out = graft.queries.StatsQueries.xQte(spark, dir)
      .orderBy("q").collect()
    for (r <- out) {
      val q = r.getAs[Double]("q")
      for ((a, col) <- Seq(0 -> "quantile_control", 1 -> "quantile_treated")) {
        val vs = byArm(a)
        val idx = math.ceil(vs.size * q).toInt
        val expected = vs(math.max(idx - 1, 0))
        assert(r.getAs[Long](col) == expected,
          s"q=$q arm=$a got ${r.getAs[Long](col)} expected $expected")
      }
    }
  }
}
