package graft

import org.apache.spark.sql.functions._

/** Round-15 pins: the DP-mean denominator floor engaging on a planted
  * tiny group (r14 judge item 4), sequential-composition budget
  * accounting tripping on re-release (item 5), and the linear
  * merged-interval excision agreeing with the r14 per-token scan on
  * overlap-heavy geometry (item 6). */
class Round15Spec extends SparkSpecBase {
  import spark.implicits._

  /** Replicates Sketches.hash60 for the "dpn:" salt: first 15 hex
    * chars of md5(salt+key) as a long — lets the spec PICK a nation
    * key whose pseudo-noise draw is large and negative, so the
    * 2-customer group's noisy count lands below 1 and the floor must
    * engage. */
  private def noiseU(salt: String, key: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(h, 16) + 1.0) / 1.152921504606846976e18
  }
  private def lap(salt: String, key: Int, b: Double): Double = {
    val u = noiseU(salt, key)
    -b * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
  }

  test("DP mean floors its noisy denominator at 1 for tiny groups") {
    // find a key whose Lap(1/eps=2) count-noise is < -1: with n = 2
    // the noisy count 2 + lap < 1 forces the floor
    val key = (0 until 200)
      .find(k => 2.0 + lap("dpn:", k, 2.0) < 1.0)
      .getOrElse(fail("no key with a deep-negative count draw in 0..200"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dpfloor-").toString
    Seq((1L, 500.0), (2L, 700.0)).toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, key), (2L, key)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val row = graft.queries.PrivacyQueries
      .privDpSum(spark, dir).collect()
    assert(row.length == 1)
    val (sum, mean) = (row(0).getDouble(1), row(0).getDouble(2))
    // floored denominator = 1 exactly => released mean == released sum
    assert(mean == sum,
      s"floor did not engage: noisy_mean $mean != noisy_sum $sum " +
        s"(key=$key, lap=${lap("dpn:", key, 2.0)})")
    assert(!mean.isNaN && !mean.isInfinite)
  }

  test("budget audit trips on the release that exceeds the source budget") {
    import graft.privacy.PrivacyLedger._
    val budgets = spark.createDataFrame(Seq(Budget("customer", 1.0, 1e-6)))
    def spent(n: Int): (Boolean, Double) = {
      val log = spark.createDataFrame((1 to n).map(i =>
        Release(s"rel_$i", "customer", "laplace_count", 0.5, 0.0, 1.0)))
      val r = audit(log, budgets).collect()(0)
      (r.getAs[Boolean]("over_budget"), r.getAs[Double]("eps_spent"))
    }
    assert(spent(1) == (false, 0.5)) // first release: within budget
    assert(spent(2) == (false, 1.0)) // second: exactly exhausts it
    val third = spent(3)             // third re-release: composition trips
    assert(third == (true, 1.5), s"third release did not trip: $third")
  }

  test("budget audit lists budgeted sources with zero releases") {
    import graft.privacy.PrivacyLedger._
    val log = spark.createDataFrame(
      Seq(Release("r1", "customer", "laplace_sum", 0.25, 0.0, 100.0)))
    val budgets = spark.createDataFrame(
      Seq(Budget("customer", 1.0, 1e-6), Budget("events", 0.5, 0.0)))
    val rows = audit(log, budgets).orderBy("source").collect()
    assert(rows.length == 2)
    val ev = rows.find(_.getString(0) == "events").get
    assert(ev.getLong(1) == 0L && ev.getDouble(2) == 0.0
      && !ev.getAs[Boolean]("over_budget"))
    assert(ev.getDouble(5) == 0.5) // eps_remaining = untouched budget
  }

  test("excise sweep handles abutting, island-merged, and bridged cuts") {
    // Three geometries for the merged-interval sweep: doc 1 has two
    // well-separated cut islands; doc 2's dup-window runs are within
    // w of each other so maximalDupSpans merges them into ONE island
    // covering the whole doc (empty survivor); doc 3's islands are
    // > w apart, leaving exactly the one bridge token between the two
    // token-disjoint cuts.
    val w = 3
    val docs = Seq(
      (1L, "z1 z2 p q r s z3 z4 u v w x"),
      (2L, "p q r s u v w x"),
      (3L, "p q r s k u v w x")
    ).toDF("doc_id", "text")
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = graft.dedup.SpanDedup.excise(docs, "doc_id", "text", w)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1: cuts cover "p q r s" (2..5) and "u v w x" (8..11)
    assert(got(0) == (1L, 12L, 4L, md5("z1 z2 z3 z4")), got(0).toString)
    // doc 2: everything duplicated -> empty survivor
    assert(got(1) == (2L, 8L, 0L, md5("")), got(1).toString)
    // doc 3: both 4-gram runs duplicated, "k" between them is NOT
    // part of any duplicated window pair across docs... the k-window
    // bridge windows contain k and are unique to doc 3, so k survives
    assert(got(2) == (3L, 9L, 1L, md5("k")), got(2).toString)
  }
}
