package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("asofBackward matches an in-memory reference on random data") {
    val rnd = new scala.util.Random(42)
    val keys = 1 to 5
    val left = for (i <- 1 to 120) yield
      (i.toLong, keys(rnd.nextInt(5)).toLong, rnd.nextInt(1000).toLong)
    val right = for (i <- 1 to 80) yield
      (1000L + i, keys(rnd.nextInt(5)).toLong, rnd.nextInt(1000).toLong)
    // dedupe right per (key, ts) keeping max id — the documented contract
    val rightDeduped = right.groupBy(r => (r._2, r._3)).values
      .map(_.maxBy(_._1)).toSeq

    val leftDf = left.toDF("lid", "k", "ts")
    val rightDf = rightDeduped.toDF("payload", "k", "ts")
    val got = AsOfJoin.asofBackward(leftDf, rightDf, "k", "ts", "payload", "m")
      .select("lid", "m").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

    val expected = left.map { case (lid, k, ts) =>
      val candidates = rightDeduped.filter(r => r._2 == k && r._3 <= ts)
      lid -> (if (candidates.isEmpty) None
              else Some(candidates.maxBy(r => (r._3, r._1))._1))
    }.toMap
    assert(got == expected)
  }

  test("asofBackward: same-instant right row is matched (<= semantics)") {
    val left = Seq((1L, 7L, 100L)).toDF("lid", "k", "ts")
    val right = Seq((99L, 7L, 100L)).toDF("payload", "k", "ts")
    val got = AsOfJoin.asofBackward(left, right, "k", "ts", "payload", "m")
      .select("m").head()
    assert(got.getLong(0) == 99L)
  }

  test("asofNearest matches an in-memory reference on random data") {
    val rnd = new scala.util.Random(7)
    val keys = 1 to 5
    val left = for (i <- 1 to 120) yield
      (i.toLong, keys(rnd.nextInt(5)).toLong, rnd.nextInt(1000).toLong)
    val right = for (i <- 1 to 80) yield
      (1000L + i, keys(rnd.nextInt(5)).toLong, rnd.nextInt(1000).toLong)
    val rightDeduped = right.groupBy(r => (r._2, r._3)).values
      .map(_.maxBy(_._1)).toSeq
    val tol = 50L
    val got = AsOfJoin.asofNearest(
        left.toDF("lid", "k", "ts"), rightDeduped.toDF("payload", "k", "ts"),
        "k", "ts", "payload", "m", tol)
      .select("lid", "m").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val expected = left.map { case (lid, k, ts) =>
      val bw = rightDeduped.filter(r => r._2 == k && r._3 <= ts && ts - r._3 <= tol)
        .sortBy(r => (-r._3, -r._1)).headOption
      val fw = rightDeduped.filter(r => r._2 == k && r._3 > ts && r._3 - ts <= tol)
        .sortBy(r => (r._3, -r._1)).headOption
      val pick = (bw, fw) match {
        case (Some(b), Some(f)) =>
          if (ts - b._3 <= f._3 - ts) Some(b) else Some(f)
        case (b, f) => b.orElse(f)
      }
      lid -> pick.map(_._1)
    }.toMap
    assert(got == expected)
  }

  test("asofNearest: distance tie prefers the backward match") {
    val left = Seq((1L, 7L, 100L)).toDF("lid", "k", "ts")
    val right = Seq((11L, 7L, 90L), (22L, 7L, 110L)).toDF("payload", "k", "ts")
    val got = AsOfJoin.asofNearest(left, right, "k", "ts", "payload", "m", 50L)
      .select("m").head()
    assert(got.getLong(0) == 11L)
  }

  test("asofNearest: tolerance excludes far matches on both sides") {
    val left = Seq((1L, 7L, 100L)).toDF("lid", "k", "ts")
    val right = Seq((11L, 7L, 10L), (22L, 7L, 200L)).toDF("payload", "k", "ts")
    val got = AsOfJoin.asofNearest(left, right, "k", "ts", "payload", "m", 30L)
      .select("m").head()
    assert(got.isNullAt(0))
  }
}
