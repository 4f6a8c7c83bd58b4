package graft

import org.apache.spark.sql.functions._
import graft.plans.BoundedMinK
import graft.sketch.Sketches

class SketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("BoundedMinK: k smallest distinct values, ascending, across partitions") {
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(5000)(rnd.nextInt(300).toLong)
    val df = values.toDF("v").repartition(13) // force partial + merge path
    val got = df.agg(BoundedMinK(col("v"), 16).as("mk"))
      .as[Seq[Long]].head()
    val want = values.distinct.sorted.take(16)
    assert(got == want)
  }

  test("BoundedMinK: short groups return all distinct values (exact path)") {
    val df = Seq(1L, 1L, 5L, 3L, 3L, 3L).toDF("v").repartition(4)
    val got = df.agg(BoundedMinK(col("v"), 16).as("mk")).as[Seq[Long]].head()
    assert(got == Seq(1L, 3L, 5L))
  }

  test("BoundedMinK: nulls skipped") {
    val df = Seq[java.lang.Long](null, 2L, null, 9L).toDF("v")
    val got = df.agg(BoundedMinK(col("v"), 4).as("mk")).as[Seq[Long]].head()
    assert(got == Seq(2L, 9L))
  }

  test("KMV estimate is exact below k and within 3/sqrt(k) above") {
    val k = 64
    val docs = (1 to 2000).map(i => ("g", s"text-$i")) ++
      (1 to 10).map(i => ("s", s"small-$i"))
    val df = docs.toDF("grp", "value").repartition(8)
    val got = Sketches.distinctByGroup(df, "grp", "value", k)
      .orderBy("grp").as[(String, Long, Long)].collect()
    val big = got.find(_._1 == "g").get._3
    val small = got.find(_._1 == "s").get._3
    assert(small == 10, s"below-k group must be exact, got $small")
    val err = math.abs(big - 2000.0) / 2000.0
    assert(err < 3.0 / math.sqrt(k), s"estimate $big err $err")
  }

  test("KMV state merges associatively (union of sketches = sketch of union)") {
    val a = (1 to 500).map(i => s"a-$i").toDF("v")
    val b = (1 to 500).map(i => s"b-$i").toDF("v")
    val k = 32
    val direct = a.union(b).agg(BoundedMinK(Sketches.hash60(col("v")), k))
      .as[Seq[Long]].head()
    // merge the two per-corpus states by re-aggregating their union
    val merged = a.agg(BoundedMinK(Sketches.hash60(col("v")), k).as("st"))
      .union(b.agg(BoundedMinK(Sketches.hash60(col("v")), k).as("st")))
      .select(explode(col("st")).as("h"))
      .agg(BoundedMinK(col("h"), k))
      .as[Seq[Long]].head()
    assert(direct == merged)
  }

  test("overlapEstimates: exact below k, close above k, pairs are a < b") {
    val k = 64
    // A = 1..30, B = 21..50 → |A∪B| = 50, |A∩B| = 10: below k, all exact
    val small = ((1 to 30).map(i => ("a", s"v-$i")) ++
      (21 to 50).map(i => ("b", s"v-$i"))).toDF("grp", "value")
    val st = small.groupBy("grp")
      .agg(Sketches.kmvState(col("value"), k).as("st"))
    val exact = Sketches.overlapEstimates(st, "grp", "st", k)
      .as[(String, String, Long, Long, Long)].collect()
    assert(exact.toSeq == Seq(("a", "b", 50L, 10L, 10L)))

    // X = 1..3000, Y = 2001..5000 → |X∪Y| = 5000, |X∩Y| = 1000:
    // above k, estimates within 3/sqrt(k) relative error
    val big = ((1 to 3000).map(i => ("x", s"v-$i")) ++
      (2001 to 5000).map(i => ("y", s"v-$i"))).toDF("grp", "value")
      .repartition(8)
    val stBig = big.groupBy("grp")
      .agg(Sketches.kmvState(col("value"), k).as("st"))
    val est = Sketches.overlapEstimates(stBig, "grp", "st", k)
      .as[(String, String, Long, Long, Long)].collect().head
    val bound = 3.0 / math.sqrt(k)
    assert(math.abs(est._3 - 5000.0) / 5000.0 < bound, s"union ${est._3}")
    assert(math.abs(est._5 - 1000.0) / 1000.0 < 2 * bound, s"inter ${est._5}")
  }

  test("count-min estimate dominates the exact count") {
    val got = queries.SketchQueries.countminProbe(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(got.length == 5)
    got.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"$tok: cm $est < exact $exact")
    }
  }
}
