package graft

import org.apache.spark.sql.functions._
import graft.plans.BoundedTopK

class TopKSpec extends SparkSpecBase {
  import spark.implicits._

  test("longs: k largest with duplicates kept, descending") {
    val df = Seq(5L, 9L, 9L, 1L, 7L, 9L).toDF("v").repartition(5)
    val got = df.agg(BoundedTopK(col("v"), 4).as("t")).as[Seq[Long]].head()
    assert(got == Seq(9L, 9L, 9L, 7L))
  }

  test("structs rank lexicographically (score first, then tiebreak)") {
    val df = Seq((1.0, 10L), (3.0, 2L), (3.0, 7L), (2.0, 1L))
      .toDF("s", "id").repartition(3)
    val got = df.agg(BoundedTopK(struct(col("s"), col("id")), 2).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.s"), col("e.id")).as[(Double, Long)].collect().toSeq
    assert(got == Seq((3.0, 7L), (3.0, 2L)))
  }

  test("strings are orderable too") {
    val df = Seq("pear", "apple", "quince", "fig").toDF("v")
    val got = df.agg(BoundedTopK(col("v"), 2).as("t")).as[Seq[String]].head()
    assert(got == Seq("quince", "pear"))
  }

  test("agrees with window row_number on a large random group set") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(4000)((rnd.nextInt(7), rnd.nextDouble(), rnd.nextLong()))
    val df = rows.toDF("g", "s", "id").repartition(11)
    val viaAgg = df.groupBy("g")
      .agg(BoundedTopK(struct(col("s"), col("id")), 5).as("t"))
      .select(col("g"), explode(col("t")).as("e"))
      .select(col("g"), col("e.s"), col("e.id"))
      .as[(Int, Double, Long)].collect().toSet
    val viaWindow = rows.groupBy(_._1).flatMap { case (g, grp) =>
      grp.map(r => (r._2, r._3)).sorted(Ordering[(Double, Long)].reverse)
        .take(5).map { case (s, id) => (g, s, id) }
    }.toSet
    assert(viaAgg == viaWindow)
  }

  test("SQL surface: bounded_top_k callable from spark.sql") {
    graft.ext.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT bounded_top_k(x, 2) AS t FROM VALUES (3L), (9L), (5L) t(x)")
      .head().getSeq[Long](0)
    assert(got == Seq(9L, 5L))
  }
}
