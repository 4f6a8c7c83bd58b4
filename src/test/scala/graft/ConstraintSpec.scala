package graft

import org.apache.spark.sql.functions._
import graft.etl.VersionedTable

/** CHECK-constraint contract (VersionedTable.commitUpsertChecked):
  * atomic whole-batch rejection, NULL-predicate strictness, and the
  * clean-batch path. */
class ConstraintSpec extends SparkSpecBase {

  private def freshRoot(tag: String): String =
    graft.core.GraftSession.scratch(tag) + "/tbl"

  test("a single violating row rejects the whole batch and creates no version") {
    import spark.implicits._
    val root = freshRoot("ckreject")
    VersionedTable.init(spark, root,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"))
    val before = VersionedTable.versions(spark, root).size
    val bad = Seq((3L, 30.0), (4L, -1.0)).toDF("id", "price")
    val r = VersionedTable.commitUpsertChecked(spark, root, bad,
      Seq("positive_price" -> "price > 0"))
    assert(r.isLeft, "violating batch must be rejected")
    assert(r.left.toOption.get
      .find(_.getAs[String]("constraint_name") == "positive_price")
      .get.getAs[Long]("n_violations") == 1L)
    assert(VersionedTable.versions(spark, root).size == before,
      "rejection must not create a version")
    // the good row did NOT land either — enforcement is atomic
    val live = VersionedTable.readLatest(spark, root, Seq("id"))
    assert(live.where(col("id") === 3L).count() == 0L)
  }

  test("a NULL predicate counts as a violation (strict CHECK)") {
    import spark.implicits._
    val root = freshRoot("cknull")
    VersionedTable.init(spark, root,
      Seq((1L, Some(10.0))).toDF("id", "price"))
    val withNull = Seq((2L, Option.empty[Double])).toDF("id", "price")
    val r = VersionedTable.commitUpsertChecked(spark, root, withNull,
      Seq("positive_price" -> "price > 0"))
    assert(r.isLeft, "NULL predicate must reject (not proof of validity)")
  }

  test("a clean batch commits and the report shape covers every constraint") {
    import spark.implicits._
    val root = freshRoot("ckclean")
    VersionedTable.init(spark, root,
      Seq((1L, 10.0)).toDF("id", "price"))
    val good = Seq((2L, 5.0), (3L, 7.0)).toDF("id", "price")
    val cons = Seq("positive_price" -> "price > 0",
      "bounded_price" -> "price < 1000")
    val r = VersionedTable.commitUpsertChecked(spark, root, good, cons)
    assert(r.isRight, "clean batch must commit")
    assert(VersionedTable.readLatest(spark, root, Seq("id")).count() == 3L)
    val report = VersionedTable.constraintViolations(good, cons)
      .collect().map(x => (x.getAs[String]("constraint_name"),
        x.getAs[Long]("n_rows"), x.getAs[Long]("n_violations"))).toSet
    assert(report == Set(("positive_price", 2L, 0L),
      ("bounded_price", 2L, 0L)))
  }
}
