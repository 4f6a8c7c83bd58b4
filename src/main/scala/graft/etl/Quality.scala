package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checks (the Deequ/Great-
  * Expectations idea, engine-native): each check is one aggregate or
  * anti-join returning `(check, violations, n_checked)`, and a suite
  * is the union — Spark evaluates all checks in a single action.
  *
  * Scale shape: uniqueness/completeness/range/accepted-values are
  * partial-aggregable scans (the exchange carries per-partition
  * counters, never rows); referential integrity is one anti-join on
  * the key — the only check that shuffles, and exactly the join the
  * constraint semantics require. A 100 TB nightly quality sweep is
  * therefore one pass over each table plus one keyed join per FK.
  */
object Quality {

  private def row(spark: SparkSession, check: String,
                  violations: DataFrame): DataFrame =
    violations.select(lit(check).as("check_name"),
      col("violations"), col("n_checked"))

  /** Rows whose `cols` tuple appears more than once (count above 1
    * summed — 3 copies = 2 violations). */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    row(df.sparkSession, s"unique(${cols.mkString(",")})",
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c") - 1), lit(0L)).as("violations"),
          coalesce(sum(col("c")), lit(0L)).as("n_checked")))

  /** Null-completeness of one column. sum() over zero rows is NULL,
    * not 0 — coalesce so an empty table reports a vacuous pass (as
    * [[unique]] does and as the DuckDB oracle's coalesce does), not
    * pass=NULL. Same in [[inRange]] / [[acceptedValues]]. */
  def complete(df: DataFrame, c: String): DataFrame =
    row(df.sparkSession, s"complete($c)",
      df.agg(coalesce(sum(col(c).isNull.cast("long")), lit(0L))
          .as("violations"),
        count(lit(1)).as("n_checked")))

  /** Child keys with no matching parent (FK orphans). */
  def refIntegrity(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame =
    row(child.sparkSession, s"ref($childKey->$parentKey)",
      child.select(col(childKey))
        .join(parent.select(col(parentKey).as(childKey)),
          Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .crossJoin(child.agg(count(lit(1)).as("n_checked"))))

  /** Values outside the closed interval [lo, hi] (nulls don't count —
    * pair with [[complete]] when nulls are violations too). */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame =
    row(df.sparkSession, s"range($c)",
      df.agg(coalesce(sum((col(c) < lo || col(c) > hi).cast("long")), lit(0L))
          .as("violations"),
        count(lit(1)).as("n_checked")))

  /** Values not in the accepted set (nulls count as violations: an
    * enum column with null is out of domain). */
  def acceptedValues(df: DataFrame, c: String, vals: Seq[String]): DataFrame =
    row(df.sparkSession, s"accepted($c)",
      df.agg(coalesce(sum(when(col(c).isNull || !col(c).isin(vals: _*), 1L)
          .otherwise(0L)), lit(0L)).as("violations"),
        count(lit(1)).as("n_checked")))

  /** Union a suite into one frame, `pass = violations == 0` added. */
  def suite(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("check_name")
}
