package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Bonus relational surface beyond the reference's inventory (SURVEY
  * §2.4 notes these as absent-but-free): rollup/cube multi-level
  * aggregation, pivot, semi/anti joins, distinct aggregation. Exposed
  * so a reference user gains them without leaving the engine. */
object BonusQueries extends graft.QueryModule {

  /** ROLLUP: (status, priority) totals with subtotals + grand total. */
  def xRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  val rollupSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  /** PIVOT: event counts per user across event types (fixed columns). */
  def xPivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")
  val pivotSql: String =
    """SELECT user_id,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'view') AS view,
      |  count(*) FILTER (event_type = 'purchase') AS purchase
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Semi + anti joins: customers with orders vs without. */
  def xSemiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).select(col("o_custkey").as("c_custkey"))
    val withOrders = c.join(o, Seq("c_custkey"), "left_semi")
      .select(lit("with_orders").as("bucket"), col("c_custkey"))
    val without = c.join(o, Seq("c_custkey"), "left_anti")
      .select(lit("no_orders").as("bucket"), col("c_custkey"))
    withOrders.unionByName(without)
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }
  val semiAntiSql: String =
    """SELECT bucket, count(*) AS n FROM (
      |  SELECT 'with_orders' AS bucket, c_custkey FROM customer
      |  WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |  UNION ALL
      |  SELECT 'no_orders', c_custkey FROM customer
      |  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Distinct aggregation + approx sketch sanity (exact part checked;
    * the HLL estimate is engine-specific so only the exact columns are
    * compared). */
  def xDistinctAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n_parts"),
        countDistinct("l_suppkey").as("n_supps"))
      .orderBy("l_returnflag")
  val distinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_rollup" -> (xRollup _),
    "x_pivot" -> (xPivot _),
    "x_semi_anti" -> (xSemiAnti _),
    "x_distinct_agg" -> (xDistinctAgg _))

  def oracles: Map[String, String] = Map(
    "x_rollup" -> rollupSql,
    "x_pivot" -> pivotSql,
    "x_semi_anti" -> semiAntiSql,
    "x_distinct_agg" -> distinctSql)
}
