package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops._

/** Oracle-checked queries exercising the ops library (SURVEY.md §2.2-§2.6):
  * grouped map/array assembly (A1/A3/A5/A6/A8), the join idioms (J2/J3/
  * J5/J10/J11), projection/filter ops (P2/P4/P5/P6/P8/P9), limits (O1)
  * and unions (U2). Output columns are scalars, deterministically
  * ordered, so the driver's hash compare is stable. */
object OpsQueries extends graft.QueryModule {

  // --- A1: kv pairs → map (canonicalized to a sorted k=v string) ---
  def a1KvToMap(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    AggOps.kvPairsToMap(counts, "user_id", "event_type", "cnt", "type_counts")
      .select(col("user_id"),
        AggOps.mapToCanonicalString(col("type_counts")).as("type_counts"))
      .orderBy("user_id")
  }
  val a1Sql: String =
    """SELECT user_id,
      |  string_agg(event_type || '=' || CAST(cnt AS VARCHAR), ',' ORDER BY event_type) AS type_counts
      |FROM (SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2) t
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- A3: collect payloads sorted by idx into an ordered array.
  //     idx can repeat in the testdata; array_sort on struct(idx, payload)
  //     tie-breaks by payload, and the oracle orders the same way. ---
  def a3CollectSorted(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey")
    AggOps.collectSortedByIdx(li, "l_orderkey", "l_linenumber",
        col("l_partkey"), "parts")
      .select(col("l_orderkey"),
        array_join(transform(col("parts"), _.cast("string")), ",").as("parts"))
      .orderBy("l_orderkey")
  }
  val a3Sql: String =
    """SELECT l_orderkey,
      |  string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_linenumber, l_partkey) AS parts
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  // --- A5: unordered grouped collect (canonicalized by sorting) ---
  def a5CollectValues(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir).select("o_custkey", "o_orderstatus")
    AggOps.collectValues(o, "o_custkey", "o_orderstatus", "statuses")
      .select(col("o_custkey"),
        array_join(array_sort(col("statuses")), ",").as("statuses"))
      .orderBy("o_custkey")
  }
  val a5Sql: String =
    """SELECT o_custkey,
      |  string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // --- A6: partition-local batching; batch-count is physical, but the
  //     per-key item total is invariant → that is what we check. ---
  def a6BatchTotals(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select("l_returnflag", "l_orderkey")
    val batched = BatchOps.batchWithinPartitions(li, Seq("l_returnflag"),
      "l_orderkey", maxBatch = 100)
    batched.groupBy("l_returnflag")
      .agg(sum("batch_size").cast("long").as("total_items"),
        max("batch_size").as("max_batch"))
      .orderBy("l_returnflag")
  }
  val a6Sql: String =
    """SELECT l_returnflag, count(*) AS total_items, 100 AS max_batch
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** A6 under a PERTURBED physical layout (judge r10 item 5): A6's
    * semantics are partitioning-dependent (SURVEY §7.4 risk 2 — which
    * rows share a batch depends on which rows share a partition), so
    * the only oracle-checkable contract is its INVARIANTS: every batch
    * ≤ cap and non-empty, batch_size = |items|, and the union of
    * batches is exactly the input multiset (per-key count + value
    * sum). `a6_batch_within_partitions` pins those on the scan's
    * natural layout; this gate hash-scatters the input into a prime
    * partition count first, so a layout change can never silently
    * break the invariants while the natural-layout gate stays green.
    * Every output column is layout-invariant by construction. */
  def a6BatchPerturbed(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select("l_returnflag", "l_orderkey")
    val scattered = li.repartition(7, xxhash64(col("l_orderkey")))
    val batched = BatchOps.batchWithinPartitions(scattered,
      Seq("l_returnflag"), "l_orderkey", maxBatch = 64)
    batched.groupBy("l_returnflag")
      .agg(sum("batch_size").cast("long").as("total_items"),
        sum(expr("aggregate(items, 0L, (a, x) -> a + x)")).cast("long")
          .as("item_sum"),
        (max("batch_size") <= 64).as("cap_ok"),
        (min("batch_size") >= 1).as("nonempty_ok"),
        (max(abs(col("batch_size") - size(col("items")))) === 0)
          .as("sized_ok"))
      .orderBy("l_returnflag")
  }
  val a6PerturbedSql: String =
    """SELECT l_returnflag, count(*) AS total_items,
      |  CAST(sum(l_orderkey) AS BIGINT) AS item_sum,
      |  true AS cap_ok, true AS nonempty_ok, true AS sized_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --- A8: consecutive id assignment after an explicit sort ---
  def a8ConsecutiveIds(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.nation(spark, sfDir).orderBy("n_name")
    IdOps.generateConsecutiveIds(n, "assigned_id", start = 1000L)
      .select("n_nationkey", "n_name", "assigned_id")
      .orderBy("n_nationkey")
  }
  val a8Sql: String =
    """SELECT n_nationkey, n_name,
      |  999 + row_number() OVER (ORDER BY n_name) AS assigned_id
      |FROM nation ORDER BY n_nationkey""".stripMargin

  // --- J2: left-outer params-style join + F13 null fill ---
  def j2LeftOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val perCust = Tables.orders(spark, sfDir)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_spent"))
    c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left_outer")
      .select(col("c_custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_spent"), lit(0.0)).as("total_spent"))
      .orderBy("c_custkey")
  }
  val j2Sql: String =
    """SELECT c_custkey,
      |  coalesce(n_orders, 0) AS n_orders,
      |  coalesce(total_spent, 0.0) AS total_spent
      |FROM customer LEFT JOIN (
      |  SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_spent
      |  FROM orders GROUP BY o_custkey) t ON c_custkey = o_custkey
      |ORDER BY c_custkey""".stripMargin

  // --- J3: attach an entity as one struct column ---
  def j3StructJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    JoinOps.joinOtherToSingleColumn(o, c, "o_custkey", "inner", "cust")
      .select(col("o_orderkey"),
        col("cust.c_name").as("cust_name"),
        col("cust.c_mktsegment").as("cust_segment"))
      .orderBy("o_orderkey")
  }
  val j3Sql: String =
    """SELECT o_orderkey, c_name AS cust_name, c_mktsegment AS cust_segment
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  // --- J5: full-outer assembly of two per-key aggregates ---
  def j5FullOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.where(col("event_type") === "click")
      .groupBy("user_id").agg(count(lit(1)).as("n_clicks"))
    val buys = ev.where(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
    clicks.join(buys, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
      .orderBy("user_id")
  }
  val j5Sql: String =
    """SELECT coalesce(a.user_id, b.user_id) AS user_id,
      |  coalesce(n_clicks, 0) AS n_clicks,
      |  coalesce(n_purchases, 0) AS n_purchases
      |FROM (SELECT user_id, count(*) AS n_clicks FROM events WHERE event_type = 'click' GROUP BY 1) a
      |FULL JOIN (SELECT user_id, count(*) AS n_purchases FROM events WHERE event_type = 'purchase' GROUP BY 1) b
      |  USING (user_id)
      |ORDER BY user_id""".stripMargin

  // --- J10/J12: compound join condition incl. a constant-equality ---
  def j10CompoundJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    li.join(o, li("l_orderkey") === o("o_orderkey") && li("l_linenumber") === lit(1))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_first_lines"),
        round(sum("l_extendedprice"), 2).as("first_line_price"))
      .orderBy("o_orderstatus")
  }
  val j10Sql: String =
    """SELECT o_orderstatus, count(*) AS n_first_lines,
      |  round(sum(l_extendedprice), 2) AS first_line_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey AND l_linenumber = 1
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // --- J11: join + drop of the duplicate right key ---
  def j11DropDupKey(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .drop(n("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n_customers"))
      .orderBy("n_name")
  }
  val j11Sql: String =
    """SELECT n_name, count(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // --- P2: selectExpr positional-style rename ---
  def p2SelectExpr(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .selectExpr("event_id as id", "upper(event_type) as type_uc",
        "round(value * 2.0, 2) as doubled")
      .orderBy("id")
  val p2Sql: String =
    """SELECT event_id AS id, upper(event_type) AS type_uc,
      |  round(value * 2.0, 2) AS doubled
      |FROM events ORDER BY 1""".stripMargin

  // --- P4+P5: batch drop + batch rename ---
  def p4p5DropRename(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    val dropped = ColumnOps.dropColumns(p, Seq("p_retailprice", "p_size"))
    ColumnOps.renameColumns(dropped,
        Map("p_name" -> "part_name", "p_brand" -> "brand", "p_type" -> "category"))
      .orderBy("p_partkey")
  }
  val p4p5Sql: String =
    """SELECT p_partkey, p_name AS part_name, p_brand AS brand, p_type AS category
      |FROM part ORDER BY p_partkey""".stripMargin

  // --- P6: string predicate filter (pushed to the parquet scan) ---
  def p6WhereString(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .where("p_size > 40 AND p_type = 'PROMO'")
      .select("p_partkey", "p_name", "p_size")
      .orderBy("p_partkey")
  val p6Sql: String =
    """SELECT p_partkey, p_name, p_size FROM part
      |WHERE p_size > 40 AND p_type = 'PROMO' ORDER BY p_partkey""".stripMargin

  // --- P8: na.drop on a subset ---
  def p8NaDrop(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
      .na.drop("any", Seq("seg"))
      .groupBy("seg").agg(count(lit(1)).as("n"))
      .orderBy("seg")
  val p8Sql: String =
    """SELECT nullif(c_mktsegment, 'BUILDING') AS seg, count(*) AS n
      |FROM customer WHERE nullif(c_mktsegment, 'BUILDING') IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- P9: regex routing dispatch (ingestion plugin table analog) ---
  def p9RegexRoute(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("route",
        when(col("source").rlike("^src[0-4]$"), lit("plugin_a"))
          .when(col("source").rlike("^src(5|6|7|8|9)$"), lit("plugin_b"))
          .when(col("source").rlike("^src1[0-9]$"), lit("plugin_c"))
          .otherwise(lit("default")))
      .groupBy("route").agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"))
      .orderBy("route")
  val p9Sql: String =
    """SELECT CASE
      |    WHEN regexp_matches(source, '^src[0-4]$') THEN 'plugin_a'
      |    WHEN regexp_matches(source, '^src(5|6|7|8|9)$') THEN 'plugin_b'
      |    WHEN regexp_matches(source, '^src1[0-9]$') THEN 'plugin_c'
      |    ELSE 'default' END AS route,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // --- O1: LIMIT probe (deterministic via ordering) ---
  def o1LimitProbe(spark: SparkSession, sfDir: String): DataFrame =
    Tables.region(spark, sfDir).orderBy("r_regionkey").limit(1)
  val o1Sql: String =
    "SELECT * FROM region ORDER BY r_regionkey LIMIT 1"

  // --- U2: positional union of schema-aligned halves ---
  def u2Union(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select("event_id", "value")
    val even = ev.where(col("event_id") % 2 === 0)
    val odd = ev.where(col("event_id") % 2 === 1)
    even.union(odd)
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
  }
  val u2Sql: String =
    "SELECT count(*) AS n, round(sum(value), 2) AS total FROM events"

  /** U3: schema-drift union — `unionByName(allowMissingColumns=true)`
    * across two projections where each side lacks a column the other
    * carries; the missing side null-fills. The feed-merge reality
    * when producers evolve at different speeds (same drift class as
    * s14_schema_merge, at the DataFrame level instead of the file
    * level). */
  def u3UnionMissing(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val old = ev.where(col("event_id") % 2 === 0)
      .select("event_id", "value")
    val withType = ev.where(col("event_id") % 2 === 1)
      .select("event_id", "value", "event_type")
    old.unionByName(withType, allowMissingColumns = true)
      .groupBy(coalesce(col("event_type"), lit("(legacy)")).as("etype"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("etype")
  }
  val u3Sql: String =
    """SELECT CASE WHEN event_id % 2 = 0 THEN '(legacy)'
      |  ELSE event_type END AS etype,
      |  count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // --- F20: map → rows roundtrip (build map, explode back) ---
  def f20MapToRows(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    val mapped = AggOps.kvPairsToMap(counts, "user_id", "event_type", "cnt", "m")
    AggOps.mapToRows(mapped, "user_id", "m", "event_type", "cnt")
      .orderBy("user_id", "event_type")
  }
  val f20Sql: String =
    """SELECT user_id, event_type, count(*) AS cnt FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_kv_to_map" -> (a1KvToMap _),
    "a3_collect_sorted_idx" -> (a3CollectSorted _),
    "a5_collect_values" -> (a5CollectValues _),
    "a6_batch_within_partitions" -> (a6BatchTotals _),
    "a6_batch_perturbed" -> (a6BatchPerturbed _),
    "a8_consecutive_ids" -> (a8ConsecutiveIds _),
    "j2_left_outer_agg" -> (j2LeftOuter _),
    "j3_struct_join" -> (j3StructJoin _),
    "j5_full_outer" -> (j5FullOuter _),
    "j10_compound_join" -> (j10CompoundJoin _),
    "j11_drop_dup_key" -> (j11DropDupKey _),
    "p2_selectexpr" -> (p2SelectExpr _),
    "p4p5_drop_rename" -> (p4p5DropRename _),
    "p6_where_string" -> (p6WhereString _),
    "p8_na_drop" -> (p8NaDrop _),
    "p9_regex_route" -> (p9RegexRoute _),
    "o1_limit_probe" -> (o1LimitProbe _),
    "u2_union" -> (u2Union _),
    "u3_union_missing" -> (u3UnionMissing _),
    "f20_map_to_rows" -> (f20MapToRows _))

  def oracles: Map[String, String] = Map(
    "a1_kv_to_map" -> a1Sql,
    "a3_collect_sorted_idx" -> a3Sql,
    "a5_collect_values" -> a5Sql,
    "a6_batch_within_partitions" -> a6Sql,
    "a6_batch_perturbed" -> a6PerturbedSql,
    "a8_consecutive_ids" -> a8Sql,
    "j2_left_outer_agg" -> j2Sql,
    "j3_struct_join" -> j3Sql,
    "j5_full_outer" -> j5Sql,
    "j10_compound_join" -> j10Sql,
    "j11_drop_dup_key" -> j11Sql,
    "p2_selectexpr" -> p2Sql,
    "p4p5_drop_rename" -> p4p5Sql,
    "p6_where_string" -> p6Sql,
    "p8_na_drop" -> p8Sql,
    "p9_regex_route" -> p9Sql,
    "o1_limit_probe" -> o1Sql,
    "u2_union" -> u2Sql,
    "u3_union_missing" -> u3Sql,
    "f20_map_to_rows" -> f20Sql)
}
