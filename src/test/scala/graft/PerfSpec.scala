package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.core.{GraftSession, Tables}
import graft.perf.Layout

class PerfSpec extends SparkSpecBase {

  test("bucketed join plan has no shuffle exchange for the join keys") {
    GraftSession.tune(spark)
    val dir = GraftSession.scratch("spec-bucket")
    spark.sql("DROP TABLE IF EXISTS spec_bl")
    spark.sql("DROP TABLE IF EXISTS spec_bo")
    Layout.saveBucketed(Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity"), "spec_bl", "l_orderkey", 4, s"$dir/li")
    Layout.saveBucketed(Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus")),
      "spec_bo", "l_orderkey", 4, s"$dir/o")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("spec_bl").join(spark.table("spec_bo"), "l_orderkey")
      joined.collect() // materialize so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan
      val finalPlan = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = finalPlan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"expected shuffle-free bucketed join, got:\n$finalPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dpp join injects a dynamicpruning subquery into the fact scan") {
    GraftSession.tune(spark)
    val dir = GraftSession.scratch("spec-dpp")
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value"), col("ts").cast("date").as("dt"))
    ev.write.mode("overwrite").partitionBy("dt").parquet(dir)
    val dim = ev.select(col("dt")).distinct()
      .withColumn("dow", dayofweek(col("dt")))
    val joined = spark.read.parquet(dir)
      .join(broadcast(dim.where(col("dow") === 2)), Seq("dt"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"fact scan carries no dynamic pruning filter:\n$p")
  }

  test("salted join equals plain join") {
    val fact = Tables.lineitem(spark, sfDir)
      .withColumn("hot_key",
        when(col("l_orderkey") % 10 < 8, lit(0L)).otherwise(col("l_orderkey") % 100))
    val dim = Tables.nation(spark, sfDir)
      .select((col("n_nationkey") * 4).cast("long").as("hot_key"),
        col("n_name").as("dim_name"))
    val salted = Layout.saltedJoin(fact, dim, "hot_key", "l_orderkey", 8)
      .groupBy("dim_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = fact.join(dim, "hot_key")
      .groupBy("dim_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("z-order write clusters BOTH dimensions into compact per-file boxes") {
    GraftSession.tune(spark)
    val dir = GraftSession.scratch("spec-zorder")
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        floor(col("value")).cast("long").as("vi"))
    val nFiles = 8
    Layout.zorderWrite(ev, "user_id", "vi", nFiles, dir)

    val back = spark.read.parquet(dir)
    // content round-trips
    assert(back.count() == ev.count())

    val global = ev.agg(
      (max("user_id") - min("user_id")).as("su"),
      (max("vi") - min("vi")).as("sv")).head()
    val (gu, gv) = (global.getLong(0).toDouble, global.getLong(1).toDouble)
    val boxes = back.groupBy(input_file_name().as("f"))
      .agg((max("user_id") - min("user_id")).cast("double").as("su"),
        (max("vi") - min("vi")).cast("double").as("sv"))
      .collect()
    assert(boxes.length == nFiles)
    val avgU = boxes.map(_.getDouble(1)).sum / boxes.length / gu
    val avgV = boxes.map(_.getDouble(2)).sum / boxes.length / gv
    info(f"avg per-file span fraction: user_id=$avgU%.3f vi=$avgV%.3f")
    // single-column sort gives ~1/nFiles on one dim and ~1.0 on the other;
    // the Morton curve must shrink BOTH well below the global span
    assert(avgU < 0.8 && avgV < 0.8,
      f"z-order failed to localize both dims (u=$avgU%.2f v=$avgV%.2f)")
    assert(avgU + avgV < 1.1,
      f"combined span no better than single-column sort (u=$avgU%.2f v=$avgV%.2f)")
  }

  test("salt spreads the hot key across buckets") {
    val fact = Tables.lineitem(spark, sfDir)
      .withColumn("hot_key", lit(0L))
      .withColumn("__salt", pmod(hash(col("l_orderkey")), lit(8)))
    val buckets = fact.groupBy("__salt").count().collect()
    assert(buckets.length == 8)
    val counts = buckets.map(_.getLong(1))
    assert(counts.max < counts.sum / 2, "salting left one dominant bucket")
  }
}
