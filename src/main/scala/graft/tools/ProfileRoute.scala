package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev tool: minimal repro of the routing-read slowdown. */
object ProfileRoute {
  def main(args: Array[String]): Unit = {
    val dir = args.head // raw dir containing route_a/route_b/junk
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("GRAFT_TUNE")) graft.core.GraftSession.tune(spark)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val dir2 = if (!sys.env.contains("GRAFT_PREP")) dir else {
      val base = graft.core.GraftSession.scratch("route-prep")
      spark.range(1000000).selectExpr("sum(id)").collect()
      val ev = graft.core.Tables.events(spark, args(1))
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .withColumn("__route",
          when(col("user_id") < 75, "route_a")
            .when(col("user_id") < 140, "route_b").otherwise("junk"))
      ev.write.mode("overwrite").partitionBy("__route")
        .option("sep", "\t").option("header", "true").csv(s"$base/rawp")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/raw"))
      Seq("route_a", "route_b", "junk").foreach { r =>
        val src = java.nio.file.Paths.get(s"$base/rawp/__route=$r")
        val dst = java.nio.file.Paths.get(s"$base/raw/$r")
        if (java.nio.file.Files.exists(src)) java.nio.file.Files.move(src, dst)
        else java.nio.file.Files.createDirectories(dst)
      }
      s"$base/raw"
    }
    val df = spark.read.schema(schema)
      .option("sep", "\t").option("header", "true").csv(s"$dir2/*")
    df.count()
    def t[T](name: String)(f: => T): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name -> $r in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("plain count")(df.count())
    val route = when(input_file_name().rlike("/route_a/[^/]+\\.csv$"), lit("route_a"))
      .when(input_file_name().rlike("/route_b/[^/]+\\.csv$"), lit("route_b"))
      .otherwise(lit("skip"))
    t("inline flat chain")(
      df.withColumn("src_file", input_file_name()).withColumn("route", route)
        .where(col("route") =!= "skip").count())
    import graft.streaming.IngestionPipeline
    import graft.streaming.IngestionPipeline.RouteSpec
    val routes = Seq(RouteSpec("route_a", "/route_a/[^/]+\\.csv$"),
      RouteSpec("route_b", "/route_b/[^/]+\\.csv$"))
    t("routeExpr chain")(
      df.withColumn("src_file", input_file_name())
        .withColumn("route", IngestionPipeline.routeExpr(input_file_name(), routes))
        .where(col("route") =!= "skip").count())
    spark.stop()
  }
}
