package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.GraftSession

/** Dev tool: phase timing of the t1_stream_ingest query. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.streaming.IngestionPipeline
    import graft.streaming.IngestionPipeline.RouteSpec
    val base = GraftSession.scratch("profile-stream")
    time("prep csv") {
      val ev = graft.core.Tables.events(spark, sfDir)
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
    }
    val conf = IngestionPipeline.Config(
      schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType))),
      routes = Seq(
        RouteSpec("route_a", "/raw/route_a/[^/]+\\.csv$"),
        RouteSpec("route_b", "/raw/route_b/[^/]+\\.csv$")))
    time("plain batch read BEFORE drain") {
      spark.read.schema(conf.schema)
        .option("sep", "\t").option("header", "true")
        .csv(s"$base/raw/*")
        .withColumn("route",
          IngestionPipeline.routeExpr(
            org.apache.spark.sql.functions.input_file_name(), conf.routes))
        .where(org.apache.spark.sql.functions.col("route") =!= "skip")
        .count()
    }
    time("streaming drain") {
      IngestionPipeline.runAvailable(spark, conf, s"$base/raw/*",
        s"$base/stage", s"$base/control", s"$base/index", s"$base/ck")
    }
    time("read+agg") {
      spark.read.parquet(s"$base/stage").groupBy("route").count().collect()
    }
    time("plain batch read of same csv") {
      val n = spark.read.schema(conf.schema)
        .option("sep", "\t").option("header", "true")
        .csv(s"$base/raw/*")
        .withColumn("src_file", org.apache.spark.sql.functions.input_file_name())
        .withColumn("route",
          IngestionPipeline.routeExpr(
            org.apache.spark.sql.functions.input_file_name(), conf.routes))
        .where(org.apache.spark.sql.functions.col("route") =!= "skip")
        .count()
      println(s"[profile]   plain count=$n")
    }
    spark.stop()
  }
}
