package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Access to the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read the tables
  * lazily, so Catalyst sees one plan per query: filters and projections
  * land in the parquet scan (PushedFilters / ReadSchema) instead of being
  * applied post-hoc. At 100 TB these reads become distributed file-source
  * scans over partitioned directories; nothing here assumes local mode.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS,false); Spark supports only
    * micro precision, so it is read as nanos-long
    * (spark.sql.legacy.parquet.nanosAsLong, set in GraftSession.tune)
    * and truncated to a microsecond timestamp here. Oracle queries must
    * truncate the same way (DuckDB: CAST(ts AS TIMESTAMP)). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // integral `div`, NOT floor(x/1000): double division loses ulps on
    // nanosecond epochs (> 2^53) and lands one µs off
    apply(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
