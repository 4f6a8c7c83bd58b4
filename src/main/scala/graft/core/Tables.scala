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
  /** events.ts arrives as either parquet TIMESTAMP(NANOS,false) —
    * older driver snapshots, read as nanos-long via
    * spark.sql.legacy.parquet.nanosAsLong (set in GraftSession.tune)
    * — or plain TIMESTAMP(MICROS,false), read as TIMESTAMP_NTZ.
    * Both normalize to a session-UTC microsecond TimestampType so
    * every downstream query and oracle sees identical instants
    * (DuckDB side: CAST(ts AS TIMESTAMP)). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integral `div`, NOT floor(x/1000): double division loses ulps
        // on nanosecond epochs (> 2^53) and lands one µs off
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => // TIMESTAMP_NTZ: wall clock == instant under UTC session tz
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** File-STREAM source over the events table, ts normalized by the
    * same rules as [[events]]. A file stream needs a user-supplied
    * schema, and the snapshot's physical ts type varies by generation
    * (MICROS → NTZ in current snapshots, NANOS → long in older ones),
    * so the schema is probed from the BATCH reader (one driver-side
    * footer read) instead of being hardcoded — a hardcoded NTZ schema
    * would misread every streaming query against an older snapshot.
    * The `[t]` glob makes the single file a directory-shaped source. */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val inferred = s.read.parquet(s"$d/events.parquet").schema
    val raw = s.readStream.schema(inferred).parquet(s"$d/events.parque[t]")
    inferred("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
