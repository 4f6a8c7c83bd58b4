package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink (SURVEY.md §2.1 S6/W5, S10).
  *
  * The reference reads 19 Hive-metastore tables over JDBC
  * (`hive_metastore_migration.py:1262-1310`) and writes them back in
  * foreign-key order (`:1312-1336`). Scale notes:
  *  - reads of big tables must be RANGE-PARTITIONED
  *    (partitionColumn/lowerBound/upperBound/numPartitions) or the whole
  *    table funnels through one task; `readPartitioned` requires those.
  *  - FK ordering is driver-side sequencing of independent Spark jobs —
  *    it bounds nothing at scale (each write is fully parallel).
  *
  * Tests use embedded Derby (on Spark's classpath); production swaps the
  * URL/driver — the plan shape is identical.
  */
object JdbcIO {

  val DerbyDriver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  /** S6: single-partition JDBC read — only for catalog-sized tables. */
  def read(spark: SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    props.foreach { case (k, v) => r.option(k, v) }
    r.load()
  }

  /** S6 at scale: range-partitioned parallel read. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int,
                      props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
    props.foreach { case (k, v) => r.option(k, v) }
    r.load()
  }

  /** W5: append/overwrite one table. */
  def write(df: DataFrame, url: String, table: String, mode: SaveMode,
            props: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url).option("dbtable", table).mode(mode)
    props.foreach { case (k, v) => w.option(k, v) }
    w.save()
  }

  /** W5: FK-ordered multi-table load — parents before children, each
    * load its own parallel Spark job (reference `:1312-1336`). */
  def writeOrdered(url: String, tables: Seq[(String, DataFrame)],
                   mode: SaveMode = SaveMode.Append): Unit =
    tables.foreach { case (name, df) => write(df, url, name, mode) }
}
