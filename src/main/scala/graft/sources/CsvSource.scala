package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.Path

/** CSV source presets (SURVEY.md §2.1 S1-S4).
  *
  * Each preset mirrors one of the reference's reader configurations;
  * schemas are IMPOSED (catalog- or caller-derived), never inferred,
  * except the S4 legacy path — inference costs an extra full scan,
  * which at 100 TB is an extra 100 TB read.
  */
object CsvSource {

  /** S1 (`spark_submit_tb_call_req_parquet.py:107-113`): ``
    * separator, no header, UTF-8, literal "null" as null. */
  def readSep1(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read
      .option("sep", "").option("header", "false")
      .option("encoding", "UTF-8").option("nullValue", "null")
      .schema(schema).csv(path)

  /** Matching writer so raw-zone fixtures can be produced engine-side. */
  def writeSep1(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("sep", "").option("header", "false")
      .option("nullValue", "null")
      .csv(path)

  /** S2 (`spark_submit_tb_table1_parquet.py:101`): `;` separator with
    * header row, imposed schema. */
  def readSemicolon(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.option("sep", ";").option("header", "true")
      .schema(schema).csv(path)

  def writeSemicolon(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("sep", ";").option("header", "true").csv(path)

  /** S3 (`spark_submit_tb_iba_laminacao_parquet.py:78-87,115`): tab
    * separator, header, EXPLICIT file list from a directory listing —
    * the reference prunes input files before the read. */
  def readTabFileList(spark: SparkSession, schema: StructType,
                      paths: Seq[String]): DataFrame =
    spark.read.option("sep", "\t").option("header", "true")
      .schema(schema).csv(paths: _*)

  def writeTab(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("sep", "\t").option("header", "true").csv(path)

  /** S3 helper: list data files under a dir via the Hadoop FS API (the
    * reference lists S3 keys; same API surface on any FS). */
  def listDataFiles(spark: SparkSession, dir: String, suffix: String = ".csv"): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(suffix))
      .map(_.getPath.toString)
      .sorted
  }

  /** S4 (`spark_submit_gametrics.py:39-40`): headerless, `'` quote,
    * inferred schema, positional `_c0…` columns — legacy one-off. */
  def readInferredQuote(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "false").option("quote", "'")
      .option("inferSchema", "true").csv(path)

  def writeQuote(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "false").option("quote", "'").csv(path)
}
