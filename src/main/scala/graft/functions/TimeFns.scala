package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time scalar functions (SURVEY.md §2.7 F1/F2/F3/F9/F10).
  *
  * The reference implements all of these as Python scalar UDFs; here
  * each is a built-in `Column` composition so they stay codegen'd —
  * at 100 TB a Python (or even Scala) UDF in the hot parse path costs
  * a serialization boundary per row; these cost nothing.
  *
  * Null-on-parse-failure semantics (reference
  * `spark_submit_tb_table1_parquet.py:107-113` returns None on
  * strptime failure) require non-ANSI mode — set in GraftSession.tune.
  */
object TimeFns {

  /** F1a: `%Y.%m.%d` → Date (reference spark_submit_tb_table1_parquet
    * .py:107-113). */
  def parseDateDots(c: Column): Column = to_date(c, "yyyy.MM.dd")

  /** F1b: `%d.%m.%Y %H:%M:%S.%f` → Timestamp (µs precision; reference
    * spark_submit_tb_iba_laminacao_parquet.py:123-129). */
  def parseTimestampMicros(c: Column): Column =
    to_timestamp(c, "dd.MM.yyyy HH:mm:ss.SSSSSS")

  /** F1c: `%d/%m/%Y %H:%M:%S` → Timestamp (reference
    * spark_submit_gametrics.py:45-52). */
  def parseTimestampSlash(c: Column): Column =
    to_timestamp(c, "dd/MM/yyyy HH:mm:ss")

  /** F2: derive the `year` partition column. */
  def yearOf(c: Column): Column = year(c)

  /** F3: timestamp → date partition value (`dt`). */
  def toDt(c: Column): Column = c.cast("date")

  /** F9: unix-seconds number → Gson-compatible `"MMM dd, yyyy
    * hh:mm:ss a"` UTC string (reference `utc_timestamp_to_iso8601_time`
    * hive_metastore_migration.py:510-530). */
  def utcSecondsToIso8601(c: Column): Column =
    date_format(timestamp_seconds(c.cast("double")),
      "MMM dd, yyyy hh:mm:ss a")

  /** F10: milliseconds-string → whole seconds long, null → 0
    * (reference `udf_milliseconds_str_to_timestamp` :826-827). */
  def msStringToSeconds(c: Column): Column =
    coalesce(floor(c.cast("long") / 1000).cast("long"), lit(0L))

  /** Inverse of [[utcSecondsToIso8601]] for the reverse migration
    * (reference `column_date_to_timestamp` :873-879 parses entity time
    * strings back to integer seconds): Gson string → unix seconds. */
  def iso8601ToUtcSeconds(c: Column): Column =
    unix_timestamp(c, "MMM dd, yyyy hh:mm:ss a")
}
