package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String scalar functions (SURVEY.md §2.7 F4-F8, F12, F22, F23).
  *
  * Built-in compositions where possible (codegen'd, no serialization
  * boundary); only the F6 decoder is a Scala UDF because its format is
  * a sequential parse (see Codecs.scala).
  */
object StringFns {

  /** F4 (`udf_escape_chars` hive_metastore_migration.py:456-465):
    * backslash-escape `\ | " { : }` — one regex pass is equivalent to
    * the reference's sequential replaces. */
  def escapeChars(c: Column): Column =
    regexp_replace(c, "([\\\\|\"{:}])", "\\\\$1")

  /** F5 (`udf_skewed_values_to_str` :467-471): encode Array[String] as
    * a length-prefixed concat `"<len>%<value>…"`; null elements
    * contribute "". */
  def skewedValuesToStr(c: Column): Column =
    concat_ws("",
      transform(c, v =>
        when(v.isNull, lit(""))
          .otherwise(concat(length(v).cast("string"), lit("%"), v))))

  /** F7 (:489-501): normalize s3a:// and s3n:// scheme prefixes to
    * s3://. */
  def normalizeS3Scheme(c: Column): Column =
    regexp_replace(c, "^s3[an]://", "s3://")

  /** F8 (`add_prefix_to_column` :503-508): constant string prefix;
    * empty/None prefix is the identity (same short-circuit as the
    * reference). */
  def addPrefix(c: Column, prefix: String): Column =
    if (prefix == null || prefix.isEmpty) c else concat(lit(prefix), c)

  /** F12 (`udf_partition_name_from_keys_vals` :809-823): build
    * `"k1(type),k2(type)=v1,v2"` from a keys array of {name,type}
    * structs and a vals array; empty string when either is null/empty. */
  def partitionName(keys: Column, vals: Column): Column =
    when(keys.isNull || vals.isNull || size(keys) === 0 || size(vals) === 0,
        lit(""))
      .otherwise(concat(
        array_join(transform(keys, k =>
          concat(k.getField("name"), lit("("), k.getField("type"), lit(")"))), ","),
        lit("="),
        array_join(vals, ",")))

  /** F22 (`lambda/common.py:238-247`): strip every character outside
    * the reference's header whitelist `[-_ .&',$A-Za-z0-9]`. */
  def sanitizeHeader(c: Column): Column =
    regexp_replace(c, "[^-_ .&',$A-Za-z0-9]", "")

  /** F23 (`lambda/common.py:300`): md5 hex digest used as document id. */
  def md5Id(c: Column): Column = md5(c)

  /** F15 (:1010): concatenated name columns as a join key. */
  def concatKey(a: Column, b: Column): Column = concat(a, b)
}
