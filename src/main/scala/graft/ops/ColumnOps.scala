package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level utilities (SURVEY.md §2.2 P4/P5, §2.7 F13/F14).
  *
  * Reference semantics: `drop_columns`
  * (`artifacts/glue-backup/hive_metastore_migration.py:189-192`),
  * `rename_columns` (`:195-204`), null→empty fills
  * (`fill_none_with_empty_list` `:545-562`,
  * `udf_with_non_null_locationuri` `:848-852`) — all re-expressed as
  * pure Column/DataFrame transforms so they stay inside one Catalyst
  * plan (the reference's UDF versions broke codegen; `coalesce` keeps
  * whole-stage codegen intact at any scale).
  */
object ColumnOps {

  /** P4: drop a batch of columns in one call. */
  def dropColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols: _*)

  /** P5: batch rename oldName→newName; missing names are ignored like
    * the reference's loop over withColumnRenamed. */
  def renameColumns(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** F13: null string → "" (the reference patches locationUri this way). */
  def fillEmptyString(c: Column): Column = coalesce(c, lit(""))

  /** F13: null array → [] — `na.fill` can't fill arrays (reference
    * comment hive_metastore_migration.py:548-549); coalesce can. */
  def fillEmptyArray(c: Column, elemType: String): Column =
    coalesce(c, array().cast(s"array<$elemType>"))

  /** F14: apply a Column→Column transform to one column, keeping the
    * original column order (reference `modify_column_by_udf` :473-487). */
  def modifyColumn(df: DataFrame, name: String, f: Column => Column): DataFrame =
    df.withColumn(name, f(col(name)))
}
