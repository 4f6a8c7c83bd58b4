package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.AggOps

/** Reverse catalog migration: nested entity documents → relational
  * metastore rows (SURVEY.md §3.2 reverse path; reference
  * `DataCatalogTransformer.transform`
  * hive_metastore_migration.py:1227-1247).
  *
  * posexplode replaces the reference's array→index-map UDF + explode
  * emulation (`udf_array_to_map`/`generate_idx_for_df` :803-870): the
  * built-in Generator keeps ordinal positions without a UDF round trip
  * and stays inside whole-stage codegen.
  */
object DataCatalogTransformer {

  /** Decompose table entities' column arrays → COLUMNS_V2-shaped rows
    * (reference :1081-1100 via generate_idx_for_df). The CD identity
    * here is the storage descriptor owner id. */
  def columnsFromTables(tables: DataFrame, idCol: String = "TBL_ID"): DataFrame =
    tables.select(col(idCol),
        posexplode(col("storageDescriptor.columns")).as(Seq("INTEGER_IDX", "c")))
      .select(col(idCol), col("INTEGER_IDX"),
        col("c.name").as("COLUMN_NAME"), col("c.type").as("TYPE_NAME"))

  /** Decompose parameters maps → (id, PARAM_KEY, PARAM_VALUE) rows
    * (reference params_to_df :881-884). */
  def paramsFromEntities(entities: DataFrame, idCol: String): DataFrame =
    AggOps.mapToRows(entities, idCol, "parameters", "PARAM_KEY", "PARAM_VALUE")

  /** Decompose partition entities → PARTITION_KEY_VALS rows. */
  def partitionKeyVals(partitions: DataFrame): DataFrame =
    partitions.select(col("PART_ID"),
        posexplode(col("values")).as(Seq("INTEGER_IDX", "PART_KEY_VAL")))

  /** Decompose partitionKeys arrays → PARTITION_KEYS rows. */
  def partitionKeysFromTables(tables: DataFrame): DataFrame =
    tables.select(col("TBL_ID"),
        posexplode(col("partitionKeys")).as(Seq("INTEGER_IDX", "k")))
      .select(col("TBL_ID"), col("INTEGER_IDX"),
        col("k.name").as("PKEY_NAME"), col("k.type").as("PKEY_TYPE"))
}
