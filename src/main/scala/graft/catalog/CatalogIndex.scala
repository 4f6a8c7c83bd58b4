package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StringFns

/** Search-index projection (SURVEY.md §7.1 item 7, §2.1 W7): flatten
  * table entities into the reference's Elasticsearch document shape
  * (`lambda/odl_catalog_hive_metadata_es/odl_catalog_hive_metadata_es
  * .py:211-217`: database, table, columns map, tag fields; md5 doc id
  * `lambda/common.py:300`).
  *
  * Off-AWS the sink is a JSON dataset (the reference's signed HTTP PUT
  * per doc is an orchestration detail, not an engine operator); the
  * projection itself is one narrow pass over catalog-sized data.
  */
object CatalogIndex {

  /** Table entities (MetastoreTransformer.tables output) → one search
    * document per table. `column_tags` / `comment_tags` mirror the
    * reference's tag extraction: names + types tokenized for search. */
  def tableDocs(tables: DataFrame): DataFrame =
    tables.select(
      StringFns.md5Id(concat(col("database"), lit("."), col("name"))).as("doc_id"),
      col("database"),
      col("name").as("table"),
      // columns as a canonical "name:type" csv (map shape in the
      // reference; canonicalized for engine-portable comparison)
      array_join(transform(col("storageDescriptor.columns"),
        c => concat(c.getField("name"), lit(":"), c.getField("type"))), ",")
        .as("columns"),
      // searchable tag strings
      array_join(transform(col("storageDescriptor.columns"),
        c => c.getField("name")), " ").as("column_tags"),
      concat_ws(" ", col("database"), col("name"), col("owner")).as("comment_tags"),
      col("storageDescriptor.location").as("location"))

  /** Write the index dataset as JSON (the W7 sink analog). */
  def writeIndex(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").json(path)
}
