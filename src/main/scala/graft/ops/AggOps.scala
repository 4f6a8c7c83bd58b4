package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped-assembly aggregations (SURVEY.md §2.4 A1-A5, §2.7 F20).
  *
  * The reference implements these as RDD `reduceByKey`/`aggregateByKey`
  * round trips (`hive_metastore_migration.py:320-388,593-600`), which
  * break the Catalyst plan into ExistingRDD segments. Here each is a
  * single declarative aggregation: partial (map-side) aggregation,
  * whole-stage codegen and AQE shuffle tuning all apply, and the plan
  * survives a 1000-executor scale-up as ONE exchange on the group key.
  */
object AggOps {

  /** A1/A2 (`kv_pair_to_map` hive_metastore_migration.py:320-337):
    * group rows by `id`, build a key→value map per id, dropping null
    * keys (the reference merges dicts and skips None keys). */
  def kvPairsToMap(df: DataFrame, id: String, key: String, value: String,
                   mapName: String): DataFrame =
    df.where(col(key).isNotNull)
      .groupBy(col(id))
      .agg(map_from_entries(collect_list(struct(col(key), col(value))))
        .as(mapName))

  /** A3 (`transform_df_with_idx` :344-388): group by `id`, collect
    * `payload` structs sorted by the integer `idx` column into an
    * ordered array — the reference's aggregateByKey + driver-side sort,
    * as one agg with array_sort (sorts by the leading struct field). */
  def collectSortedByIdx(df: DataFrame, id: String, idx: String,
                         payload: Column, outName: String): DataFrame =
    df.groupBy(col(id))
      .agg(transform(
        array_sort(collect_list(struct(col(idx).cast("int").as("_idx"),
          payload.as("_p")))),
        e => e.getField("_p")).as(outName))

  /** A5 (:593-600): unordered grouped collect (skewed-values arrays). */
  def collectValues(df: DataFrame, id: String, value: String,
                    outName: String): DataFrame =
    df.groupBy(col(id)).agg(collect_list(col(value)).as(outName))

  /** F20 (`params_to_df` :881-884): explode a map column back to
    * (id, key, value) rows — inverse of kvPairsToMap. */
  def mapToRows(df: DataFrame, id: String, mapCol: String,
                keyName: String, valueName: String): DataFrame =
    df.select(col(id), explode(col(mapCol)).as(Seq(keyName, valueName)))

  /** Canonical string form of a map column for stable cross-engine
    * comparison: entries sorted by key, "k=v" joined with ','. */
  def mapToCanonicalString(m: Column): Column =
    array_join(
      transform(array_sort(map_entries(m)),
        e => concat(e.getField("key"), lit("="), e.getField("value").cast("string"))),
      ",")
}
