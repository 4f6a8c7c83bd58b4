package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Consecutive-id assignment (SURVEY.md §2.4 A8).
  *
  * The reference requires CONSECUTIVE ids for appendable metastore
  * primary keys and explicitly rejects monotonically_increasing_id
  * (comment hive_metastore_migration.py:898-901). Consecutiveness
  * conflicts with parallelism: some full pass is unavoidable.
  *
  * `zipWithIndex` is the scalable form: one extra job to count rows
  * per partition, then a per-partition offset — no single-partition
  * collapse (row_number over an empty window would funnel 100 TB
  * through ONE task; this keeps all partitions parallel).
  */
object IdOps {

  /** A8 (`generate_id_df` :886-911): append `idName` = start, start+1,…
    * in the current partition order. For deterministic output, sort the
    * input first (the caller owns ordering semantics, as in the
    * reference where input order is the extracted entity order). */
  def generateConsecutiveIds(df: DataFrame, idName: String, start: Long): DataFrame = {
    val schema = df.schema.add(StructField(idName, LongType, nullable = false))
    val indexed = df.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (start + i))
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }
}
