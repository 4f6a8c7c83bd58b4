package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Partition-local batching (SURVEY.md §2.4 A6).
  *
  * Reference `batch_items_within_partition`
  * (hive_metastore_migration.py:228-258): group rows by key WITHIN each
  * physical partition — deliberately NOT a global group-by — so each
  * emitted batch is bounded (the reference feeds Glue API calls with
  * batch-size limits). The same key may appear in multiple output rows;
  * that is the contract, not a bug. Zero shuffle by design: at 100 TB
  * this is a narrow map-only pass.
  */
object BatchOps {

  /** Emit (key columns…, items array, batch_size) rows, each holding at
    * most `maxBatch` of the `itemCol` values sharing the same key within
    * one partition. */
  def batchWithinPartitions(df: DataFrame, keyCols: Seq[String],
                            itemCol: String, maxBatch: Int): DataFrame = {
    val spark = df.sparkSession
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val itemIdx = df.schema.fieldIndex(itemCol)
    val itemType = df.schema(itemCol).dataType
    val outSchema = StructType(
      keyCols.map(df.schema(_)) :+
        StructField("items", ArrayType(itemType)) :+
        StructField("batch_size", IntegerType, nullable = false))

    val out = df.rdd.mapPartitions { it =>
      val acc = mutable.LinkedHashMap.empty[Seq[Any], mutable.ArrayBuffer[Any]]
      val done = mutable.ArrayBuffer.empty[Row]
      def flush(key: Seq[Any], items: mutable.ArrayBuffer[Any]): Unit =
        done += Row.fromSeq(key ++ Seq(items.toSeq, items.size))
      it.foreach { r =>
        val key = keyIdx.map(r.get)
        val buf = acc.getOrElseUpdate(key, mutable.ArrayBuffer.empty[Any])
        buf += r.get(itemIdx)
        if (buf.size >= maxBatch) { flush(key, buf); acc.remove(key) }
      }
      acc.foreach { case (k, b) => if (b.nonEmpty) flush(k, b) }
      done.iterator
    }
    spark.createDataFrame(out, outSchema)
  }
}
