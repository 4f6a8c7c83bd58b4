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

  /** EXCLUSIVE running total of `valueCol` (integral) in the current
    * partition order — the prefix-sum sibling of
    * [[generateConsecutiveIds]], same two-pass zipWithIndex shape: one
    * job collects per-partition totals (one long per partition), the
    * driver turns them into partition offsets, and the main pass emits
    * offset + within-partition prefix. No single-partition collapse: a
    * `sum().over(Window.orderBy(...))` with no partitionBy funnels the
    * whole frame through ONE WindowExec task, while this keeps every
    * partition parallel after a normal range-partitioned sort. Sort
    * the input first (the caller owns ordering, as with ids); rows
    * with null `valueCol` are the caller's job to drop. */
  def runningTotal(df: DataFrame, valueCol: String, outName: String): DataFrame = {
    val schema = df.schema.add(StructField(outName, LongType, nullable = false))
    val idx = df.schema.fieldIndex(valueCol)
    def toLong(v: Any): Long = v match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"runningTotal: non-numeric $valueCol value $other")
    }
    val base = df.rdd
    val partTotals = base.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(r => s += toLong(r.get(idx))); Iterator((i, s))
    }.collect().toMap
    val offsets = {
      val n = if (partTotals.isEmpty) 0 else partTotals.keys.max + 1
      val arr = new Array[Long](n)
      var acc = 0L
      (0 until n).foreach { i => arr(i) = acc; acc += partTotals.getOrElse(i, 0L) }
      arr
    }
    val out = base.mapPartitionsWithIndex { (i, it) =>
      var s = offsets(i)
      it.map { r =>
        val row = Row.fromSeq(r.toSeq :+ s)
        s += toLong(r.get(idx))
        row
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }
}
