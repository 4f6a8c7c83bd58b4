package graft.curate

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Sequence packing: group documents into fixed token-budget bins for
  * training-batch assembly.
  *
  * Packing is inherently sequential, so a global pack would serialize
  * the corpus through one task. Like the reference's partition-local
  * batcher (`hive_metastore_migration.py:228-258` — A6 in SURVEY §2.4),
  * the bins are built next-fit WITHIN each partition: embarrassingly
  * parallel, zero shuffle beyond the caller's partitioning, and the
  * only cross-partition waste is ≤1 underfull bin per partition —
  * negligible when partitions hold millions of tokens. Bin ids embed
  * the partition id, so they are globally unique without coordination.
  */
object Packing {

  /** Next-fit pack of (id, tokens) rows into bins of ≤ `budget` tokens
    * (a document larger than the budget gets its own bin). Returns one
    * row per bin: (bin, n_docs, total_tokens, doc_ids). Bins are built
    * in the caller's partition order; sort within partitions first for
    * a deterministic layout. */
  def nextFitPack(df: DataFrame, idCol: String, tokCol: String,
                  budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(tokCol).cast("long"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        val pid = TaskContext.getPartitionId().toLong
        val buf = rows.buffered
        var localBin = -1L
        new Iterator[(Long, Int, Long, Seq[Long])] {
          def hasNext: Boolean = buf.hasNext
          def next(): (Long, Int, Long, Seq[Long]) = {
            localBin += 1
            val ids = ArrayBuffer.empty[Long]
            // the first doc always enters (an oversized doc gets its
            // own bin); subsequent docs enter only while they fit
            val head = buf.next()
            ids += head._1
            var total = head._2
            while (buf.hasNext && total + buf.head._2 <= budget) {
              val (id, t) = buf.next(); ids += id; total += t
            }
            ((pid << 32) | localBin, ids.length, total, ids.toSeq)
          }
        }
      }
      .toDF("bin", "n_docs", "total_tokens", "doc_ids")
  }
}
