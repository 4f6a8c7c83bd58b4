package graft.streaming

import org.apache.spark.sql.DataFrame

/** Watermark-scoped streaming deduplication — the Spark-native form of
  * the reference's T3 at-least-once + dedupe-by-delete contract
  * (`spark_submit_tb_iba_laminacao_parquet.py:149-151`,
  * `odl_validate_job_submit.py:232-241`): instead of deleting stage
  * files after load to prevent reprocessing, duplicate deliveries are
  * dropped inside the stream by keyed state that the watermark bounds.
  *
  * Scale: state size ∝ keys per watermark horizon, NOT total history —
  * the watermark is what makes exactly-once affordable at 100 TB;
  * unbounded `dropDuplicates` would accrete every key ever seen.
  */
object StreamDedup {

  /** Exactly-once rows per `idCols` within the `delay` watermark
    * horizon on `tsCol`. Duplicates arriving later than the watermark
    * are NOT caught (they are also, by definition, later than any
    * plausible redelivery). */
  def dedupWithinWatermark(stream: DataFrame, idCols: Seq[String],
                           tsCol: String, delay: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCols)
}
