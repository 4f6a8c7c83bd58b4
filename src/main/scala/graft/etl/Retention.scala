package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Partition retention for dt-partitioned parquet tables: drop
  * partitions older than a watermark by PATH, never by scan — at
  * 100 TB expiring a year of data is a metadata operation, not a job.
  * (The reference ages data out by S3 lifecycle + stage deletes,
  * `odl_validate_job_submit.py:232-241`; this is the engine-side
  * equivalent for managed analytics zones.) */
object Retention {

  /** Delete `partitionCol=<value>` directories where value < cutoff
    * (ISO date string compare for dt partitions). Returns dropped
    * partition values. */
  def expirePartitions(spark: SparkSession, tablePath: String,
                       partitionCol: String, cutoff: String): Seq[String] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val prefix = s"$partitionCol="
    val dropped = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .filter(_.getPath.getName.stripPrefix(prefix) < cutoff)
    dropped.foreach(s => fs.delete(s.getPath, true))
    dropped.map(_.getPath.getName.stripPrefix(prefix)).sorted
  }
}
