package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for training-data curation: stable
  * train/val/test splits and per-group quotas.
  *
  * Both ops key on md5 of the row id rather than rand(): the split is
  * a pure function of the id, so it is reproducible across runs,
  * engines and cluster sizes, and survives re-partitioning — the
  * property a training pipeline needs so that no validation document
  * ever leaks into train between runs. Cost shape: hashSplit is a
  * narrow map (no shuffle); perGroupQuota is one hash exchange on the
  * group key + per-group top-k.
  */
object Sampling {

  /** 0..15 bucket from the first hex digit of md5(id) — identical
    * arithmetic is expressible in any engine with md5 (DuckDB:
    * strpos('0123..f', substr(md5(x),1,1)) - 1). */
  def hexBucket(id: Column): Column =
    (instr(lit("0123456789abcdef"), substring(md5(id.cast("string")), 1, 1)) - 1)
      .cast("int")

  /** Assign each row a stable split label: buckets 0-12 → train
    * (13/16 = 81.25%), 13 → val, 14-15 → test. */
  def hashSplit(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("split",
      when(hexBucket(col(idCol)) < 13, lit("train"))
        .when(hexBucket(col(idCol)) === 13, lit("val"))
        .otherwise(lit("test")))

  /** Keep at most `quota` rows per group, chosen by a deterministic
    * md5 shuffle of the id (so the sample is unbiased w.r.t. any
    * ordering of the source data but fully reproducible). */
  def perGroupQuota(df: DataFrame, groupCol: String, idCol: String,
                    quota: Int): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= quota)
      .drop("__rn")
  }
}
