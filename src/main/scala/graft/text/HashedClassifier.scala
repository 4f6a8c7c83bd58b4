package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed-feature linear text classifier — fastText-style INFERENCE
  * over a corpus: tokens hash into a fixed bucket space, a (bucket,
  * weight) table scores each document as the logistic of its
  * mean-pooled bucket weights. The weight table here is a
  * deterministic placeholder (w(b) = (b−128)/256, exact in binary so
  * cross-engine sums agree bit-for-bit); a trained model's weights
  * drop in as a real table with the same schema.
  *
  * Scale shape: same as [[Vocab.lmLogProb]] — the token explode feeds
  * one partial-aggregable (sum, count) per doc, the weight table
  * (256 rows; 2^21 for a production model) broadcasts, raw text never
  * shuffles and no sort appears. This is how quality-classifier
  * inference runs over 100 TB: the model is the broadcast side, the
  * corpus streams through map-side.
  */
object HashedClassifier {

  val NumBuckets = 256

  /** Feature hash: first md5 byte → bucket 0..255. md5 (not xxhash)
    * so any engine can reproduce the bucketing exactly. */
  def bucket(token: Column): Column =
    conv(substring(md5(token), 1, 2), 16, 10).cast("int")

  /** Placeholder linear model: weights in [−0.5, 0.5), multiples of
    * 1/256 (exactly representable → order-independent sums). */
  def weights(spark: SparkSession): DataFrame =
    spark.range(NumBuckets).select(col("id").cast("int").as("bucket"),
      ((col("id") - lit(128)) / lit(256.0)).as("w"))

  /** (id, quality_prob): sigmoid(bias + mean bucket weight), rounded
    * to 6 digits. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            bias: Double = 0.0): DataFrame =
    Vocab.docTokens(docs, idCol, textCol)
      .withColumn("bucket", bucket(col("token")))
      .join(broadcast(weights(docs.sparkSession)), "bucket")
      .groupBy(idCol)
      .agg(sum(col("w")).as("__sw"), count(lit(1)).as("__n"))
      .select(col(idCol),
        round(lit(1.0) / (lit(1.0) +
          exp(-(lit(bias) + col("__sw") / col("__n")))), 6)
          .as("quality_prob"))
}
