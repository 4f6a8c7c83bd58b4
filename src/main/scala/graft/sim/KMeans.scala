package graft.sim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Lloyd's k-means for IVF coarse quantizers.
  *
  * Deterministic: initial centroids are the k lowest-id vectors (not
  * random sampling), assignment ties break on lowest centroid id
  * (Similarity.Ivf.assign), so retrains reproduce the same index.
  *
  * Scale shape per iteration: one broadcast argmax assignment over the
  * corpus + one (bucket, dim) mean aggregation — the corpus shuffles
  * only its exploded (bucket, dim, value) triples, k×dim means come
  * back to the driver (k·dim doubles: tiny) to broadcast next round.
  */
object KMeans {

  /** Train k centroids; returns (centroid_id, cvec) with unit id order
    * 0..k-1 preserved across iterations. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            k: Int, iterations: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var centroids = corpus.orderBy(col(idCol)).limit(k)
      .orderBy(col(idCol))
      .select(col(vecCol))
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](0)) }

    for (_ <- 1 to iterations) {
      val centDf = centroids.toSeq.toDF("centroid_id", "cvec")
        .select(col("centroid_id"), col("cvec").cast("array<float>").as("cvec"))
      val assigned = Similarity.Ivf.assign(corpus, centDf, idCol, vecCol)
      val means = assigned
        .select(col("bucket"), posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy("bucket", "dim")
        .agg(avg(col("v")).as("m"))
        .groupBy("bucket")
        .agg(map_from_entries(collect_list(struct(col("dim"), col("m")))).as("dims"))
        .collect()
        .map { r =>
          val dims = r.getMap[Int, Double](1)
          r.getInt(0) -> (0 until dims.size).map(i => dims(i).toFloat)
        }.toMap
      // empty buckets keep their previous centroid
      centroids = centroids.map { case (i, old) =>
        (i, means.getOrElse(i, old).toSeq)
      }
    }
    centroids.toSeq.toDF("centroid_id", "cvec")
      .select(col("centroid_id"), col("cvec").cast("array<float>").as("cvec"))
  }
}
