package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Gram matrix G = Σᵥ v·vᵀ of an embedding column — the
  * one-pass sufficient statistic behind PCA/whitening/OPQ rotation of
  * a vector corpus (covariance = G/n − μμᵀ). The scale shape is the
  * RowMatrix.computeGramianMatrix one: each partition accumulates its
  * LOCAL d×d upper triangle in a primitive array (d²/2 doubles — KB,
  * not data-sized), emits it as (i, j, s) rows, and one reduction of
  * `numPartitions × d(d+1)/2` tiny rows finishes the job. The corpus
  * is read once, nothing data-sized shuffles, and the result is d²
  * rows regardless of corpus size — the exact opposite of the
  * posexplode² spelling, which materializes d² rows PER VECTOR
  * (~4096× the corpus) before aggregating.
  *
  * mapPartitions is the right tool here (not a UDF-per-row): the
  * accumulator must live across rows, which no codegen'd per-row
  * expression can express — same justification as the A6 batching and
  * multimodal codec paths. */
object Gram {

  /** Upper-triangle Gram entries (i ≤ j): one row (i, j, g) per dim
    * pair, g = Σ over all vectors of vec(i)·vec(j), both factors
    * widened to double BEFORE the multiply (float×float loses ulps
    * differently per engine). `dim` must match the vector length. */
  def upperTriangle(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val tri = dim * (dim + 1) / 2
    emb.select(col(vecCol)).as[Array[Float]]
      .mapPartitions { it =>
        val acc = new Array[Double](tri)
        var any = false
        it.foreach { v =>
          any = true
          var k = 0
          var i = 0
          while (i < dim) {
            val vi = v(i).toDouble
            var j = i
            while (j < dim) {
              acc(k) += vi * v(j).toDouble
              j += 1; k += 1
            }
            i += 1
          }
        }
        if (!any) Iterator.empty
        else {
          val out = new Array[(Int, Int, Double)](tri)
          var k = 0
          var i = 0
          while (i < dim) {
            var j = i
            while (j < dim) {
              out(k) = (i, j, acc(k)); j += 1; k += 1
            }
            i += 1
          }
          out.iterator
        }
      }
      .toDF("i", "j", "s")
      .groupBy("i", "j").agg(sum("s").as("g"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("g"))
  }
}
