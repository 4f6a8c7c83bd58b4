package graft.curate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Percentile-based outlier treatment for corpus statistics —
  * winsorization (clip to [P_lo, P_hi] per group) is the standard
  * robust-mean prep before length/quality features feed a mixing or
  * filtering decision, where a handful of pathological documents
  * would otherwise drag a source's average.
  *
  * Scale shape: the per-group percentile pass is ONE exact-percentile
  * aggregation (Spark's `percentile` — a partial-aggregable typed
  * agg whose state is the group's value multiset; for heavy-tailed
  * 100 TB groups swap in approx_percentile with a documented error
  * budget), and the clip is a broadcast join of the tiny per-group
  * bounds back onto the stream — the corpus itself never reshuffles.
  */
object Outliers {

  /** Clip `valCol` to its per-`groupCol` [pLo, pHi] exact-percentile
    * interval (linear interpolation — the Hive/DuckDB quantile_cont
    * definition, so cross-engine replay is exact). Adds `clipped`
    * (bounded value, double) and `was_clipped`. */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    val bounds = df.groupBy(groupCol)
      .agg(percentile(col(valCol), lit(pLo)).as("w_lo"),
        percentile(col(valCol), lit(pHi)).as("w_hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn("clipped",
        when(col(valCol) < col("w_lo"), col("w_lo"))
          .when(col(valCol) > col("w_hi"), col("w_hi"))
          .otherwise(col(valCol).cast("double")))
      .withColumn("was_clipped",
        col(valCol) < col("w_lo") || col(valCol) > col("w_hi"))
      .drop("w_lo", "w_hi")
  }
}
