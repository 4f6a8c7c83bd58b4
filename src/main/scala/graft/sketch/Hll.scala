package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality (Flajolet et al. 2007) over the portable
  * 60-bit hash — the constant-memory distinct counter for corpus
  * profiling at sizes where count(distinct) shuffles every key. 4096
  * registers (b=12), each the max leading-zero rank of the 48-bit
  * hash suffix routed to it; the whole sketch is ONE partial-
  * aggregable groupBy (register maxes combine map-side, the exchange
  * carries ≤4096 rows per partition) and registers from disjoint
  * corpora merge by max — the mergeability that makes it a
  * warehouse-native sketch.
  *
  * Cross-engine determinism (the property the DuckDB gate needs, and
  * the reason this doesn't call an engine's built-in approx_count):
  * rank extraction is INTEGER-only — rho = 49 − bitlength(w) via the
  * binary-string length (`bin` strips leading zeros identically in
  * Spark and DuckDB), and the harmonic denominator Σ 2^{−rho} is
  * computed as the EXACT integer Σ 2^{49−rho} (≤ 4096·2^49 < 2^62, no
  * floating accumulation order to disagree on), divided once at the
  * end. The small-range linear-counting branch (E ≤ 2.5m, empty
  * registers V>0 → m·ln(m/V)) is the standard bias correction. */
object Hll {

  val B = 12
  val M: Int = 1 << B // 4096 registers
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)
  private val W = 281474976710656L // 2^48: hash-suffix domain
  private val S49 = 562949953421312L // 2^49: exact-denominator scale

  /** Register table (bucket, maxrho) for a value column. */
  def registers(df: DataFrame, valueCol: Column): DataFrame =
    df.select(Sketches.hash60(valueCol).as("h"))
      .select(expr(s"h div $W").as("bucket"), (col("h") % W).as("w"))
      .select(col("bucket"),
        when(col("w") === 0, lit(49))
          .otherwise(lit(49) - length(expr("bin(w)"))).as("rho"))
      .groupBy("bucket").agg(max("rho").as("maxrho"))

  /** Per-group register table (group, bucket, maxrho) — one sketch per
    * key of `groupCol`, all built in the single keyed aggregation. */
  def groupedRegisters(df: DataFrame, groupCol: Column,
                       valueCol: Column): DataFrame =
    df.select(groupCol.as("g"), Sketches.hash60(valueCol).as("h"))
      .select(col("g"), expr(s"h div $W").as("bucket"),
        (col("h") % W).as("w"))
      .select(col("g"), col("bucket"),
        when(col("w") === 0, lit(49))
          .otherwise(lit(49) - length(expr("bin(w)"))).as("rho"))
      .groupBy("g", "bucket").agg(max("rho").as("maxrho"))

  /** Per-group estimates from a grouped register table:
    * (g, n_estimate, v_empty) — the same algebra as [[estimate]],
    * applied per key. */
  def groupedEstimate(regs: DataFrame): DataFrame = {
    val raw = lit(Alpha) * lit(math.pow(2.0, 73)) / col("s")
    regs.groupBy("g")
      .agg(count(lit(1)).as("mp"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - maxrho AS INT))"))
          .as("sp"))
      .select(col("g"), (lit(M.toLong) - col("mp")).as("v"),
        (col("sp") + (lit(M.toLong) - col("mp")) * lit(S49))
          .cast("double").as("s"))
      .select(col("g"),
        when(raw <= lit(2.5 * M) && col("v") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("v")))
          .otherwise(raw).as("n_estimate"),
        col("v").as("v_empty"))
  }

  /** One-row estimate from a register table: (n_estimate, v_empty). */
  def estimate(regs: DataFrame): DataFrame = {
    val raw = lit(Alpha) * lit(math.pow(2.0, 73)) / col("s") // α·m²·2⁴⁹/S
    regs
      .agg(count(lit(1)).as("mp"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - maxrho AS INT))"))
          .as("sp"))
      .select((lit(M.toLong) - col("mp")).as("v"),
        (col("sp") + (lit(M.toLong) - col("mp")) * lit(S49))
          .cast("double").as("s"))
      .select(
        when(raw <= lit(2.5 * M) && col("v") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("v")))
          .otherwise(raw).as("n_estimate"),
        col("v").as("v_empty"))
  }
}
