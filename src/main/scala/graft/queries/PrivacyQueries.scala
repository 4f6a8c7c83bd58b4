package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.ScoreFns.scoreRound

/** Privacy / data-governance gates: the release-audit operators a
  * training-data pipeline runs before publishing derived tables —
  * k-anonymity auditing of quasi-identifier combinations and
  * differentially-private counts. They complete the governance story
  * started by text_redact (PII masking) and vt_purge_key (GDPR
  * erasure).
  *
  * Scale shapes: both gates are ONE keyed aggregation over the fact
  * table to a bounded group table (quasi-identifier combinations /
  * nations), then bounded re-aggregation — the StatsQueries doctrine.
  *
  * Determinism: the DP gate's Laplace noise is PSEUDO-noise derived
  * from a salted md5 of the group key (the A-ES uniform construction),
  * so the oracle replays it exactly; a production caller would swap
  * the salt for a secret per-release seed — the mechanism, sensitivity
  * and scale are unchanged. ln() outputs go through scoreRound.
  */
object PrivacyQueries extends graft.QueryModule {

  /** K threshold for the anonymity audit (groups smaller than K are
    * re-identification risks and would be suppressed on release). */
  private val K = 5

  /** PR1: k-anonymity audit of the quasi-identifier triple
    * (nation, market segment, account-balance band) over customers.
    * Reports the achieved k (smallest group), how many groups and rows
    * fall below K=5, and the suppression rate a K-anonymous release
    * would pay. Single groupBy → bounded QI-combination table. */
  def privKAnonymity(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).as("bal_band"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_groups"),
        sum("n").as("n_rows"),
        min("n").as("k_achieved"),
        sum(when(col("n") < K, 1L).otherwise(0L)).as("groups_below_k"),
        sum(when(col("n") < K, col("n")).otherwise(0L)).as("rows_suppressed"))
      .select(col("n_groups"), col("n_rows"), col("k_achieved"),
        col("groups_below_k"), col("rows_suppressed"),
        scoreRound(col("rows_suppressed") / col("n_rows").cast("double"), 6)
          .as("suppression_rate"))

  val kAnonymitySql: String =
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment, floor(c_acctbal / 1000.0) AS bal_band,
       |    count(*) AS n
       |  FROM customer GROUP BY 1, 2, 3)
       |SELECT count(*) AS n_groups,
       |  CAST(sum(n) AS BIGINT) AS n_rows,
       |  min(n) AS k_achieved,
       |  CAST(sum(CASE WHEN n < $K THEN 1 ELSE 0 END) AS BIGINT)
       |    AS groups_below_k,
       |  CAST(sum(CASE WHEN n < $K THEN n ELSE 0 END) AS BIGINT)
       |    AS rows_suppressed,
       |  round(sum(CASE WHEN n < $K THEN n ELSE 0 END)
       |    / CAST(sum(n) AS DOUBLE), 6) + 0.0 AS suppression_rate
       |FROM g""".stripMargin

  /** Laplace scale b = sensitivity/ε = 1/0.5 for unit-sensitivity
    * counts (one customer contributes to exactly one nation). */
  private val LaplaceB = 2.0

  /** PR2: ε-differentially-private per-nation customer counts via the
    * Laplace mechanism, with inverse-CDF noise drawn from the salted-
    * md5 uniform of the group key (replayable; see object doc):
    * noise = −b·sign(u−½)·ln(1−2|u−½|). One keyed aggregation; noise
    * is applied on the bounded nation table. */
  def privDpCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val h = graft.sketch.Sketches.hash60(
      concat(lit("dp:"), col("c_nationkey").cast("string")))
    val u = (h.cast("double") + 1.0d) / 1.152921504606846976e18d
    Tables.customer(spark, sfDir)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).cast("double").as("n"))
      .withColumn("u", u)
      .select(col("c_nationkey"),
        scoreRound(col("n")
          - lit(LaplaceB) * signum(col("u") - 0.5)
            * log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)), 6)
          .as("noisy_count"))
      .orderBy("c_nationkey")
  }

  val dpCountsSql: String =
    """WITH g AS (
      |  SELECT c_nationkey, CAST(count(*) AS DOUBLE) AS n FROM customer
      |  GROUP BY 1),
      |v AS (
      |  SELECT c_nationkey, n,
      |    (CAST(('0x' || substr(md5('dp:' || CAST(c_nationkey AS VARCHAR)),
      |        1, 15))::BIGINT AS DOUBLE) + 1.0) / 1152921504606846976.0 AS u
      |  FROM g)
      |SELECT c_nationkey,
      |  round(n - 2.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)),
      |    6) + 0.0 AS noisy_count
      |FROM v ORDER BY 1""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "priv_k_anonymity" -> (privKAnonymity _),
    "priv_dp_counts" -> (privDpCounts _))

  def oracles: Map[String, String] = Map(
    "priv_k_anonymity" -> kAnonymitySql,
    "priv_dp_counts" -> dpCountsSql)
}
