package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{GraftSession, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2
  * (names prefixed by the operator id); `oracleSql` the DuckDB-equivalent
  * SQL for each (omitted only where the op is not SQL-expressible, which
  * the driver downgrades to a rows-only check).
  */
object SparkEntry {

  private def registry: Seq[QueryModule] = Seq(
    graft.queries.Relational,
    graft.queries.OpsQueries,
    graft.queries.FunctionQueries,
    graft.queries.SourceQueries,
    graft.queries.CatalogQueries,
    graft.queries.ReverseQueries,
    graft.queries.TextQueries,
    graft.queries.DedupQueries,
    graft.queries.SimQueries,
    graft.queries.StreamQueries,
    graft.queries.CoverageQueries,
    graft.queries.ExtQueries,
    graft.queries.BonusQueries,
    graft.queries.PerfQueries,
    graft.queries.CurateQueries,
    graft.queries.SketchQueries,
    graft.queries.SqlSurfaceQueries,
    graft.queries.GraphQueries,
    graft.queries.AnalyticsQueries,
    graft.queries.StatsQueries,
    graft.queries.FeatQueries,
    graft.queries.GeoQueries,
    graft.queries.PrivacyQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    graft.queries.Relational.q1(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.flatMap(_.defs).toMap.map { case (name, fn) =>
      name -> { (spark: SparkSession, sfDir: String) =>
        GraftSession.tune(spark)
        fn(spark, sfDir)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(_.oracles).toMap
}

/** Implemented by each query group (relational, functions, sources,
  * catalog, dedup, text, similarity, streaming). */
trait QueryModule {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
