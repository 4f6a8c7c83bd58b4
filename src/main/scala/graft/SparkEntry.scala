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

  /** Oracles emitted with DuckDB `AS MATERIALIZED` CTE hints. DuckDB
    * INLINES CTEs by default, so an oracle that unrolls an iteration
    * (BPE merge rounds, label-prop rounds, k-means steps, PQ
    * codebooks) re-evaluates each round's whole prefix chain once per
    * consumer — O(rounds²) work that was the bulk of the driver's
    * replay window (text_bpe_train alone: 592 s → 0.9 s at sf0.001
    * with the hint, byte-identical result; the r14 correctness
    * artifact landed empty because the contract outgrew the window).
    * MATERIALIZED is an evaluation hint, not semantics: every name
    * here was swept plain-vs-hinted at sf0.01 with frame-identical
    * results (tools note in README). Oracles whose SQL carries WINDOW
    * clauses (`w AS (...)`) must stay un-hinted — the rewrite would
    * touch the window alias — and are simply not listed. */
  private val materializedOracles: Set[String] = Set(
    "text_bpe_train", "text_bpe_apply",
    "asof_join", "curate_cluster_split", "curate_pack",
    "dedup_clusters", "dedup_semantic", "dedup_soft_weights",
    "graph_adamic_adar", "graph_clustering_coeff", "graph_edge_jaccard",
    "graph_hits", "graph_kcore", "graph_louvain_multilevel",
    "graph_pagerank", "graph_ppr_seeds",
    "graph_triangles", "sim_ann_append", "sim_ivf_pq",
    "sim_matryoshka_ivf",
    "sim_mmr_diversify", "sim_opq_recall", "sim_pq_adc",
    "sim_quantized_recall", "sim_two_stage_rerank", "x_markov_stationary")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(_.oracles).toMap.map { case (k, v) =>
      k -> (if (materializedOracles(k))
        v.replaceAll("""\b(\w+) AS \(""", "$1 AS MATERIALIZED (")
      else v)
    }
}

/** Implemented by each query group (relational, functions, sources,
  * catalog, dedup, text, similarity, streaming). */
trait QueryModule {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
