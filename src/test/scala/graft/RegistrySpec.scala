package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract sanity for the driver-facing registry — no Spark needed. */
class RegistrySpec extends AnyFunSuite {

  private val modules: Seq[(String, QueryModule)] = Seq(
    "Relational" -> queries.Relational,
    "OpsQueries" -> queries.OpsQueries,
    "FunctionQueries" -> queries.FunctionQueries,
    "SourceQueries" -> queries.SourceQueries,
    "CatalogQueries" -> queries.CatalogQueries,
    "ReverseQueries" -> queries.ReverseQueries,
    "TextQueries" -> queries.TextQueries,
    "DedupQueries" -> queries.DedupQueries,
    "SimQueries" -> queries.SimQueries,
    "StreamQueries" -> queries.StreamQueries,
    "CoverageQueries" -> queries.CoverageQueries,
    "ExtQueries" -> queries.ExtQueries,
    "BonusQueries" -> queries.BonusQueries,
    "PerfQueries" -> queries.PerfQueries,
    "CurateQueries" -> queries.CurateQueries,
    "SketchQueries" -> queries.SketchQueries,
    "SqlSurfaceQueries" -> queries.SqlSurfaceQueries,
    "GraphQueries" -> queries.GraphQueries,
    "AnalyticsQueries" -> queries.AnalyticsQueries,
    "StatsQueries" -> queries.StatsQueries,
    "FeatQueries" -> queries.FeatQueries,
    "GeoQueries" -> queries.GeoQueries,
    "PrivacyQueries" -> queries.PrivacyQueries)

  test("query names are globally unique (no silent map overwrite)") {
    val all = modules.flatMap { case (m, q) => q.defs.keys.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("oracle SQL is DuckDB-shaped (no obvious Spark-isms)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("`"), s"$name uses backtick quoting")
      assert(sql.trim.toUpperCase.startsWith("SELECT") ||
        sql.trim.toUpperCase.startsWith("WITH"), s"$name is not a query")
    }
  }

  test("headline bench queries all exist") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline references unknown queries: $missing")
  }

  test("registry size matches expectation (update when adding queries)") {
    assert(SparkEntry.queries.size == 393, s"got ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size == 393) // every query oracle-gated
  }
}
