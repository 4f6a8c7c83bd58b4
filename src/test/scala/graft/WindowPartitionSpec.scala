package graft

import graft.core.GraftSession

/** Registry-wide unpartitioned-window whitelist (judge r10 item 4).
  *
  * An unpartitioned Window moves EVERY row into one task — the
  * `WindowExec: No Partition Defined` warning — which is a scale
  * defect unless the window's input is bounded by construction (a
  * ≤1024-row bin table, a ≤2000-row rerank list, a daily-series
  * frame). The bench tail prints those warnings for the whitelisted
  * gates below, and the noise could hide a NEW data-sized one; this
  * spec sweeps every registry gate's optimized plan so any gate that
  * grows an unpartitioned window outside the whitelist fails a test
  * instead of hiding in the warning stream.
  *
  * Whitelist rationale (each window's input is plan-bounded):
  *  - sim_hybrid_rrf     — RRF fusion ranks the ≤(2·k·|Q|)-row union
  *                         of two top-k lists, not the corpus.
  *  - sql_null_ordering  — 20-row inline fixture exercising ORDER BY
  *                         NULLS FIRST/LAST semantics.
  *  - ts_changepoint     — daily-series frame (≤ days-in-range rows).
  *  - x_auc_roc          — 256-bin score histogram prefix sums.
  *  - x_ks_binned        — 256-bin CDF table.
  *  - x_pareto_curve     — 1024-bin revenue-concentration table.
  *  - x_runs_test        — daily sign sequence (≤ days-in-range).
  *  - x_survival_km      — per-distinct-duration life table (bounded
  *                         by the horizon in days).
  *  - x_mann_whitney     — ≤1024-row price-bin midrank prefix sums.
  *  - x_decile_lift      — ≤1000-row fine-bin prefix sums + the
  *                         10-row decile rollup.
  *  - ts_decompose       — centered-MA window over the daily series
  *                         (≤ days-in-range rows).
  *  - x_cusum            — prefix-sum/running-min windows over the
  *                         ≤31-row daily frame (the telescoped form).
  *  - x_msprt            — cumulative sufficient-statistic windows
  *                         over the ≤31-row daily frame.
  *  - ts_page_hinkley    — running-mean/prefix-sum/running-min windows
  *                         over the ≤31-row daily frame.
  *  - x_logrank          — reverse-cumulative at-risk windows over the
  *                         duration-bounded life table (the
  *                         x_survival_km frame).
  */
class WindowPartitionSpec extends SparkSpecBase {

  private val whitelist = Set(
    "sim_hybrid_rrf", "sql_null_ordering", "ts_changepoint",
    "x_auc_roc", "x_ks_binned", "x_pareto_curve", "x_runs_test",
    "x_survival_km", "x_mann_whitney", "x_decile_lift",
    "ts_decompose", "x_cusum", "x_msprt", "ts_page_hinkley",
    "x_logrank")

  test("every unpartitioned window in the registry is whitelisted as plan-bounded") {
    GraftSession.tune(spark)
    val found = graft.tools.WindowAudit.offenders(spark, sfDir)
    val rogue = found.map(_._1).filterNot(whitelist)
    assert(rogue.isEmpty,
      s"NEW unpartitioned window(s) in: $rogue — either partition the " +
        "window or prove the input is plan-bounded and whitelist it here")
    // the whitelist must not rot: every entry still exists and still
    // has its bounded window (a silently-partitioned one should be
    // REMOVED from the whitelist, keeping it a tight inventory)
    val stale = whitelist -- found.map(_._1).toSet
    assert(stale.isEmpty, s"whitelisted gates no longer emit one: $stale")
  }
}
