package graft

import graft.curate.Outliers

/** Winsorization semantics on a hand-computable group. */
class OutliersSpec extends SparkSpecBase {

  test("clips to the linear-interpolation percentile bounds per group") {
    val s = spark
    import s.implicits._
    // group g: 1..10 → P25 = 3.25, P75 = 7.75 (index p·(n-1))
    val df = (1 to 10).map(i => ("g", i)).toDF("grp", "v")
    val got = Outliers.winsorize(df, "grp", "v", 0.25, 0.75)
      .collect().map(r => r.getInt(1) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(got(1) == (3.25, true) && got(3) == (3.25, true))
    assert(got(4) == (4.0, false) && got(7) == (7.0, false))
    assert(got(8) == (7.75, true) && got(10) == (7.75, true))
  }

  test("groups get independent bounds") {
    val s = spark
    import s.implicits._
    val df = ((1 to 5).map(i => ("a", i)) ++ (100 to 104).map(i => ("b", i)))
      .toDF("grp", "v")
    val clipped = Outliers.winsorize(df, "grp", "v", 0.0, 1.0)
    // degenerate [P0, P100] clips nothing in either group
    assert(clipped.where("was_clipped").count() == 0)
    val lo = Outliers.winsorize(df, "grp", "v", 0.5, 0.5)
      .select("grp", "clipped").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(lo == Map("a" -> 3.0, "b" -> 102.0)) // per-group medians
  }
}
