package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.ext.GraftExtensions

class SqlSurfaceSpec extends SparkSpecBase {

  test("runtime registration exposes the native kernels to SQL text") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0) == 11.0)
    val mk = spark.sql(
      "SELECT min_k_distinct(x, 2) AS mk FROM VALUES (5L), (1L), (9L), (1L) t(x)")
      .head().getSeq[Long](0)
    assert(mk == Seq(1L, 5L))
    // SQL route must agree bit-for-bit with the DataFrame-API kernels
    val sqlSig = spark.sql("SELECT simhash_sig(array('a', 'b', 'c')) AS s")
      .head().getLong(0)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val apiSig = Seq(Seq("a", "b", "c")).toDF("f")
      .select(graft.plans.SimHashSig(col("f")).as("s")).head().getLong(0)
    assert(sqlSig == apiSig)
    val sqlMin = spark.sql("SELECT minhash_sig(array('a', 'b'), 8) AS m")
      .head().getSeq[Long](0)
    val apiMin = Seq(Seq("a", "b")).toDF("f")
      .select(graft.plans.MinHashSig(col("f"), 8,
        graft.dedup.MinHashLSH.Prime,
        graft.dedup.MinHashLSH.permConsts(8)).as("m")).head().getSeq[Long](0)
    assert(sqlMin == apiMin && sqlMin.length == 8)
  }

  test("non-literal k is rejected with a clear message") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT min_k_distinct(x, CAST(x AS INT)) FROM VALUES (1L) t(x)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("extension class wires every function without error") {
    // the config-route entry point (spark.sql.extensions=...) must
    // accept the injector; function behavior itself is covered above
    new GraftExtensions().apply(new SparkSessionExtensions)
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ==
      Seq("bounded_top_k", "dot_product", "jaro_winkler", "min_k_distinct",
        "minhash_sig", "nfc_normalize", "simhash_sig", "strip_accents"))
  }
}
