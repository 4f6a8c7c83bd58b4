package graft

import org.apache.spark.sql.functions._
import graft.plans.JaroWinkler

/** Textbook Jaro-Winkler values (Winkler 1990 examples + boundary
  * probes), each independently confirmed against DuckDB's
  * jaro_winkler_similarity — the same constants the er_jaro_winkler
  * oracle relies on. */
class JaroWinklerSpec extends SparkSpecBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b")).as("s"))
      .head().getDouble(0)

  test("textbook pairs match the reference values") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
  }

  test("boost threshold: jaro <= 0.7 gets no prefix bonus") {
    // common prefix 'ab' but jaro 0.5238… — must stay unboosted
    assert(math.abs(jw("abqrstu", "abcdxyz") - 0.5238095238095238) < 1e-12)
    assert(math.abs(jw("aaaaa", "aabbb") - 0.6) < 1e-12)
  }

  test("prefix cap at 4 and long-prefix boost") {
    assert(math.abs(jw("ab", "abcdefghijkl") - 0.7777777777777779) < 1e-12)
  }

  test("identity, empties, and symmetry") {
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "") == 0.0) // DuckDB parity: both-empty is 0, not 1
    assert(jw("DIXON", "DICKSONX") == jw("DICKSONX", "DIXON"))
  }

  test("non-ASCII falls back to codepoint comparison") {
    assert(jw("héllo", "héllo") == 1.0)
    assert(jw("héllo", "hello") < 1.0)
  }

  test("SQL registration via GraftExtensions") {
    graft.ext.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS s").head().getDouble(0)
    assert(math.abs(got - 0.9611111111111111) < 1e-12)
  }
}
