package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryModule
import graft.core.Tables
import graft.ext.GraftExtensions

/** Gate queries for the SQL function surface (ext/GraftExtensions):
  * the native kernels must be reachable from spark.sql(...) text, not
  * only the DataFrame API — that is what makes the library usable from
  * JDBC/thrift/SQL-only clients. */
object SqlSurfaceQueries extends QueryModule {

  /** KMV mins through SQL: per-language smallest/4th-smallest distinct
    * md5 hash of the text column via min_k_distinct. */
  def sqlMinK(spark: SparkSession, sfDir: String): DataFrame = {
    GraftExtensions.register(spark)
    Tables.documents(spark, sfDir).createOrReplaceTempView("g_docs")
    spark.sql("""
      SELECT lang,
             element_at(mk, 1) AS h1,
             element_at(mk, 4) AS h4
      FROM (
        SELECT lang,
               min_k_distinct(CAST(conv(substring(md5(text), 1, 15), 16, 10)
                 AS BIGINT), 4) AS mk
        FROM g_docs GROUP BY lang)
      ORDER BY lang""")
  }

  val sqlMinKSql: String =
    """WITH h AS (
      |  SELECT DISTINCT lang,
      |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv FROM documents),
      |mk AS (SELECT lang, list_sort(list(hv))[1:4] AS mins FROM h GROUP BY lang)
      |SELECT lang, mins[1] AS h1, mins[4] AS h4 FROM mk ORDER BY lang""".stripMargin

  /** Exact top-1 cosine neighbor for vec_id < 5, written entirely in
    * SQL with the dot_product kernel. */
  def sqlDot(spark: SparkSession, sfDir: String): DataFrame = {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("g_emb")
    spark.sql("""
      SELECT query_id, neighbor_id, cos FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(dot_product(q.embedding, c.embedding) /
                 (sqrt(dot_product(q.embedding, q.embedding)) *
                  sqrt(dot_product(c.embedding, c.embedding))), 4) AS cos,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 round(dot_product(q.embedding, c.embedding) /
                   (sqrt(dot_product(q.embedding, q.embedding)) *
                    sqrt(dot_product(c.embedding, c.embedding))), 4) DESC,
                 c.vec_id ASC) AS r
        FROM g_emb q JOIN g_emb c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 5)
      WHERE r = 1 ORDER BY query_id""")
  }

  val sqlDotSql: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v,
      |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)
      |SELECT query_id, neighbor_id, cos FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    round(list_sum(list_transform(generate_series(1, len(q.v)),
      |      i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) AS cos,
      |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |      round(list_sum(list_transform(generate_series(1, len(q.v)),
      |        i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) DESC,
      |      c.vec_id ASC) AS r
      |  FROM n q JOIN n c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 5) t
      |WHERE r = 1 ORDER BY query_id""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_min_k_distinct" -> (sqlMinK _),
    "sql_dot_product" -> (sqlDot _))

  def oracles: Map[String, String] = Map(
    "sql_min_k_distinct" -> sqlMinKSql,
    "sql_dot_product" -> sqlDotSql)
}
