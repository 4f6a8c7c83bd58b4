package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a corpus against a query term set
  * (Robertson/Sparck-Jones; the Lucene-default `ln(1 + (N-df+0.5)/
  * (df+0.5))` IDF form, k1=1.2, b=0.75) — the retrieval primitive a
  * training pipeline uses for targeted corpus mining ("find documents
  * about X") on top of the tf-idf machinery in [[Vocab]].
  *
  * Shape at scale: two scalar passes (N + avgdl, per-term dfs — both
  * single partial-aggregable jobs whose results broadcast as
  * LITERALS into the scoring projection), then scoring is one
  * stateless scan — no join, no shuffle, cost = one read of the
  * corpus. Determinism: doc lengths and dfs are integers (exact in
  * doubles), avgdl = exact-int-sum / n, and each document's score sums
  * its per-term contributions in fixed query order, so the double
  * arithmetic replays bit-identically in any engine.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  private def toks(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** (doc_id, bm25) for every document with a positive score. */
  def score(df: DataFrame, idCol: String, textCol: String,
            terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "bm25: empty query")
    val t = toks(col(textCol))
    val withLen = df.select(col(idCol), t.as("__t"))
      .withColumn("__dl", size(col("__t")))
    // pass 1: corpus constants (exact: integer sums in doubles)
    val constRow = withLen.agg(
      count(lit(1)).as("n"), sum("__dl").as("sumdl")).head()
    val n = constRow.getLong(0).toDouble
    val avgdl = constRow.getLong(1).toDouble / n
    // pass 2: per-term document frequencies in ONE aggregate
    val dfCols = terms.map(term =>
      sum(array_contains(col("__t"), term).cast("long")).as(s"df_$term"))
    val dfRow = withLen.agg(dfCols.head, dfCols.tail: _*).head()
    // idf rounded to 6 decimals: ln() may differ by an ulp between
    // libm implementations, and the rounded value is what any
    // replaying engine can reproduce exactly
    val idf = terms.zipWithIndex.map { case (_, i) =>
      val dfT = dfRow.getLong(i).toDouble
      BigDecimal(math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // pass 3: stateless scoring scan, contributions summed in query order
    val contribs = terms.zip(idf).map { case (term, idfT) =>
      val tf = size(filter(col("__t"), x => x === term)).cast("double")
      lit(idfT) * (tf * (K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("__dl").cast("double") / avgdl))
    }
    withLen
      .select(col(idCol), contribs.reduceLeft(_ + _).as("bm25"))
      .where(col("bm25") > 0.0)
  }
}
