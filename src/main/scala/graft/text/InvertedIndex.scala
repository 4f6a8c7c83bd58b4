package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.BoundedMinK

/** Inverted index construction and conjunctive (AND) term search —
  * the retrieval primitive under keyword search and the doc-frequency
  * side of BM25, built engine-native.
  *
  * Scale shape: the term stream is doc-distinct BEFORE aggregation
  * (array_distinct on each document's token array, map-side), the
  * index groupBy carries (term, partial df, O(k) posting buffer) —
  * postings use [[BoundedMinK]], so a stop-word's buffer is k doc
  * ids, never its full billion-row posting list. Conjunctive search
  * deliberately does NOT intersect stored posting arrays: it
  * re-filters the term stream to the query terms and counts distinct
  * matched terms per doc — the shape that stays correct and bounded
  * when true posting lists exceed any array cap.
  */
object InvertedIndex {

  /** Doc-distinct (doc, term) pairs of the corpus — the stream both
    * the index build and conjunctive search consume. */
  def termStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc"),
      explode(array_distinct(expr(
        s"filter(split(lower($textCol), '\\\\s+'), x -> x != '')")))
        .as("term"))

  /** (term, df, postings): df = exact document frequency, postings =
    * the `maxPostings` LOWEST doc ids ascending (an O(k)-state
    * preview, not the full list — rankers that need more re-scan the
    * term stream). */
  def build(docs: DataFrame, idCol: String, textCol: String,
            maxPostings: Int): DataFrame =
    termStream(docs, idCol, textCol)
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        BoundedMinK(col("doc"), maxPostings).as("postings"))

  /** Docs containing ALL of `terms`: filter the term stream to the
    * query terms (broadcast — query terms are few), then keep docs
    * matching every one. One keyed aggregation, cost ∝ the query
    * terms' combined df. */
  def conjunctive(docs: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String]): DataFrame =
    termStream(docs, idCol, textCol)
      .where(col("term").isin(terms: _*))
      .groupBy("doc")
      .agg(count(lit(1)).as("nt")) // stream is doc-distinct already
      .where(col("nt") === terms.length)
      .select("doc")
}
