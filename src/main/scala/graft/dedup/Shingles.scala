package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shingling + exact set-similarity primitives shared by the dedup
  * family. Column-only (codegen'd). */
object Shingles {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word n-gram shingles ("a b c" strings). Sequence-based,
    * no UDF: shingle i = tokens[i..i+n-1] joined by space. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    // guard: Spark's sequence(1, x) is DESCENDING for x < 1 — short
    // docs (< n tokens) must yield an empty shingle set instead.
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two array columns (distinct-element
    * semantics). Integer-count division → bit-identical across
    * engines. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** (doc_id, shingles) preparation for a corpus. */
  def docShingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol), shingles(col(textCol), n).as("shingles"))
      .where(size(col("shingles")) > 0)

  /** Exact all-pairs candidates verification: join candidate pairs with
    * both shingle sets and keep those at/above the threshold. The
    * candidate set bounds the join size — LSH prunes, this verifies. */
  def verifyPairs(candidates: DataFrame, docShingles: DataFrame,
                  idCol: String, threshold: Double): DataFrame = {
    val left = docShingles.select(col(idCol).as("a"), col("shingles").as("sh_a"))
    val right = docShingles.select(col(idCol).as("b"), col("shingles").as("sh_b"))
    candidates
      .join(left, "a").join(right, "b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
