package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
  * the word co-occurrence graph. Adjacent-token pairs (window 2, the
  * paper's default for keyword extraction) define an UNDIRECTED
  * weighted graph — materialized as both directed edges so the
  * generic power-iteration kernel (graph.PageRank) applies unchanged:
  * same damping algebra, same persisted transition matrix, same
  * V-rows-per-round cost model.
  *
  * Scale shape: pair expansion is map-side from each document's token
  * array (the Collocations lesson — never a positional self-join of
  * an exploded token stream); the edge list is vocabulary-adjacency
  * sized, orders of magnitude below the corpus, and the iteration
  * cost is PageRank's E-shuffle per round on that reduced list.
  * Tokens are restricted to pure-alpha lowercase words so the keyword
  * graph isn't polluted by numbers/punctuation (the BpeTrainer
  * alphabet rule). */
object TextRank {

  /** (word, rank) after `iters` rounds, all words. Filtering to a
    * top-k display set is the caller's concern (rank first, then
    * cut — the cut must see final ranks). */
  def ranks(docs: DataFrame, textCol: String, iters: Int): DataFrame = {
    val toks = docs.select(expr(
      s"filter(split(trim(lower($textCol)), '\\\\s+')," +
        " x -> x rlike '^[a-z]+$')").as("t"))
    val pairs = toks.where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a") =!= col("b"))
    val edges = pairs
      .unionAll(pairs.select(col("b").as("a"), col("a").as("b")))
      .groupBy(col("a").as("src"), col("b").as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
    graft.graph.PageRank.run(edges, iters)
      .select(col("node").as("word"), col("rank"))
  }
}
