package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The distributed inner loop of BPE vocabulary training (Sennrich et
  * al. 2016, arXiv:1508.07909): count adjacent symbol pairs across the
  * corpus, weighted by word frequency.
  *
  * Scale shape — the classic BPE trick, distributed: pair counting
  * runs over the DISTINCT word table (vocab-sized, tens of millions of
  * rows at 100 TB) with a pre-aggregated frequency column, never over
  * the raw token stream (trillions of rows). Two partial-aggregable
  * groupBys: corpus → (word, freq), then word-pairs → Σ freq. The
  * merge-loop itself (pick top pair, rewrite vocab, repeat) mutates
  * only the vocab table per iteration — each round costs vocab-sized
  * work, which is why real tokenizer training is feasible at corpus
  * scale at all.
  */
object BpePairs {

  /** (word, freq) over lowercased whitespace tokens. */
  def wordFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Vocab.docTokens(docs, idCol, textCol)
      .groupBy(col("token").as("word"))
      .agg(count(lit(1)).as("freq"))

  /** Top-k adjacent character pairs by frequency-weighted count (ties
    * → pair asc) — the statistics the first BPE merge is chosen from. */
  def topPairs(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val wf = wordFreqs(docs, idCol, textCol)
    wf.where(length(col("word")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy("pair")
      .agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)
  }
}
