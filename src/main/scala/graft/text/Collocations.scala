package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram collocation extraction by pointwise mutual information —
  * the corpus statistic behind multi-word-expression detection and
  * tokenizer-vocabulary QA (a high-PMI pair like "new york" is a
  * merge candidate; a vocab whose frequent merges have LOW pmi is
  * wasting slots on chance co-occurrence).
  *
  * Scale shape: tokens and bigrams are expanded MAP-SIDE from each
  * document's array (no positional self-join of an exploded token
  * table — that spelling shuffles the corpus token stream to pair
  * neighbors the array already holds adjacently); the two exchanges
  * carry (word, partial count) and (pair, partial count), both
  * vocabulary-sized after map-side combine. The count joins are
  * vocabulary × vocabulary — broadcast territory at any corpus size.
  */
object Collocations {

  /** (a, b, cab, pmi) for bigrams occurring ≥ `minCount` times.
    * pmi = ln( p(a,b) / (p(a)·p(b)) ) with unigram probabilities from
    * the token stream and bigram probabilities from the pair stream.
    * Tokenization: lowercase, split on whitespace runs, empties
    * dropped BEFORE pairing (so a pair never spans a dropped token's
    * slot differently across engines). */
  def bigramPmi(docs: DataFrame, textCol: String,
                minCount: Long): DataFrame = {
    val toks = docs.select(
      expr(s"filter(split(lower($textCol), '\\\\s+'), x -> x != '')").as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val pairs = toks.where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val bcAll = pairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    // totals as broadcast 1-row frames, not driver actions: the whole
    // statistic stays one lazy plan (one Bench/Verify action)
    val n1df = uni.agg(sum("cw").cast("double").as("n1"))
    val n2df = bcAll.agg(sum("cab").cast("double").as("n2"))
    def d(c: Column): Column = c.cast("double")
    bcAll.where(col("cab") >= minCount)
      .join(broadcast(uni.select(col("w").as("a"), col("cw").as("ca"))), "a")
      .join(broadcast(uni.select(col("w").as("b"), col("cw").as("cb"))), "b")
      .crossJoin(broadcast(n1df)).crossJoin(broadcast(n2df))
      .select(col("a"), col("b"), col("cab"),
        // scoreRound: a bigram with true pmi 0 rounded to -0.0 here vs
        // 0.0 in the oracle (1-ulp libm difference) — hash-red until
        // both sides normalize the zero sign
        graft.functions.ScoreFns.scoreRound(
          log(d(col("cab")) * col("n1") * col("n1") /
            (d(col("ca")) * d(col("cb")) * col("n2"))), 4).as("pmi"))
  }

  /** Dunning log-likelihood-ratio (G²) collocations — the measure that
    * fixes PMI's low-frequency bias (PMI ranks a pair seen twice in two
    * chances at the top; G² weights the evidence, so "of the" scores on
    * mass and a 2-count fluke doesn't). Per bigram (a, b), the 2×2
    * contingency over the bigram stream:
    * k11 = c(ab), k12 = c(a·)−c(ab), k21 = c(·b)−c(ab),
    * k22 = N−k11−k12−k21, and G² = 2·Σ kᵢⱼ·ln(kᵢⱼ·N / (rowᵢ·colⱼ))
    * with the 0·ln 0 = 0 convention.
    *
    * Same scale shape as [[bigramPmi]]: map-side pair expansion, the
    * marginals c(a·)/c(·b) re-aggregate the PAIR table (vocabulary-
    * sized), broadcast joins assemble the cells. All counts stay
    * integral until the final log. */
  def bigramLlr(docs: DataFrame, textCol: String,
                minCount: Long): DataFrame = {
    val pairs = docs.select(
        expr(s"filter(split(lower($textCol), '\\\\s+'), x -> x != '')")
          .as("t"))
      .where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val cab = pairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val ra = cab.groupBy("a").agg(sum("cab").as("ca"))
    val cb = cab.groupBy("b").agg(sum("cab").as("cb"))
    val n = cab.agg(sum("cab").cast("double").as("n"))
    def d(c: Column): Column = c.cast("double")
    def term(k: Column, row: Column, colm: Column, nn: Column): Column =
      when(k > 0, d(k) * log(d(k) * nn / (d(row) * d(colm))))
        .otherwise(lit(0.0))
    cab.where(col("cab") >= minCount)
      .join(broadcast(ra), "a").join(broadcast(cb), "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("cab"),
        graft.functions.ScoreFns.scoreRound(lit(2.0) * (
          term(col("cab"), col("ca"), col("cb"), col("n"))
            + term(col("ca") - col("cab"), col("ca"),
              col("n") - col("cb"), col("n"))
            + term(col("cb") - col("cab"), col("n") - col("ca"),
              col("cb"), col("n"))
            + term(col("n") - col("ca") - col("cb") + col("cab"),
              col("n") - col("ca"), col("n") - col("cb"), col("n"))),
          4).as("llr"))
  }
}
