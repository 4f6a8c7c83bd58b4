package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * language id, quality scoring, fingerprinting. All pure Column
  * compositions (codegen'd, no UDF) — at 100 TB these run at scan
  * bandwidth inside WholeStageCodegen, and every one of them is
  * oracle-expressible for the correctness gate.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-space symbols — a proxy for subword vocabularies. */
  def tokenCountBpe(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Language-id stopword profiles. Tiny by design: the profiles are a
    * heuristic, the operator shape (N regex counts + argmax) is what
    * scales. */
  val langProfiles: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|to)\\b",
    "es" -> "\\b(el|la|de|que|los)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(le|la|les|et|des)\\b")

  /** Predicted language: highest stopword-profile hit count, ties
    * resolved by profile order (en first). */
  def langId(text: Column): Column = {
    // One (score, -priority, lang) struct per profile, argmax via
    // array_max: struct ordering takes the highest score, then the
    // LOWEST profile index (negated), i.e. first-profile-wins ties —
    // identical semantics to a when-chain over greatest(...), but each
    // regexp_count appears exactly ONCE in the expression tree. The
    // when-chain form re-evaluated greatest(all k counts) inside every
    // branch — O(k²) regex passes per row — and filter predicates get
    // no subexpression elimination, so a langId-based WHERE paid that
    // k² on every row (profiled: 2.6 s → 0.5 s at sf0.1 for the
    // training-pipeline filter).
    // The zero-score sentinel (s=0, p=1 beats every -i at s=0) folds
    // the best>0 guard into the same single array_max reference.
    val scored = langProfiles.zipWithIndex.map { case ((lang, pat), i) =>
      struct(regexp_count(text, lit(pat)).as("s"), lit(-i).as("p"),
        lit(lang).as("lang"))
    }
    val sentinel = struct(lit(0).as("s"), lit(1).as("p"),
      lit(null).cast("string").as("lang"))
    array_max(array(scored :+ sentinel: _*)).getField("lang")
  }

  /** Quality score in [0,1]: length saturation + stopword ratio +
    * punctuation penalty, fixed evaluation order so the double result
    * is bit-identical across engines. Rounded to 6 (not fewer) digits:
    * the rational components terminate within 6 decimals, so rounding
    * never sits on a midpoint where 1-ulp engine differences diverge. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCountWs(text).cast("double")
    val sw = regexp_count(text, lit("\\b(the|a|of|and|to)\\b")).cast("double")
    val punct = regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double")
    val nChars = length(text).cast("double")
    round(
      lit(0.3) * least(lit(1.0), nTok / lit(100.0)) +
        lit(0.4) * (sw / (nTok + lit(1.0))) +
        lit(0.3) * (lit(1.0) - least(lit(1.0), punct / (nChars + lit(1.0)))),
      6)
  }

  /** Gopher-style rule metrics (Rae et al. 2021, arXiv:2112.11446
    * table A1 subset): word count, mean word length, fully-symbolic
    * word ratio, hash-character ratio — each a pure Column over a
    * bound token array (scan-bandwidth, codegen'd). Returned as a
    * struct so callers project the metrics and the verdict together. */
  def gopherMetrics(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val n = size(toks).cast("double")
    val meanLen = round(
      aggregate(transform(toks, w => length(w).cast("long")),
        lit(0L), (acc, v) => acc + v).cast("double") / n, 6)
    val symRatio = round(
      size(filter(toks, w => w.rlike("^[^A-Za-z0-9]+$"))).cast("double") / n, 6)
    val hashRatio = round(
      (length(text) - length(regexp_replace(text, "#", ""))).cast("double") /
        greatest(length(text), lit(1)).cast("double"), 6)
    struct(
      size(toks).as("n_words"),
      meanLen.as("mean_word_len"),
      symRatio.as("symbol_word_ratio"),
      hashRatio.as("hash_char_ratio"))
  }

  /** The Gopher keep/drop verdict over [[gopherMetrics]] (bounds from
    * the paper: 50..100k words, mean word length 3..10, ≤10% symbolic
    * words). */
  def gopherPass(m: Column): Column =
    m.getField("n_words").between(50, 100000) &&
      m.getField("mean_word_len").between(3.0, 10.0) &&
      m.getField("symbol_word_ratio") <= 0.1

  /** [[repetitionScore]] over an already-BOUND token-array column —
    * the form hot paths must use: the n-gram lambda references the
    * token array per element, so an inline split() here re-tokenizes
    * O(shingles × n) times per document (measured on text_repetition
    * at sf0.1: 14.8 s → sub-second bound + widened). */
  def repetitionScoreFromTokens(toks: Column, n: Int = 3): Column = {
    val total = greatest(size(toks) - (n - 1), lit(0))
    val distinctN = size(graft.dedup.Shingles.shinglesFromTokens(toks, n))
    when(total <= 0, lit(0.0))
      .otherwise(round(lit(1.0) -
        distinctN.cast("double") / total.cast("double"), 6))
  }

  /** Repetition score in [0,1): fraction of duplicated word n-grams
    * (1 - distinct/total) — the Gopher/C4-style within-document
    * repetition filter. 0 for docs shorter than n tokens. Exact
    * rational arithmetic → engine-reproducible. Convenience raw-text
    * form; bind tokens first (docTokens/select) for corpus-scale work. */
  def repetitionScore(text: Column, n: Int = 3): Column =
    repetitionScoreFromTokens(split(trim(text), "\\s+"), n)

  /** PII-style redaction: emails and long digit runs replaced with
    * typed placeholders (the standard pre-training scrub pass). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "[0-9]{7,}", "<NUM>")

  /** Canonical-text fingerprint: md5 of lowercased, whitespace-collapsed
    * text — the exact-dedup key. */
  def fingerprintMd5(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Position-weighted integer fingerprint: order-sensitive, exact
    * (pure int64 arithmetic), cheap to compute distributed, and
    * reproducible in any engine. weight(i) = (i * 2654435761) mod
    * 1000003 (Knuth multiplicative hashing). */
  def positionalFingerprint(tokens: Column): Column =
    aggregate(
      zip_with(tokens, sequence(lit(1), size(tokens)),
        (t, i) => (ascii(t) + length(t)) *
          pmod(i.cast("long") * lit(2654435761L), lit(1000003L))),
      lit(0L), (acc, x) => acc + x)
}
