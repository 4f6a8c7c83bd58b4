package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Document chunking for context-window-bounded consumers (training
  * example assembly, RAG indexing): split each document into chunks of
  * at most `window` tokens, either on a fixed sliding grid or aligned
  * to sentence boundaries.
  *
  * Scale shape: both chunkers are PURE PER-ROW array programs — built
  * entirely from builtin collection functions (`split`, `sequence`,
  * `slice`, `transform`, `aggregate`, `filter`), so chunking a 100 TB
  * corpus is one embarrassingly-parallel scan with ZERO shuffle and no
  * UDF serialization; the only exchange in a chunking query is
  * whatever the caller adds downstream. The per-document work is
  * O(tokens) for the sliding grid and O(sentences × chunks) for the
  * packer (sentence counts per document are small by construction).
  * Contrast a groupBy/window formulation, which would shuffle the
  * entire corpus text by doc_id just to reassemble what each row
  * already holds.
  *
  * The reference corpus operators (SURVEY.md §2 F-series) transform
  * whole values; chunking is the complementary fan-OUT the LLM
  * pipeline layer needs (one row → N training-ready rows).
  */
object Chunker {

  /** Whitespace tokens of `text` (trimmed; the shared token contract
    * of TextAnalysis.tokenCountWs and the DuckDB oracles:
    * `string_split_regex(trim(text), '\s+')`). */
  private def toks(text: Column): Column = split(trim(text), "\\s+")

  /** Number of sliding chunks over `n` tokens: 1 when the document
    * fits one window, else one chunk per stride step with the final
    * window truncated at the end of the document. */
  private def slidingCount(n: Column, window: Int, stride: Int): Column =
    when(n <= window, lit(1))
      .otherwise(ceil((n - window).cast("double") / stride).cast("int") + 1)

  /** Sliding-window chunks: chunk `i` covers tokens
    * `[i*stride, i*stride + window)`; consecutive chunks overlap by
    * `window - stride` tokens (the standard context-window overlap so
    * no span longer than the overlap is ever split across a boundary
    * unseen). Returns
    * `array<struct<chunk_idx:int, chunk_text:string, n_tokens:int>>`
    * — explode it for one row per chunk.
    *
    * Every token appears in at least one chunk, chunk 0 starts at
    * token 0, and only the last chunk may be shorter than `window`
    * (ChunkerSpec pins these invariants plus exact reconstruction of
    * the token stream from the stride-prefix of each chunk). */
  def slidingChunks(text: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val ts = toks(text)
    transform(sequence(lit(0), slidingCount(size(ts), window, stride) - 1),
      c => {
        val chunk = slice(ts, c * stride + 1, lit(window))
        struct(c.cast("int").as("chunk_idx"),
          array_join(chunk, " ").as("chunk_text"),
          size(chunk).as("n_tokens"))
      })
  }

  /** Boundary-aligned chunk packing: split `text` into sentences at
    * `boundary` (a regex whose LAST GROUP is the sentence-final
    * character — default `([.!?])\s+`, the punctuation contract; the
    * separating whitespace is consumed), then bucket consecutive
    * sentences by START OFFSET: a sentence whose preceding token count
    * falls in `[k*maxTokens, (k+1)*maxTokens)` belongs to chunk `k`
    * (`chunk_idx = floor(tokens_before_sentence / maxTokens)`).
    * Boundary alignment is never broken — a sentence is never split
    * across chunks — so a chunk may overshoot `maxTokens` by less than
    * its final sentence's length (and an oversized sentence visibly
    * skips the bucket ids it consumed; ids are monotone, intentionally
    * not re-densified). Start-offset bucketing rather than greedy
    * capacity packing is deliberate: greedy packing is a sequential
    * reset-recurrence (chunk state feeds the next decision), which
    * neither a prefix sum here nor a window function in a replaying
    * SQL engine can express — bucketing keeps the operator a pure
    * per-row program AND cross-engine verifiable, with the same
    * boundary-alignment guarantee. Returns the same struct-array
    * shape as [[slidingChunks]].
    *
    * Implementation is the same zero-shuffle array program: mark
    * boundaries (`regexp_replace` keeps the final character via `$1`
    * and inserts `\u0001`), split, drop whitespace-only fragments,
    * prefix-sum token counts with one `aggregate` pass (the leading 0
    * of the accumulator makes `cums(i+1)` the inclusive prefix sum of
    * sentence `i` with no empty-array probes), then assemble each
    * distinct bucket's sentences in order. */
  def sentencePack(text: Column, maxTokens: Int,
                   boundary: String = "([.!?])\\s+"): Column = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val marked = regexp_replace(text, boundary, "$1\u0001")
    val sents = filter(split(marked, "\u0001"),
      s => length(trim(s)) > lit(0))
    val ntoks = transform(sents, s => size(toks(s)))
    // cums0 = [0, t0, t0+t1, ...]: cums0(i+2) is the inclusive prefix
    // sum of sentence i (1-based element_at; the seed 0 keeps every
    // access in range without try_element_at)
    val cums0 = aggregate(ntoks, array(lit(0)),
      (acc, x) => concat(acc, array(element_at(acc, size(acc)) + x)))
    val ids = transform(sents, (_, i) =>
      floor((element_at(cums0, i + lit(2)) - element_at(ntoks, i + lit(1)))
        .cast("double") / maxTokens).cast("int"))
    val tagged = transform(sents, (s, i) => struct(
      element_at(ids, i + lit(1)).as("cid"),
      s.as("sent"),
      element_at(ntoks, i + lit(1)).as("nt")))
    // ids are nondecreasing, so array_distinct's first-occurrence
    // order IS ascending bucket order
    transform(array_distinct(ids), c => {
      val mine = filter(tagged, z => z("cid") === c)
      struct(c.as("chunk_idx"),
        array_join(transform(mine, z => z("sent")), " ").as("chunk_text"),
        aggregate(mine, lit(0), (a, z) => a + z("nt")).as("n_tokens"))
    })
  }
}
