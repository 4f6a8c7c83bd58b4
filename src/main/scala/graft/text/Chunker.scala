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
  /** Let-binding for Column expressions: evaluate `value` ONCE and
    * expose it to `body` as a lambda variable. Catalyst has no `let`,
    * and an expression referenced from inside a higher-order-function
    * lambda is RE-EVALUATED per element (lambda bodies sit outside
    * both codegen subexpression elimination and CollapseProject's
    * duplication check) — binding through a one-element `transform`
    * makes every reference a cheap NamedLambdaVariable read. The
    * first text_chunk_pack draft skipped this and nested five arrays
    * deep; re-evaluation compounded multiplicatively per level and
    * the sf0.1 gate ran for minutes instead of seconds. */
  private def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  def slidingChunks(text: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    bind(toks(text)) { ts =>
      transform(sequence(lit(0), slidingCount(size(ts), window, stride) - 1),
        c => {
          val chunk = slice(ts, c * stride + 1, lit(window))
          struct(c.cast("int").as("chunk_idx"),
            array_join(chunk, " ").as("chunk_text"),
            size(chunk).as("n_tokens"))
        })
    }
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
    * and inserts `\\u0001`), split, drop whitespace-only fragments,
    * then ONE sequential `aggregate` fold over the sentences that
    * carries (running token count, chunks-so-far) and either extends
    * the last chunk or opens a new one per sentence. The fold touches
    * only lambda variables -- per the [[bind]] caveat, any outer
    * array expression referenced inside a lambda would be
    * re-evaluated per element; the first draft of this operator
    * derived buckets by cross-referencing prefix-sum arrays five
    * lambdas deep, and the compounding re-evaluation turned the
    * sf0.1 gate from seconds into minutes. */
  def sentencePack(text: Column, maxTokens: Int,
                   boundary: String = "([.!?])\\s+"): Column = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val marked = regexp_replace(text, boundary, "$1\u0001")
    val sents = filter(split(marked, "\u0001"),
      s => length(trim(s)) > lit(0))
    val chunkType =
      "array<struct<chunk_idx:int,chunk_text:string,n_tokens:int>>"
    val zero = struct(lit(0).as("cum"), array().cast(chunkType).as("chunks"))
    aggregate(
      sents,
      zero,
      (acc, s) => bind(size(toks(s))) { nt =>
        val cum = acc("cum")
        val chunks = acc("chunks")
        val cid = floor(cum.cast("double") / maxTokens).cast("int")
        // the And short-circuits, so the last-element probe never runs
        // on an empty chunk list; CaseWhen branches evaluate lazily
        val last = element_at(chunks, size(chunks))
        val extended = concat(
          slice(chunks, lit(1), size(chunks) - 1),
          array(struct(cid.as("chunk_idx"),
            concat_ws(" ", last("chunk_text"), s).as("chunk_text"),
            (last("n_tokens") + nt).as("n_tokens"))))
        val opened = concat(chunks,
          array(struct(cid.as("chunk_idx"), s.as("chunk_text"),
            nt.as("n_tokens"))))
        struct((cum + nt).as("cum"),
          when(size(chunks) > 0 && last("chunk_idx") === cid, extended)
            .otherwise(opened).as("chunks"))
      },
      acc => acc("chunks"))
  }
}
