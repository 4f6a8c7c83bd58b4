package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shingling + exact set-similarity primitives shared by the dedup
  * family. Column-only (codegen'd). */
object Shingles {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Shingles from an already-bound token-array column. The column
    * should be a materialized attribute (see docShingles), not an
    * inline expression: expressions referenced inside a `transform`
    * lambda are re-evaluated per element, so an inline split() here
    * costs O(shingles × n) re-tokenizations per document.
    *
    * guard: Spark's sequence(1, x) is DESCENDING for x < 1 — short
    * docs (< n tokens) must yield an empty shingle set instead. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ",
            (0 until n).map(k => element_at(toks, i + k)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Distinct word n-gram shingles ("a b c" strings) from raw text —
    * convenience single-expression form; prefer docShingles for
    * corpus-scale work (binds tokens once). */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Exact Jaccard similarity of two array columns (distinct-element
    * semantics). Integer-count division → bit-identical across
    * engines. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** (doc_id, shingles) preparation for a corpus: tokens bound to a
    * concrete column first so the shingle lambda reads an attribute
    * instead of re-running split() per element. */
  def docShingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    graft.core.Parallelism.widen(docs)
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      // size(__toks) >= n ⟺ shingles nonempty, but filtering on the
      // token count keeps Catalyst from pushing the full shingle
      // expression into the filter and computing it twice per row
      .where(size(col("__toks")) >= n)
      .select(col(idCol), shinglesFromTokens(col("__toks"), n).as("shingles"))

  /** LOSSLESS prefix-filter candidates for exact Jaccard ≥ tau — the
    * AllPairs/PPJoin principle (Chaudhuri et al. 2006; Xiao et al.
    * 2008): under any global total order of elements, |A∩B| ≥ o
    * implies the first |A|−o+1 elements of A intersect the first
    * |B|−o+1 of B; J ≥ tau gives o ≥ ⌈tau·max(|A|,|B|)⌉, so joining
    * per-doc prefixes of length |S|−⌈tau·|S|⌉+1 on shared elements
    * finds EVERY qualifying pair. The global order here is xxhash64
    * (a fixed random-ish order — cheap, no frequency pass; a df-sorted
    * order would shrink prefixes further on boilerplate-heavy corpora).
    *
    * Replaces log2-size blocking as the candidate generator: measured
    * at sf0.1, 568k candidates vs 9.26M size-blocked (16×), same exact
    * output after verification. The size-ratio test (J ≥ tau forces
    * tau·max ≤ min) prunes candidates again before the expensive
    * array-intersection verify. */
  def prefixFilterCandidates(docShingles: DataFrame, idCol: String,
                             tau: Double): DataFrame = {
    val hs = docShingles.select(col(idCol),
      array_sort(transform(col("shingles"), s => xxhash64(s))).as("hs"))
    val pref = hs.select(col(idCol), size(col("hs")).as("n"),
      explode(slice(col("hs"), lit(1),
        (size(col("hs")) - ceil(size(col("hs")) * tau) + 1).cast("int"))).as("h"))
    joinPrefixes(pref, idCol, tau)
  }

  /** [[prefixFilterCandidates]] under the document-frequency global
    * order — the actual AllPairs ordering: prefixes hold each doc's
    * RAREST shingles, so prefix buckets stay small even as common
    * shingles grow linearly with the corpus. Measured on the 10×
    * replica: hash-ordered candidates grow ~n^1.7 (common-shingle
    * buckets go quadratic) while df-ordered stays near-linear. Costs
    * one aggregation + join over the exploded shingles to attach df
    * ranks — the scale default; the hash order's cheaper plan wins
    * only on small corpora. */
  def prefixFilterCandidatesByDf(docShingles: DataFrame, idCol: String,
                                 tau: Double): DataFrame = {
    // hash at explode time: every downstream exchange (df groupBy, df
    // join, rank window, prefix self-join) then carries an 8-byte long
    // instead of the shingle string (~30-50 bytes) — the r4 profile
    // showed these exchanges dominating the candidate stage. The
    // 64-bit coarsening was ALREADY the join key below, so this adds
    // no new collision exposure (see verifyPairsHashed on why that
    // exposure is negligible and verified-safe).
    val ex = docShingles.select(col(idCol), size(col("shingles")).as("n"),
      explode(col("shingles")).as("s"))
      .select(col(idCol), col("n"), xxhash64(col("s")).as("h"))
    val df = ex.groupBy("h").agg(count(lit(1)).as("df"))
    // global total order: (df asc, hash) — xxhash64 spreads ties
    // within a df class uniformly; the hash doubles as the join key
    val ranked = ex.join(df, "h")
    val pref = ranked
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy(col("df"), col("h"))))
      .where(col("r") <= col("n") - ceil(col("n") * tau) + 1)
      .select(col(idCol), col("n"), col("h"), col("r"))
    joinPrefixes(pref, idCol, tau, positional = true)
  }

  /** Driver-side adaptive order choice between the two lossless prefix
    * filters (the SemDedup lean-plan pattern): both find every
    * qualifying pair, so the choice is pure cost. The df order pays a
    * frequency pass over the exploded shingles (agg + join + per-doc
    * rank window) that the hash order skips — measured ~4 s of the
    * sf0.1 gate — but keeps candidate growth near-linear where
    * hash-ordered candidates measured ~n^1.7 on the 10× replica
    * (common-shingle prefix buckets go quadratic). The crossover sits
    * between the measured points (hash cheaper at 5 k docs, df 2.5×
    * faster end-to-end at 50 k), so the default threshold is 20 k
    * docs. The count() probe is ~free when `docShingles` is persisted
    * (the gate's pattern): it materializes the cache the downstream
    * plan reuses. */
  def prefixFilterCandidatesAdaptive(docShingles: DataFrame, idCol: String,
                                     tau: Double,
                                     dfOrderMinDocs: Long = 20000L): DataFrame =
    if (docShingles.count() >= dfOrderMinDocs)
      prefixFilterCandidatesByDf(docShingles, idCol, tau)
    else
      prefixFilterCandidates(docShingles, idCol, tau)

  /** Shared prefix-bucket self-join + size-ratio prune over
    * (idCol, n, h[, r]) prefix rows.
    *
    * `positional` adds the PPJoin position filter (lossless): ranks
    * are monotone in the shared global order within each doc, so for
    * the MINIMAL shared prefix element s* of a truly-qualifying pair,
    * every common element ranks ≥ s* in both docs and overlap ≤ 1 +
    * min(na − ra, nb − rb); that row therefore survives the filter,
    * and keeping pairs where ANY generating row passes loses nothing.
    * Rows generated by later shared elements carry strictly smaller
    * bounds and are exactly the redundant candidates worth dropping
    * before the expensive verify join. */
  private def joinPrefixes(pref: DataFrame, idCol: String, tau: Double,
                           positional: Boolean = false): DataFrame = {
    val la = Seq(col("h"), col(idCol).as("a"), col("n").as("na")) ++
      (if (positional) Seq(col("r").as("ra")) else Nil)
    val lb = Seq(col("h"), col(idCol).as("b"), col("n").as("nb")) ++
      (if (positional) Seq(col("r").as("rb")) else Nil)
    val joined = pref.select(la: _*)
      .join(pref.select(lb: _*), Seq("h"))
      .where(col("a") < col("b"))
      .where(least(col("na"), col("nb")) >=
        ceil(greatest(col("na"), col("nb")) * tau))
    val pruned = if (positional)
      joined.where(lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) >=
        ceil(greatest(col("na"), col("nb")) * tau))
    else joined
    pruned.select("a", "b").distinct()
  }

  /** Exact all-pairs candidates verification: join candidate pairs with
    * both shingle sets and keep those at/above the threshold. The
    * candidate set bounds the join size — LSH prunes, this verifies. */
  def verifyPairs(candidates: DataFrame, docShingles: DataFrame,
                  idCol: String, threshold: Double): DataFrame =
    verifyPairsAcross(candidates, docShingles, docShingles, idCol, threshold)

  /** (doc_id, n, hs) preparation for [[verifyPairsHashed]]: each doc's
    * shingle set as a SORTED array of xxhash64 values. */
  def docShingleHashes(docShingles: DataFrame, idCol: String): DataFrame =
    docShingles.select(col(idCol), size(col("shingles")).as("n"),
      array_sort(transform(col("shingles"), s => xxhash64(s))).as("hs"))

  /** [[verifyPairs]] over hashed shingle sets: the verify join carries
    * 8-byte longs instead of shingle strings (3-5× less exchange
    * volume — the r4 10× profile showed the verify exchange dominating
    * the whole query), and |A∪B| is derived as na + nb − |A∩B| so the
    * per-pair work is ONE array_intersect, not intersect + union.
    *
    * Exactness: a hash collision can only merge two distinct shingles
    * — expected colliding shingle pairs ≈ D²/2⁶⁵ for D distinct
    * shingles, i.e. ~5 corpus-wide even at 10¹⁰ shingles (100 TB
    * scale), each perturbing only pairs that contain both strings.
    * The oracle gate verifies the output is exact at test scale; a
    * caller needing string-exact jaccard regardless of corpus uses
    * [[verifyPairs]]. */
  def verifyPairsHashed(candidates: DataFrame, shingleHashes: DataFrame,
                        idCol: String, threshold: Double): DataFrame = {
    val left = shingleHashes.select(col(idCol).as("a"),
      col("n").as("na"), col("hs").as("hs_a"))
    val right = shingleHashes.select(col(idCol).as("b"),
      col("n").as("nb"), col("hs").as("hs_b"))
    candidates
      .join(left, "a").join(right, "b")
      .withColumn("i", size(array_intersect(col("hs_a"), col("hs_b"))).cast("double"))
      .withColumn("jaccard", col("i") / (col("na") + col("nb") - col("i")))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** [[verifyPairs]] with distinct corpora on each side of the pair
    * (a from `leftShingles`, b from `rightShingles`) — the
    * cross-corpus incremental form. */
  def verifyPairsAcross(candidates: DataFrame, leftShingles: DataFrame,
                        rightShingles: DataFrame, idCol: String,
                        threshold: Double): DataFrame = {
    val left = leftShingles.select(col(idCol).as("a"), col("shingles").as("sh_a"))
    val right = rightShingles.select(col(idCol).as("b"), col("shingles").as("sh_b"))
    candidates
      .join(left, "a").join(right, "b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
