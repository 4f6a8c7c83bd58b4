package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Asymmetric shingle CONTAINMENT — the near-dup signal Jaccard and
  * cosine both miss: when document B is document A plus a lot of new
  * material (quote expansion, boilerplate wrapping, version n+1 of a
  * page), |A∩B|/|A∪B| is diluted by B's extra content but
  * c(A→B) = |S(A)∩S(B)| / |S(A)| stays near 1. Broder's containment
  * measure, the backbone of "keep the superset, drop the subset"
  * curation rules.
  *
  * Candidate generation is the inverted-index join over DISTINCT
  * (doc, shingle) postings with a df ∈ [2, maxDf] stop-shingle cap (a
  * corpus-wide shingle would generate an all-pairs candidate set; one
  * in > maxDf docs carries no identity signal). The cap is ABSOLUTE,
  * and that is load-bearing for scale: with df ≤ C the candidate
  * volume is Σ df² ≤ C·Σ df — LINEAR in the posting count — while a
  * corpus-fraction cap makes it quadratic (measured: a 4%-of-corpus
  * cap ran 4.9 s at sf0.1 but 93 s at sf1, exponent 1.28). The
  * semantics justify it too: "this exact trigram appears in 2..C
  * documents" is an identity signal whose meaning does not depend on
  * corpus size — a phrase shared by 100k documents is boilerplate at
  * any scale. C is a signal knob, not a coverage knob; pairs linked
  * ONLY through hotter-than-C phrases belong to the LSH family
  * (MinHashLSH/RhpLsh), not to an exact pairwise audit.
  *
  * Two variants. [[pairs]] computes containment in the PRUNED shingle
  * space — |S(·)| counts kept shingles only, so the ratio is
  * "containment over discriminative phrasing", a deliberate signal
  * choice with a hard candidate bound. [[pairsExact]] (the r13
  * PPJoin-style upgrade, the gate's form) keeps the FULL space and
  * full recall via prefix filtering, paying the true output mass of
  * exact containment instead. Counts all integral in both: the
  * division is the only float step, bit-identical across engines.
  */
object Containment {

  /** Document pairs (a < b) whose containment in EITHER direction
    * reaches `threshold`, with both directed ratios, in the df-capped
    * shingle space (see object doc; [[pairsExact]] is the lossless
    * form). Output: (a, b, c_ab, c_ba) ordered by (a, b). */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
            threshold: Double, n: Int = 3,
            maxDf: Int = 100): DataFrame = {
    val posts = docs
      .select(col(idCol).as("id"),
        Shingles.tokens(lower(col(textCol))).as("__toks"))
      .select(col("id"),
        explode(Shingles.shinglesFromTokens(col("__toks"), n)).as("sh"))
    val kept = posts.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= maxDf)
    val p = posts.join(kept.select("sh"), Seq("sh"))
    val sizes = p.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = p.select(col("sh"), col("id").as("a"))
      .join(p.select(col("sh"), col("id").as("b")), Seq("sh"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    inter
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), "b")
      .select(col("a"), col("b"),
        round(col("common").cast("double") / col("sza"), 4).as("c_ab"),
        round(col("common").cast("double") / col("szb"), 4).as("c_ba"))
      .where(col("c_ab") >= threshold || col("c_ba") >= threshold)
      .orderBy("a", "b")
  }

  /** LOSSLESS containment join over the FULL shingle space — the
    * PPJoin-style upgrade of [[pairs]]: no df cap, so no cap-induced
    * misses and |S(·)| means what it says, yet still never all-pairs.
    *
    * The prefix principle, adapted to the asymmetric measure: a pair
    * qualifies iff common ≥ ⌈t·min(|A|,|B|)⌉ (the direction with the
    * smaller denominator is the larger ratio), so under the AllPairs
    * global order (df ascending, hash tie-break — each doc's prefix
    * holds its RAREST shingles) the smaller document's prefix of
    * length |A| − ⌈t·|A|⌉ + 1 must intersect B. Unlike the symmetric
    * Jaccard join ([[Shingles.prefixFilterCandidatesByDf]]), the
    * INDEX side must stay full — a subset's partner can be
    * arbitrarily large, so there is no size-ratio prune and no
    * partner-side prefix — which is also why the candidate volume,
    * Σ_h dfPrefix(h)·df(h), is the inherent cost of EXACT containment:
    * a short all-boilerplate document genuinely is contained in a
    * large fraction of the corpus, and the output itself carries that
    * mass. The candidate set is then cut by the pigeonhole count
    * threshold (see the inline comment) before anything expensive
    * touches it, losslessly.
    *
    * Verification is one sorted-hash-array intersection per surviving
    * pair ([[Shingles.verifyPairsHashed]]'s 8-byte-coarsening
    * argument: collisions ≈ D²/2⁶⁵ corpus-wide, gate-verified exact at
    * test scale). Counts integral; division is the only float step.
    * Output (a, b, c_ab, c_ba), both directions, pair kept when
    * either rounded ratio reaches `threshold`. */
  def pairsExact(docs: DataFrame, idCol: String, textCol: String,
                 threshold: Double, n: Int = 3): DataFrame = {
    val lev = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val ds = Shingles.docShingles(
      docs.select(col(idCol), lower(col(textCol)).as(textCol)),
      idCol, textCol, n).persist(lev)
    val ex = ds.select(col(idCol), size(col("shingles")).as("n"),
      explode(col("shingles")).as("s"))
      .select(col(idCol), col("n"), xxhash64(col("s")).as("h"))
    val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
    // one ranked posting list serves BOTH roles (probe prefix + full
    // index) — persisted so the df pass and rank window run once
    val ranked = ex.join(dfreq, "h")
      .withColumn("r", row_number().over(
        Window.partitionBy(idCol).orderBy(col("df"), col("h"))))
      .select(col(idCol), col("n"), col("h"), col("r"))
      .persist(lev)
    // EXTENDED prefix + count threshold (the pigeonhole strengthening
    // of the prefix principle): with o = ⌈t·|A|⌉ required matches,
    // fewer than j of A's first |A| − o + j elements in B forces
    // common ≤ (j−1) + (o−j) < o — so a qualifying pair must match at
    // least jEff = min(j, o) rows of the extended prefix, and a
    // per-pair HAVING count ≥ jEff prunes losslessly BEFORE the
    // expensive verify. This is the load-bearing filter at low
    // thresholds: the classic 1-element prefix filter leaves every
    // pair sharing ONE moderately-rare shingle alive (measured at
    // sf1/t=0.5: 55M candidate pairs for a 2.9k output, verify-bound
    // at 46 s), while requiring 4 shared rare-prefix shingles cuts
    // candidates ~400× for three extra posting rows per document.
    val j = 4
    val o = ceil(col("n") * threshold)
    val jEff = least(lit(j), o)
    val pref = ranked.where(col("r") <= col("n") - o + jEff)
    val cand = pref
      .select(col("h"), col(idCol).as("x"), col("n").as("nx"))
      .join(ranked.select(col("h"), col(idCol).as("y"), col("n").as("ny")),
        Seq("h"))
      .where(col("x") =!= col("y"))
      // the completeness lemma only needs the SMALLER doc's prefix to
      // probe the index — rows where the probe is the larger partner
      // are redundant candidates, and dropping them roughly halves the
      // join fan-out (equal sizes keep both orientations, harmless)
      .where(col("nx") <= col("ny"))
      .groupBy(col("x"), col("y"), col("nx"))
      .agg(count(lit(1)).as("m"))
      .where(col("m") >= least(lit(j), ceil(col("nx") * threshold)))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
    val hs = Shingles.docShingleHashes(ds, idCol)
    // reap: the pair list is output-sized (tiny vs the cached posting
    // lists); checkpointing it releases both corpus-sized caches at
    // call exit instead of leaking them for the session (r13 item 3)
    graft.core.Caching.reap(
      cand
        .join(hs.select(col(idCol).as("a"), col("n").as("na"),
          col("hs").as("hs_a")), "a")
        .join(hs.select(col(idCol).as("b"), col("n").as("nb"),
          col("hs").as("hs_b")), "b")
        .withColumn("common",
          size(array_intersect(col("hs_a"), col("hs_b"))).cast("double"))
        .select(col("a"), col("b"),
          round(col("common") / col("na"), 4).as("c_ab"),
          round(col("common") / col("nb"), 4).as("c_ba"))
        .where(col("c_ab") >= threshold || col("c_ba") >= threshold),
      ds, ranked)
      // order on the read-back frame: reap's read-back is unordered,
      // so a sort inside the reaped plan is paid and then lost
      .orderBy("a", "b")
  }
}
