package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Random-hyperplane (sign-projection) LSH for cosine similarity — the
  * bucketed scale path for embedding near-duplicate detection,
  * complementing `Similarity.nearDupPairs` (the exact baseline) and
  * `Similarity.Ivf` (query-time ANN).
  *
  * Signature: nBits sign bits of dot products against fixed seeded
  * hyperplanes (sign(v·w_j) survives any rotation-invariant scaling, so
  * P[bit collision] = 1 - θ/π — the standard SRP-LSH guarantee).
  * Candidates: banded signature buckets (pigeonhole: two vectors at
  * cosine ≥ τ disagree on few bits, so some band of consecutive bits
  * matches with high probability). Verification: exact cosine on
  * candidates only.
  *
  * Scale shape (same as dedup.MinHashLSH): the corpus-wide work is one
  * explode + two partial-aggregable shuffles of (id, band) pairs; the
  * self-join runs on (band, bandValue) buckets whose size tracks true
  * duplicate density, never O(n²). Embedding payloads move once into
  * the signature pass and once per verified candidate.
  */
object RhpLsh {

  /** Deterministic ±1 hyperplane components, seeded driver-side
    * (Rademacher planes are standard for SRP and keep the dot products
    * exact in integer-scaled arithmetic). Broadcast-sized: nBits×dim. */
  def planeMatrix(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** [[planeMatrix]] as a (j, i, w) DataFrame for the declarative
    * signature path. */
  def planes(spark: SparkSession, dim: Int, nBits: Int, seed: Long): DataFrame = {
    val m = planeMatrix(dim, nBits, seed)
    val rows = for (j <- 0 until nBits; i <- 0 until dim) yield (j, i, m(j)(i))
    import spark.implicits._
    rows.toDF("j", "i", "w")
  }

  /** Per-vector nBits signature as a long bitmap.
    *
    * Default path: the native [[graft.plans.RhpSig]] kernel — the whole
    * signature stays inside the projection (no shuffle until the LSH
    * bucket join). `native = false` keeps the declarative
    * explode + broadcast-join + partial-aggregable-sum formulation,
    * bit-exact with the kernel (both fold the dot product
    * left-to-right); SimSpec asserts the equivalence. */
  def signatures(corpus: DataFrame, idCol: String, vecCol: String,
                 nBits: Int = 16, seed: Long = 42,
                 native: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(native || nBits <= 64,
      "the declarative parity path packs one 64-bit word")
    if (nBits > 64)
      // wide signature: array of 64-bit words (band geometry must grow
      // with the corpus — see RhpSigWide)
      corpus.select(col(idCol).as("id"),
        graft.plans.RhpSigWide(col(vecCol).cast("array<double>"),
          planeMatrix(dim, nBits, seed)).as("sig"))
    else if (native)
      corpus.select(col(idCol).as("id"),
        graft.plans.RhpSig(col(vecCol).cast("array<double>"),
          planeMatrix(dim, nBits, seed)).as("sig"))
    else {
      val p = planes(spark, dim, nBits, seed)
      corpus
        .select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("i", "v")))
        .join(broadcast(p), "i")
        .groupBy(col("id"), col("j"))
        .agg(sum(col("v").cast("double") * col("w")).as("proj"))
        .groupBy("id")
        .agg(sum(when(col("proj") >= 0, expr("shiftleft(CAST(1 AS BIGINT), j)"))
          .otherwise(0L)).as("sig"))
    }
  }

  /** Index (0-based) of the first band on which two signatures agree —
    * pure int64 bit arithmetic: collapse each bandBits-wide group of
    * the xor into its low bit, invert, isolate the lowest set group
    * bit, count the bits below it. Defined only for signature pairs
    * that DO share a band (true of every bucket-joined row, since the
    * band value IS the band's bits, not a hash of them). */
  private def firstMatchBand(sa: Column, sb: Column, bandBits: Int): Column = {
    val x = sa.bitwiseXOR(sb)
    val collapsed = (0 until bandBits)
      .map(k => shiftrightunsigned(x, k)).reduce(_.bitwiseOR(_))
    var mask = 0L
    var j = 0
    while (j * bandBits < 64) { mask |= 1L << (j * bandBits); j += 1 }
    val z = bitwise_not(collapsed).bitwiseAND(lit(mask))
    (call_function("bit_count", z.bitwiseAND(-z) - 1) / bandBits).cast("int")
  }

  /** All-pairs within at-cap buckets, star-links within over-cap ones.
    *
    * A bucket larger than `maxBucketSize` is, by the banding math, a
    * dense duplicate cluster (random band collisions are ~n²/2^bandBits
    * — sized to stay far below the cap), and all-pairs inside it is the
    * one quadratic term the bucketed plan can hit. Dropping such
    * buckets (the pre-r6 behavior) silently un-deduped exactly the
    * heavy-duplicate clusters a production dedup targets. Instead each
    * over-cap bucket DEGRADES: every member is linked to the bucket's
    * minimum id, so candidate volume stays linear in bucket size and a
    * keep-lowest-id dedup still removes every member that matches the
    * representative. Exactness caveat: a member whose similarity to
    * the representative falls below the verify threshold keeps only
    * its star edge from this bucket (other bands may still pair it),
    * so for clusters TIGHTER than the threshold — the case that
    * produces over-cap buckets at all — the result equals all-pairs. */
  private def bucketJoin(banded: DataFrame, maxBucketSize: Int): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window.partitionBy("band", "bval")
    val sized = banded
      .withColumn("__n", count(lit(1)).over(win))
      .withColumn("__min", min(col("id")).over(win))
    val small = sized.where(col("__n") <= maxBucketSize)
    val l = small.select(col("band"), col("bval"), col("id").as("a"))
    val r = small.select(col("band"), col("bval"), col("id").as("b"))
    val allPairs = l.join(r, Seq("band", "bval"))
      .where(col("a") < col("b"))
      .select("a", "b")
    val starPairs = sized.where(col("__n") > maxBucketSize)
      .where(col("id") =!= col("__min"))
      .select(col("__min").as("a"), col("id").as("b"))
    allPairs.unionByName(starPairs).distinct()
  }

  /** Candidate pairs from banded buckets: band b = bits
    * [b·bandBits, (b+1)·bandBits); equal band value → candidate.
    *
    * Uncapped path (`maxBucketSize == Int.MaxValue`): a pair matching
    * k bands would surface k times, and the distinct() that collapses
    * them re-shuffles the whole joined stream — at low thresholds
    * (tiny bands, candidates ≈ pairs) that distinct dominates the
    * query (measured 6.3 s of dedup_embedding's 7.6 s at sf0.1).
    * Instead each pair is emitted ONLY at its first matching band
    * ([[firstMatchBand]] on the signatures both sides already carry),
    * which is exact and needs no dedup pass. With a bucket cap the
    * trick is unsafe — the first matching band may have been capped
    * away while a later one survived — so the capped path keeps
    * distinct(), and over-cap buckets degrade to star-links
    * ([[bucketJoin]]) instead of being dropped. */
  def candidatePairs(sigs: DataFrame, nBits: Int, bandBits: Int,
                     maxBucketSize: Int = 1000): DataFrame = {
    val nBands = nBits / bandBits
    val banded = sigs.select(col("id"), col("sig"),
        posexplode(sequence(lit(0), lit(nBands - 1))).as(Seq("pos", "band")))
      .select(col("id"), col("sig"), col("band"),
        expr(s"shiftrightunsigned(sig, band * $bandBits)")
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bval"))
    if (maxBucketSize == Int.MaxValue) {
      val l = banded.select(col("band"), col("bval"), col("id").as("a"), col("sig").as("siga"))
      val r = banded.select(col("band"), col("bval"), col("id").as("b"), col("sig").as("sigb"))
      l.join(r, Seq("band", "bval"))
        .where(col("a") < col("b"))
        .where(col("band") === firstMatchBand(col("siga"), col("sigb"), bandBits))
        .select("a", "b")
    } else bucketJoin(banded.drop("sig"), maxBucketSize)
  }

  /** [[candidatePairs]] over wide (array-of-words) signatures:
    * `bandBits` must divide 64 so no band spans a word boundary; band
    * b reads bits [b·bandBits, …) of word b·bandBits/64. Keeps the
    * capped+distinct shape (the first-match trick is specific to
    * single-word xor arithmetic); over-cap buckets degrade to
    * star-links ([[bucketJoin]]). */
  def candidatePairsWide(sigs: DataFrame, nBits: Int, bandBits: Int,
                         maxBucketSize: Int = 1000): DataFrame = {
    require(64 % bandBits == 0, s"bandBits must divide 64, got $bandBits")
    val nBands = nBits / bandBits
    val perWord = 64 / bandBits
    val banded = sigs.select(col("id"), col("sig"),
        posexplode(sequence(lit(0), lit(nBands - 1))).as(Seq("pos", "band")))
      .select(col("id"), col("band"),
        expr(s"shiftrightunsigned(element_at(sig, CAST(band div $perWord AS INT) + 1), " +
            s"CAST((band % $perWord) * $bandBits AS INT))")
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bval"))
    bucketJoin(banded, maxBucketSize)
  }

  /** Driver-side band geometry for the production near-dup regime,
    * chosen from corpus size the way `Shingles
    * .prefixFilterCandidatesAdaptive` picks its prefix order: pick the
    * narrowest bandBits ∈ {8, 16, 32} whose value space covers the
    * corpus (2^bandBits ≥ n), so EXPECTED random-pair collisions per
    * band value stay Θ(1) and candidate volume tracks true duplicate
    * density; keep 8 bands (per-pair miss at the duplicate-regime
    * per-bit collision p ≈ 0.99: (1 − p^bandBits)^8 — ≤ 4e-9 for
    * bandBits 8, ≤ 2.4e-7 for 16, bounded by exact verify either way).
    * Returns (nBits, bandBits); nBits = 8 × bandBits, so n ≤ 256 uses
    * the single-word kernel and larger corpora the wide one.
    * Geometry table: see docs/SCALE.md. */
  def chooseProdGeometry(n: Long): (Int, Int) = {
    val bandBits = Seq(8, 16, 32).find(b => (1L << b) >= n).getOrElse(32)
    (8 * bandBits, bandBits)
  }

  /** End-to-end near-duplicate pairs at/above `threshold`: signature →
    * banded candidates → exact-cosine verification (so precision is 1
    * by construction; recall is the banding probability, asserted
    * against the exact baseline in SimSpec). */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, nBits: Int = 16, bandBits: Int = 4,
                   seed: Long = 42, roundTo: Int = 4,
                   maxBucketSize: Int = 1000): DataFrame = {
    val sigs = signatures(corpus, idCol, vecCol, nBits, seed)
    // persisted (a,b) pairs give AQE real stats for the verify joins;
    // the estimate otherwise forces a SortMergeJoin that shuffles the
    // embedding arrays once per candidate (the candidate stream is
    // long-pairs — cheap to spill; the vectors are the heavy side)
    val cands = (if (nBits <= 64) candidatePairs(sigs, nBits, bandBits, maxBucketSize)
                 else candidatePairsWide(sigs, nBits, bandBits, maxBucketSize))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vec = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      Similarity.norm(col(vecCol)).as("__n"))
    cands
      .join(vec.select(col("__id").as("a"), col("__v").as("va"), col("__n").as("na")), "a")
      .join(vec.select(col("__id").as("b"), col("__v").as("vb"), col("__n").as("nb")), "b")
      .select(col("a"), col("b"),
        graft.functions.ScoreFns.scoreRound(
          Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")),
          roundTo).as("cos"))
      .where(col("cos") >= threshold)
  }
}
