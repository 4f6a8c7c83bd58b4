package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection.
  *
  * Pipeline (all declarative, two shuffles total before verification):
  *   shingle → xxhash64 → k permuted mins per doc (one grouped agg)
  *   → band hashes → bucket self-join → candidate pairs → exact
  *   Jaccard verification (Shingles.verifyPairs).
  *
  * Scale shape: the only joins are (band_idx, band_hash)-bucketed —
  * at 100 TB candidates stay proportional to true duplicates (plus a
  * vanishing false-positive rate), never O(n²). AQE's skew-join
  * handling covers pathological buckets (e.g. boilerplate shingles);
  * `maxBucketSize` hard-caps them like production dedup pipelines do.
  *
  * Default 64 permutations as 16 bands × 4 rows: detection prob at
  * jaccard j is 1-(1-j⁴)¹⁶ → 0.00006 at j=0.2, 0.47 at j=0.5 band
  * threshold ~0.56, >1-4e-8 at j≥0.9.
  */
object MinHashLSH {

  val Prime = 2038074743L // large 31-bit prime for (a*h+b) % p

  /** Deterministic permutation constants (splitmix-style avalanche of
    * the permutation index — reproducible run to run). */
  def permConsts(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      var z = (i + 1).toLong * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      val a = math.abs(z ^ (z >>> 31)) % (Prime - 1) + 1
      val b = math.abs(java.lang.Long.reverse(z)) % Prime
      (a, b)
    }

  /** MinHash signature per doc: exploded (doc, shingle-hash) rows into
    * one grouped aggregation of k mins.
    *
    * Deliberately NOT a per-row higher-order-function expression: the
    * 64 min-aggregates are codegen'd and combine MAP-SIDE (partial
    * aggregation), so the exchange carries only (doc, 64 mins) — the
    * exploded pairs never cross the network. A measured HOF variant
    * (array_min over transform per permutation) ran 1.6× slower at
    * sf0.1 because lambda evaluation is interpreted. */
  def signatures(docShingles: DataFrame, idCol: String, numPerms: Int): DataFrame = {
    val hashed = docShingles
      .select(col(idCol), explode(col("shingles")).as("sh"))
      .select(col(idCol), pmod(xxhash64(col("sh")), lit(Prime)).as("h"))
    val mins: Seq[Column] = permConsts(numPerms).zipWithIndex.map {
      case ((a, b), i) =>
        min(pmod(col("h") * lit(a) + lit(b), lit(Prime))).as(s"m$i")
    }
    hashed.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Same signature, computed by the native one-pass kernel
    * (graft.plans.MinHashSig) — bit-identical output, no explode and
    * no aggregation: a narrow map over the shingle arrays. */
  def signaturesNative(docShingles: DataFrame, idCol: String, numPerms: Int): DataFrame =
    docShingles.select(col(idCol),
      graft.plans.MinHashSig(col("shingles"), numPerms, Prime,
        permConsts(numPerms)).as("sig"))

  /** Banded candidate pairs: hash each band of the signature, bucket-join
    * on (band_idx, band_hash), emit a<b pairs. */
  def candidatePairs(signatures: DataFrame, idCol: String, bands: Int,
                     numPerms: Int = 64, maxBucketSize: Int = 1000): DataFrame = {
    val rowsPerBand = numPerms / bands
    val rows = signatures.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)))
          .as(Seq("band_idx", "band_hash")))
    // cap pathological buckets (boilerplate-heavy corpora); persist the
    // banded rows — the self-join below would otherwise recompute the
    // whole signature subtree for BOTH sides
    val sized = rows
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band_idx", "band_hash")))
      .where(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = sized.select(col("band_idx"), col("band_hash"), col(idCol).as("a"))
    val r = sized.select(col("band_idx"), col("band_hash"), col(idCol).as("b"))
    l.join(r, Seq("band_idx", "band_hash"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Full near-dup pipeline: docs → verified duplicate pairs. The
    * shingle sets feed both the signature pass and the verification
    * join; persisting them (memory-and-disk, spills at scale) halves
    * the shingling work. */
  def nearDuplicatePairs(docs: DataFrame, idCol: String, textCol: String,
                         shingleSize: Int = 3, numPerms: Int = 64,
                         bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    val ds = Shingles.docShingles(docs, idCol, textCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = signaturesNative(ds, idCol, numPerms) // 5x the declarative path
    val cands = candidatePairs(sigs, idCol, bands, numPerms)
    Shingles.verifyPairs(cands, ds, idCol, threshold)
  }

  /** (band_idx, band_hash, id) rows of a signature set. */
  private def bandRows(sigs: DataFrame, idCol: String, bands: Int,
                       numPerms: Int): DataFrame = {
    val rowsPerBand = numPerms / bands
    sigs.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)))
        .as(Seq("band_idx", "band_hash")))
  }

  /** Cross-corpus near-duplicates: fresh docs (a) near-duplicating
    * seen/archive docs (b) — the per-crawl incremental analog of
    * ExactDedup.dedupAgainst. Candidate buckets join FRESH bands
    * against SEEN bands only, so fresh×fresh and seen×seen pairs
    * never form: a daily crawl's candidate volume is proportional to
    * its true overlap with the archive, not to archive size. At
    * production scale the archive's banded rows are precomputed once
    * and stored bucketed on (band_idx, band_hash) — each crawl then
    * joins without reshuffling the archive. `maxBucketSize` caps
    * archive-side boilerplate buckets (same policy as
    * candidatePairs). */
  def nearDuplicatesAgainst(fresh: DataFrame, seen: DataFrame,
                            idCol: String, textCol: String,
                            shingleSize: Int = 3, numPerms: Int = 64,
                            bands: Int = 16, threshold: Double = 0.5,
                            maxBucketSize: Int = 1000): DataFrame = {
    val fs = Shingles.docShingles(fresh, idCol, textCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ss = Shingles.docShingles(seen, idCol, textCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fr = bandRows(signaturesNative(fs, idCol, numPerms), idCol, bands, numPerms)
      .select(col("band_idx"), col("band_hash"), col(idCol).as("a"))
    val sr = bandRows(signaturesNative(ss, idCol, numPerms), idCol, bands, numPerms)
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band_idx", "band_hash")))
      .where(col("bucket_n") <= maxBucketSize)
      .select(col("band_idx"), col("band_hash"), col(idCol).as("b"))
    val cands = fr.join(sr, Seq("band_idx", "band_hash"))
      .select("a", "b").distinct()
    Shingles.verifyPairsAcross(cands, fs, ss, idCol, threshold)
  }
}
