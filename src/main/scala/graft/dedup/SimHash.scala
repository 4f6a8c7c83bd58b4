package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate sketch: 64-bit signature whose Hamming
  * distance approximates feature-set distance.
  *
  * Per doc: features (shingles) → xxhash64 → per-bit ±1 votes summed in
  * ONE grouped aggregation (64 conditional sums, codegen'd — not 64
  * passes); signature bit i = sign(vote_i). Candidates via 4×16-bit
  * band buckets (a pair within Hamming distance ≤3 of a 64-bit hash
  * must agree exactly on ≥1 of the 4 bands — pigeonhole), then exact
  * Hamming verification with bit_count(xor).
  *
  * Same scale shape as MinHashLSH: bucketed self-join, no O(n²).
  */
object SimHash {

  /** 64-bit simhash per doc: exploded feature hashes into one grouped
    * aggregation of 64 conditional vote sums.
    *
    * Like MinHashLSH.signatures, deliberately NOT a per-row HOF
    * expression: the vote sums are codegen'd and combine map-side, so
    * only (doc, 64 votes) reaches the exchange; a measured
    * aggregate+zip_with variant ran 3.6× slower at sf0.1 (interpreted
    * lambdas, per-step array allocation). */
  def signatures(docShingles: DataFrame, idCol: String): DataFrame = {
    val hashed = docShingles
      .select(col(idCol), explode(col("shingles")).as("sh"))
      .select(col(idCol), xxhash64(col("sh")).as("h"))
    // vote_i = sum(bit_i(h) ? 1 : -1); signature bit i set iff vote_i > 0
    val votes = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"v$i")
    }
    hashed.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until 64).map(i =>
          when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Same signature via the native one-pass kernel (bit-identical;
    * see graft.plans.SimHashSig). */
  def signaturesNative(docShingles: DataFrame, idCol: String): DataFrame =
    docShingles.select(col(idCol),
      graft.plans.SimHashSig(col("shingles")).as("simhash"))

  /** Cross-engine-portable 64-bit feature hash: the first 16 hex chars
    * of md5 read big-endian into a signed long — bit-identical to
    * DuckDB's `('0x'||substr(md5(s),1,8))::BIGINT` assembly, so a SQL
    * oracle can replay the full signature+banding pipeline. Costlier
    * than xxhash64 (md5 is cryptographic); the xxhash kernel
    * ([[signaturesNative]]) is the production default. */
  def portableHash64(s: Column): Column =
    shiftleft(conv(substring(md5(s), 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(md5(s), 9, 8), 16, 10).cast("long"))

  /** [[signatures]] with the portable md5-derived feature hash. */
  def signaturesPortable(docShingles: DataFrame, idCol: String): DataFrame = {
    val hashed = docShingles
      .select(col(idCol), explode(col("shingles")).as("sh"))
      .select(col(idCol), portableHash64(col("sh")).as("h"))
    val votes = (0 until 64).map { i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(lit(1L)) =!= 0, 1)
        .otherwise(-1)).as(s"v$i")
    }
    hashed.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until 64).map(i =>
          when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Candidate pairs whose 64-bit signatures share at least one of the
    * four 16-bit bands; verified by exact Hamming distance.
    * `portable = true` swaps xxhash64 for [[portableHash64]] so the
    * whole pipeline is replayable by an external SQL oracle — still
    * through the native one-pass kernel ([[signaturesPortable]] is the
    * declarative cross-check, asserted bit-exact in SimHashSigSpec). */
  def nearPairs(docShingles: DataFrame, idCol: String, maxHamming: Int,
                portable: Boolean = false): DataFrame = {
    val sigs = docShingles.select(col(idCol),
      graft.plans.SimHashSig(col("shingles"), portable).as("simhash"))
    val banded = sigs.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band_idx", "band_val")))
    val l = banded.select(col("band_idx"), col("band_val"),
      col(idCol).as("a"), col("simhash").as("sig_a"))
    val r = banded.select(col("band_idx"), col("band_val"),
      col(idCol).as("b"), col("simhash").as("sig_b"))
    l.join(r, Seq("band_idx", "band_val"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      // filter BEFORE the pair-dedup exchange: hamming is a pure
      // function of (a,b), so the distinct sees only qualifying pairs
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
