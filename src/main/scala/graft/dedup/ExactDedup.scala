package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Exact deduplication by canonical-text hash: groupBy(md5(normalized))
  * keeping the lowest id — one shuffle on the 128-bit key, the standard
  * first stage of any training-data pipeline. At 100 TB the md5 key
  * (not the text) is what shuffles when `keyOnly` is used. */
object ExactDedup {

  /** Annotate each row with its dedup key. */
  def withKey(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("dedup_key", TextAnalysis.fingerprintMd5(col(textCol)))

  /** Keep exactly one row (min id) per canonical text. Shuffles only
    * (key, id) before joining winners back — text bytes move once.
    *
    * Null-text rows always survive: a null key cannot be judged a
    * duplicate of anything, and routing them around the semi-join is
    * load-bearing — an equi-join on a null key matches nothing, so
    * without the split EVERY null-text document would silently vanish
    * from the corpus (caught by NullRobustnessSpec). */
  def dedupKeepFirst(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = withKey(docs, textCol)
    val nullKey = col("dedup_key").isNull
    val winners = keyed.where(!nullKey).select(col("dedup_key"), col(idCol))
      .groupBy("dedup_key").agg(min(col(idCol)).as(idCol))
    keyed.where(!nullKey)
      .join(winners, Seq("dedup_key", idCol), "left_semi")
      .unionByName(keyed.where(nullKey))
      .drop("dedup_key")
  }

  /** Keep the BEST copy (highest `priorityCol`, ties → lowest id) per
    * canonical text — the production refinement of keep-first: when a
    * document exists in several sources/snapshots, retain the copy
    * from the preferred source (e.g. highest quality score or most
    * recent crawl). Same scale shape as [[dedupKeepFirst]]: the argmax
    * is one map-side-combinable max(struct), shuffling only
    * (key, priority, id). */
  def dedupKeepBest(docs: DataFrame, idCol: String, textCol: String,
                    priorityCol: String): DataFrame = {
    val keyed = withKey(docs, textCol)
    val nullKey = col("dedup_key").isNull
    val winners = keyed.where(!nullKey)
      .select(col("dedup_key"), col(idCol), col(priorityCol))
      .groupBy("dedup_key")
      .agg(max(struct(col(priorityCol), (-col(idCol)).as("negid"))).as("m"))
      .select(col("dedup_key"), (-col("m.negid")).as(idCol))
    keyed.where(!nullKey)
      .join(winners, Seq("dedup_key", idCol), "left_semi")
      .unionByName(keyed.where(nullKey)) // null text: see dedupKeepFirst
      .drop("dedup_key")
  }

  /** Cross-snapshot incremental dedup: keep only rows of `fresh` whose
    * canonical text never appeared in `seen` — the per-crawl pass that
    * admits a new snapshot against the accumulated corpus.
    *
    * Scale shape: a left_anti on the 16-byte md5 key, so the seen side
    * contributes key-width rows to the exchange, never text. When the
    * seen key set is stable across runs, persist it as a bucketed table
    * on dedup_key and the anti-join becomes shuffle-free on the seen
    * side; a Bloom filter over seen keys pushed into the fresh scan
    * (Spark's runtime-filter/DPP machinery or an explicit
    * `might_contain`) cuts the fresh side before the exchange too. */
  def dedupAgainst(fresh: DataFrame, seen: DataFrame, textCol: String): DataFrame =
    withKey(fresh, textCol)
      .join(withKey(seen, textCol).select("dedup_key"), Seq("dedup_key"), "left_anti")
      .drop("dedup_key")

  /** [[dedupAgainst]] with an explicit broadcast Bloom prefilter — the
    * 100 TB shape. Spark's runtime bloom-filter pruning only applies
    * where dropping non-matching probe rows is safe (inner/semi); for
    * an ANTI join the non-matching rows are exactly the answer, so the
    * optimizer can never inject one and the filter must be applied by
    * hand, inverted: rows whose key the filter rules OUT of `seen` are
    * definitely new and bypass the shuffle entirely; only possible
    * dups (true dups + an `fpp` fraction of new rows) reach the
    * anti-join for exact verification. No false negatives exist, so
    * the result is identical to [[dedupAgainst]] — the filter only
    * moves rows off the exchange. With typical inter-snapshot dup
    * rates of 20-50%, this cuts the shuffled fresh side ~2-5×; `seen`
    * is read twice (filter build + join), so persist its key column or
    * keep it as a bucketed key table across runs. */
  def dedupAgainstBloom(fresh: DataFrame, seen: DataFrame, textCol: String,
                        fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val seenKeys = withKey(seen, textCol).select("dedup_key")
    val n = math.max(seenKeys.count(), 1L)
    // native bloom path (no UDF): BloomFilterAggregate builds the
    // sketch over xxhash64(key) longs; BloomFilterMightContain
    // (codegen'd) probes it with the same hash, so no false negatives
    // — identical guarantee to the sketch library's string API. The
    // expressions are constructed directly (the SQL names are in
    // Spark's internal-only registry, reserved for the runtime-filter
    // rewrite rule).
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(n, fpp)
    val bfBytes = seenKeys
      .agg(GraftColumnBridge.column(
        new BloomFilterAggregate(
          GraftColumnBridge.expression(xxhash64(col("dedup_key"))),
          GraftColumnBridge.expression(lit(n)),
          GraftColumnBridge.expression(lit(numBits)))
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val keyed = withKey(fresh, textCol)
    val might = GraftColumnBridge.column(
      new BloomFilterMightContain(
        GraftColumnBridge.expression(lit(bfBytes)),
        GraftColumnBridge.expression(xxhash64(col("dedup_key")))))
    // null-key rows (null text) bypass to the "definitely new" branch:
    // an anti-join never matches a null key, so both paths agree —
    // and the probe expression never sees a null (ADVICE r1)
    val nullKey = col("dedup_key").isNull
    keyed.where(nullKey || !might)
      .unionByName(
        keyed.where(!nullKey && might)
          .join(seenKeys, Seq("dedup_key"), "left_anti"))
      .drop("dedup_key")
  }
}
