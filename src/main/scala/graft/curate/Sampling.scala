package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for training-data curation: stable
  * train/val/test splits and per-group quotas.
  *
  * Both ops key on md5 of the row id rather than rand(): the split is
  * a pure function of the id, so it is reproducible across runs,
  * engines and cluster sizes, and survives re-partitioning — the
  * property a training pipeline needs so that no validation document
  * ever leaks into train between runs. Cost shape: hashSplit is a
  * narrow map (no shuffle); perGroupQuota is one hash exchange on the
  * group key + per-group top-k.
  */
object Sampling {

  /** 0..15 bucket from the first hex digit of md5(id) — identical
    * arithmetic is expressible in any engine with md5 (DuckDB:
    * strpos('0123..f', substr(md5(x),1,1)) - 1). */
  def hexBucket(id: Column): Column =
    (instr(lit("0123456789abcdef"), substring(md5(id.cast("string")), 1, 1)) - 1)
      .cast("int")

  /** Assign each row a stable split label: buckets 0-12 → train
    * (13/16 = 81.25%), 13 → val, 14-15 → test. */
  def hashSplit(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("split",
      when(hexBucket(col(idCol)) < 13, lit("train"))
        .when(hexBucket(col(idCol)) === 13, lit("val"))
        .otherwise(lit("test")))

  /** Keep at most `quota` rows per group, chosen by a deterministic
    * md5 shuffle of the id (so the sample is unbiased w.r.t. any
    * ordering of the source data but fully reproducible). */
  def perGroupQuota(df: DataFrame, groupCol: String, idCol: String,
                    quota: Int): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Leakage-safe split: near-duplicate documents must all land in the
    * SAME split, or held-out text leaks into train through paraphrases
    * and the eval is contaminated by construction. `clusters` is
    * (id, cluster) from [[graft.dedup.Clusters.connectedComponents]]
    * over near-dup pairs; documents in no cluster split by their own
    * id, so the assignment degenerates to [[hashSplit]] exactly when
    * there are no duplicates.
    *
    * Scale shape: `clusters` has one row per document that HAS a
    * near-dup — proportional to duplicates, not corpus — so the
    * left join is broadcastable in realistic corpora; the split
    * itself stays a pure narrow map of the coalesced key. */
  def clusterSafeSplit(df: DataFrame, idCol: String,
                       clusters: DataFrame): DataFrame =
    hashSplit(
      df.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
        .withColumn("__split_key", coalesce(col("cluster"), col(idCol))),
      "__split_key")
      .drop("__split_key", "cluster")

  /** Temperature-scaled source mixing: sample ~`totalTarget` rows with
    * per-source quotas ∝ count^alpha (alpha < 1 upweights rare
    * sources — the standard rebalancing for multi-source training
    * mixtures), rows chosen by the deterministic md5 order.
    *
    * The normalizer is one scalar aggregate over #sources (tiny);
    * quotas broadcast back onto the corpus, so the only corpus-sized
    * exchange is the per-source window. */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
                     alpha: Double, totalTarget: Long): DataFrame = {
    // sqrt (correctly rounded IEEE) for the common alpha=0.5 instead of
    // pow (1-ulp slack), and 6-decimal stabilization of weights and
    // normalizer: summation order must not flip a quota round() across
    // engines/runs
    val weight: Column => Column =
      if (alpha == 0.5) sqrt(_) else pow(_, lit(alpha))
    val weights = df.groupBy(sourceCol)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", round(weight(col("__n").cast("double")), 6))
    val z = BigDecimal(weights.agg(sum("__w")).first().getDouble(0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val quotas = weights.withColumn("__quota",
        least(round(col("__w") / z * totalTarget).cast("long"), col("__n")))
      .select(col(sourceCol), col("__quota"))
    val w = Window.partitionBy(sourceCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(quotas), sourceCol)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Token-budget selection: keep the highest-`qualityCol` documents
    * until the cumulative `tokensCol` count reaches `budget` (the
    * standard "best N tokens" corpus cut for a training run). A row
    * is kept iff the total tokens of strictly-better rows — order
    * (`qualityCol` DESC, `idCol` ASC), so selection is deterministic —
    * is `< budget`; the budget-crossing document is included, so the
    * selection always covers the budget when the corpus can.
    *
    * SEMANTICS are the naive global running sum (the DuckDB oracle
    * replays exactly that window); the IMPLEMENTATION never sorts the
    * corpus. A quality histogram (one map-side-combined aggregate
    * into `buckets` cells) finds the boundary bucket on the driver;
    * buckets strictly above it are kept by a narrow filter, buckets
    * below are dropped by the same filter, and only the ~corpus/
    * `buckets` rows INSIDE the boundary bucket pay a running-sum sort
    * — the selected set is provably identical to the global-sort
    * answer because equal qualities always share a bucket. At 100 TB:
    * two scans (histogram + filter) plus a range-partitioned sort +
    * prefix sum over one bucket — parallel even when a ties-heavy
    * quality distribution collapses the corpus into that bucket.
    *
    * Rows with null quality or token count are never selected (they
    * have no place in a quality ordering). Returns `df`'s rows
    * unchanged; if the budget exceeds the corpus, all non-null rows
    * are kept. */
  def tokenBudget(df: DataFrame, idCol: String, qualityCol: String,
                  tokensCol: String, budget: Long,
                  buckets: Int = 1024): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val clean = df.where(col(qualityCol).isNotNull && col(tokensCol).isNotNull)
    if (budget == 0) return clean.limit(0)
    val mm = clean.agg(min(col(qualityCol)).cast("double"),
      max(col(qualityCol)).cast("double")).head()
    if (mm.isNullAt(0)) return clean // empty input
    val (qmin, qmax) = (mm.getDouble(0), mm.getDouble(1))
    val width = if (qmax > qmin) qmax - qmin else 1.0
    val bucketOf = least(lit(buckets - 1),
      floor((col(qualityCol).cast("double") - qmin) / width * buckets)
        .cast("int"))
    val hist = clean.groupBy(bucketOf.as("__b"))
      .agg(sum(col(tokensCol).cast("long")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // walk buckets best-first to the one where the running total
    // crosses the budget
    var above = 0L
    var boundary = -1
    val it = hist.keys.toSeq.sorted(Ordering[Int].reverse).iterator
    while (boundary < 0 && it.hasNext) {
      val b = it.next()
      if (above + hist(b) >= budget) boundary = b else above += hist(b)
    }
    if (boundary < 0) return clean // budget exceeds the corpus
    val remaining = budget - above
    val withB = clean.withColumn("__b", bucketOf)
    // The boundary-bucket running sum uses the range-partitioned
    // prefix-sum (IdOps.runningTotal), NOT an unpartitioned window: a
    // degenerate quality distribution (heavy ties) collapses the whole
    // corpus into ONE bucket, and `sum().over(orderBy)` would then
    // funnel it through a single WindowExec task — the same A8
    // rationale curriculumBins documents, applied here. Normal case is
    // still ~corpus/buckets rows; the prefix-sum just removes the
    // degenerate single-task cliff.
    val edgeSorted = withB.where(col("__b") === boundary)
      .withColumn("__tok", col(tokensCol).cast("long"))
      .sort(col(qualityCol).desc, col(idCol))
    val edge = graft.ops.IdOps.runningTotal(edgeSorted, "__tok", "__before")
      .where(col("__before") < remaining)
      .drop("__b", "__tok", "__before")
    withB.where(col("__b") > boundary).drop("__b").unionByName(edge)
  }

  /** Weighted k-sampling WITHOUT replacement — the Efraimidis–Spirakis
    * exponential-keys scheme (A-ES, "Weighted random sampling with a
    * reservoir", IPL 97(5), 2006): each row draws a uniform
    * u ∈ (0, 1] and keys on e = −ln(u)/w; the k SMALLEST keys are
    * distributed exactly as sequential weighted sampling without
    * replacement (each draw picks i with probability wᵢ/Σ remaining).
    * The standard corpus-mixing primitive quota/temperature sampling
    * doesn't cover: "give me k documents, inclusion biased by weight,
    * reproducibly".
    *
    * Reproducible by construction: u comes from the salted 60-bit md5
    * hash of the id ((h+1)/2^60, never 0), not rand() — the sample is
    * a pure function of (id, salt), stable across runs, engines,
    * cluster sizes and input order, and a different `salt` is an
    * independent redraw. Keys are rounded to 10 decimals (ties broken
    * by id) so a 1-ulp ln() divergence between engines can't flip the
    * boundary.
    *
    * Scale shape: key assignment is a NARROW map (no shuffle, no
    * global sort — the classic `ORDER BY key LIMIT k` spelling sorts
    * the corpus); selection is one [[graft.plans.BoundedTopK]]
    * aggregate — an O(k) heap per task that combines map-side, so the
    * exchange carries numPartitions·k structs regardless of corpus
    * size. Rows with null or non-positive weight are excluded (they
    * have no sampling mass). Output: (rank, id, weight, key) for the
    * k winners, rank 1 = smallest key. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String = "aes"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = graft.sketch.Sketches.hash60(
      concat(lit(salt + ":"), col(idCol).cast("string")))
    // (h+1)/2^60 ∈ (0,1]: h+1 exceeds double's 53-bit mantissa, but
    // long→double is round-to-nearest IEEE on every engine, so both
    // sides see the same u; 2^60 is a power of two (exact literal).
    val u = (h.cast("double") + 1.0d) / 1.152921504606846976e18d
    val key = graft.functions.ScoreFns.scoreRound(
      -log(u) / col(weightCol).cast("double"), 10)
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol), col(weightCol), key.as("__key"))
      // largest (−key, −id) struct = smallest key, ties to smaller id;
      // weight rides along as payload (never reached by the ordering:
      // (key, id) is already unique)
      .agg(graft.plans.BoundedTopK(
        struct((-col("__key")).as("nk"), (-col(idCol)).as("nid"),
          col(weightCol).as("w")), k).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "e")))
      .select((col("i") + 1).cast("long").as("rank"),
        (-col("e.nid")).as(idCol), col("e.w").as(weightCol),
        (-col("e.nk")).as("key"))
  }

  /** Curriculum binning: order the corpus by a difficulty proxy
    * (ascending `orderCol`, ties broken by `idCol` for determinism)
    * and cut it into `nBins` contiguous rank bins — the easy→hard
    * schedule a curriculum-trained run consumes bin by bin.
    *
    * The global rank comes from a range-partitioned sort +
    * zipWithIndex ([[graft.ops.IdOps.generateConsecutiveIds]]), NOT a
    * row_number over an empty window: an un-partitioned window
    * funnels the whole corpus through one task, while the sort keeps
    * every partition parallel (same A8 rationale). bin =
    * rank * nBins / n, so bin sizes differ by at most one and the
    * boundary arithmetic replays exactly in any engine with
    * row_number. */
  def curriculumBins(df: DataFrame, orderCol: String, idCol: String,
                     nBins: Int): DataFrame = {
    val n = df.count()
    require(n > 0, "curriculumBins: empty input")
    graft.ops.IdOps
      .generateConsecutiveIds(df.sort(orderCol, idCol), "__rank", 0L)
      // integral `div`: double `/` is exact here only while 1/n stays
      // above ulp(nBins) — true even at 1e12 rows, but div costs nothing
      .withColumn("bin", expr(s"int((__rank * $nBins) div ${n}L)"))
      .drop("__rank")
  }
}
