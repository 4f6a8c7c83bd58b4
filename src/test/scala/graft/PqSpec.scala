package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sim.{Pq, Similarity}

/** Product-quantization invariants: code-table shape + determinism on
  * the sf0.001 fixture, an EXACT algebraic check on a zero-
  * quantization-error corpus (every vector is a concatenation of
  * codebook entries, so ADC must reproduce the exact ranking), and a
  * pinned recall floor on the real fixture (whose embeddings are
  * near-random — the IVF recall gates measure ~55% there too, so the
  * floor is deliberately loose and the REAL accuracy contract is the
  * algebraic test). */
class PqSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("encode emits m in-range codes per vector, deterministically") {
    val (m, subDim, k) = (4, 16, 8)
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val cb = Pq.train(emb, "vec_id", "embedding", m, subDim, k, iterations = 1)
    assert(cb.count() == m.toLong * k)
    val codes = Pq.encode(emb, cb, "vec_id", "embedding", m, subDim)
    assert(codes.count() == n * m)
    val range = codes.agg(min("code"), max("code")).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) < k)
    val again = Pq.encode(emb, cb, "vec_id", "embedding", m, subDim)
    assert(codes.exceptAll(again).isEmpty && again.exceptAll(codes).isEmpty)
  }

  test("zero quantization error => ADC equals the exact ranking") {
    // 3 orthogonal-ish integer patterns per subspace; the corpus is
    // every concatenation, so x̂ = x and ADC must rank EXACTLY like
    // brute force (integer-valued doubles: no float drift at all)
    val pats = Seq(
      Seq(3f, 0f, 1f, 0f), Seq(0f, 3f, 0f, 1f), Seq(1f, 1f, 3f, 0f))
    val cb = (for (s <- 0 to 1; c <- pats.indices)
      yield (s, c, pats(c))).toDF("sub", "centroid_id", "cvec")
    val corpus = (for (a <- pats.indices; b <- pats.indices)
      yield ((a * 3 + b).toLong, pats(a) ++ pats(b)))
      .toDF("vec_id", "embedding")
    val codes = Pq.encode(corpus, cb, "vec_id", "embedding", m = 2, subDim = 4)
    // encoding recovers the construction indices
    val got = codes.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    for (a <- pats.indices; b <- pats.indices) {
      assert(got((a * 3 + b).toLong, 0) == a)
      assert(got((a * 3 + b).toLong, 1) == b)
    }
    val queries = corpus.where(col("vec_id") < 3)
    val adc = Pq.searchAdc(codes, cb, queries, "vec_id", "embedding",
        m = 2, subDim = 4, k = 4)
      .select("query_id", "rank", "neighbor_id", "cos")
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id",
        "embedding", k = 4)
      .select("query_id", "rank", "neighbor_id", "cos")
    assert(adc.exceptAll(exact).isEmpty && exact.exceptAll(adc).isEmpty)
  }

  test("opqRotation returns an orthonormal basis (R R^T = I)") {
    val emb = Tables.embeddings(spark, sf)
    val (_, basis, vals) = Pq.opqRotation(emb, "embedding", dim = 64)
    assert(basis.length == 64 && basis.forall(_.length == 64))
    // eigenvalues descending
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b - 1e-12 })
    for (i <- 0 until 64; j <- i until 64) {
      val d = (0 until 64).map(t => basis(i)(t) * basis(j)(t)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-7, s"<q$i, q$j> = $d")
    }
  }

  test("rotate preserves dot products (rotation invariance of the ground truth)") {
    val emb = Tables.embeddings(spark, sf).where(col("vec_id") < 20)
    val (_, basis, _) = Pq.opqRotation(
      Tables.embeddings(spark, sf), "embedding", dim = 64)
    val raw = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val rot = Pq.rotate(emb, "vec_id", "embedding", basis).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    for (a <- raw.keys; b <- raw.keys if a < b) {
      val dRaw = raw(a).zip(raw(b)).map { case (x, y) => x * y }.sum
      val dRot = rot(a).zip(rot(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dRaw - dRot) < 1e-5, s"dot($a,$b): $dRaw vs $dRot")
    }
  }

  test("varianceAllocation is a snake-balanced permutation") {
    val emb = Tables.embeddings(spark, sf)
    val perm = Pq.varianceAllocation(emb, "embedding", dim = 64, m = 4)
    assert(perm.sorted.toSeq == (0 until 64))
    // per-subspace variance sums are balanced by the snake deal: with
    // sorted values dealt boustrophedon, no subspace can hoard the
    // high-variance dims
    val x = col("x").cast("double")
    val v = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg((avg(x * x) - avg(x) * avg(x)).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val subSums = perm.grouped(16).map(_.map(v).sum).toSeq
    val spread = subSums.max - subSums.min
    val vs = v.values
    assert(spread <= (vs.max - vs.min) * 16.0 / 4 + 1e-9,
      s"subspace variance sums $subSums")
    info(s"subspace variance sums: ${subSums.map(s => f"$s%.4f").mkString(", ")}")
  }

  test("OPQ eigenbasis rotation does not degrade ADC fidelity") {
    // the Ge et al. premise, measured as mean |ADC cos - true cos|
    // over the same query/corpus pairs for raw vs eigSym-rotated PQ;
    // true cosine is rotation-invariant, so the comparison is direct
    val (m, subDim, k) = (4, 16, 8)
    val emb = Tables.embeddings(spark, sf)
    val (_, basis, _) = Pq.opqRotation(emb, "embedding", dim = 64)
    def meanAdcErr(corpus: org.apache.spark.sql.DataFrame,
                   vecCol: String): Double = {
      val queries = corpus.where(col("vec_id") < 5)
      val cb = Pq.train(corpus, "vec_id", vecCol, m, subDim, k, iterations = 2)
      val codes = Pq.encode(corpus, cb, "vec_id", vecCol, m, subDim)
      val adc = Pq.searchAdc(codes, cb, queries, "vec_id", vecCol,
          m, subDim, k = 20, roundTo = 6)
        .select(col("query_id"), col("neighbor_id"), col("cos").as("adc"))
      val truth = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 499, roundTo = 6)
        .select(col("query_id"), col("neighbor_id"), col("cos").as("t"))
      adc.join(truth, Seq("query_id", "neighbor_id"))
        .agg(avg(abs(col("adc") - col("t")))).head().getDouble(0)
    }
    val rawErr = meanAdcErr(emb, "embedding")
    val rot = Pq.rotate(emb, "vec_id", "embedding", basis)
    val rotErr = meanAdcErr(rot, "embedding")
    info(f"mean ADC error raw=$rawErr%.4f rotated=$rotErr%.4f")
    // the fixture's embeddings are near-isotropic (the eigen-spectrum
    // is almost flat — see the balanced variance sums above), so the
    // rotation cannot CONCENTRATE variance here and the honest
    // expectation is parity, not improvement (measured raw 0.2998 vs
    // rotated 0.3117). The contract pinned: rotating must not BREAK
    // the pipeline — fidelity stays within 10% of raw. The
    // improvement claim belongs to anisotropic corpora (Ge et al.
    // §6); this fixture cannot witness it.
    assert(rotErr <= rawErr * 1.1 + 1e-6,
      f"rotated ADC error $rotErr%.4f vs raw $rawErr%.4f")
  }

  test("ADC keeps a recall floor on the near-random fixture") {
    val (m, subDim, k) = (4, 16, 8)
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where(col("vec_id") < 5)
    val cb = Pq.train(emb, "vec_id", "embedding", m, subDim, k, iterations = 2)
    val codes = Pq.encode(emb, cb, "vec_id", "embedding", m, subDim)
    val approx = Pq.searchAdc(codes, cb, queries, "vec_id", "embedding",
        m, subDim, k = 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
        k = 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val overlaps = exact.map { case (q, ids) =>
      (approx.getOrElse(q, Set.empty) & ids).size }
    // deterministic: measured 0.8 mean on this fixture; floor pinned
    // below it so a silent scoring regression (not data noise) trips
    assert(overlaps.sum.toDouble / overlaps.size >= 0.6,
      s"mean overlap ${overlaps.sum.toDouble / overlaps.size}")
  }
}
