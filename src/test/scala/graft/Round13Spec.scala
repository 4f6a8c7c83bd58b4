package graft

import org.apache.spark.sql.functions._
import graft.sim.Pca

/** Round-13 wave pins: the DuckDB gates prove both engines run the
  * same formula; these re-derive each operator from first principles
  * in plain Scala (true eigendecomposition, brute-force weighted
  * sampling, hand-merged span intervals) and pin the distributed
  * implementations against them. */
class Round13Spec extends SparkSpecBase {
  import spark.implicits._

  // ---- Pca.eigSym ----

  private def randSym(d: Int, seed: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val a = Array.fill(d, d)(0.0)
    for (i <- 0 until d; j <- i until d) {
      val v = rnd.nextDouble() - 0.5
      a(i)(j) = v; a(j)(i) = v
    }
    a
  }

  test("eigSym reconstructs A = V diag(w) V^T and sorts eigenvalues") {
    val d = 8
    val a = randSym(d, 11)
    val (w, v) = Pca.eigSym(a)
    assert(w.sliding(2).forall(p => p.length < 2 || p(0) >= p(1) - 1e-12))
    // orthonormal rows
    for (p <- 0 until d; q <- 0 until d) {
      val dot = (0 until d).map(i => v(p)(i) * v(q)(i)).sum
      assert(math.abs(dot - (if (p == q) 1.0 else 0.0)) < 1e-9,
        s"v($p)·v($q) = $dot")
    }
    // reconstruction
    for (i <- 0 until d; j <- 0 until d) {
      val r = (0 until d).map(k => v(k)(i) * w(k) * v(k)(j)).sum
      assert(math.abs(r - a(i)(j)) < 1e-9, s"A($i)($j): $r vs ${a(i)(j)}")
    }
  }

  test("orthogonalIteration converges to eigSym's dominant subspace") {
    // planted spectrum with a decisive gap after the top 2
    val d = 10
    val (_, base) = Pca.eigSym(randSym(d, 23)) // an orthonormal basis
    val w = Array(9.0, 7.5, 0.4, 0.3, 0.25, 0.2, 0.15, 0.1, 0.05, 0.01)
    val a = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => base(k)(i) * w(k) * base(k)(j)).sum)
    val q = Pca.orthogonalIteration(a, k = 2, iters = 3)
    // columns orthonormal (up to the documented 6dp rounding)
    for (p <- 0 until 2; r <- 0 until 2) {
      val dot = (0 until d).map(i => q(p)(i) * q(r)(i)).sum
      assert(math.abs(dot - (if (p == r) 1.0 else 0.0)) < 1e-4)
    }
    // energy captured by the iterated basis ≈ top-2 eigen energy
    val energy = (0 until 2).map { c =>
      (0 until d).map(i => (0 until d).map(j =>
        q(c)(i) * a(i)(j) * q(c)(j)).sum).sum
    }.sum
    assert(energy > 0.999 * (w(0) + w(1)), s"captured $energy of ${w(0) + w(1)}")
  }

  test("project centers and projects with driver-side constants") {
    val emb = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(3.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val mu = Array(2.0, 0.0)
    val basis = Array(Array(1.0, 0.0)) // identity direction
    val got = Pca.project(emb, "vec_id", "embedding", mu, basis, 4)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, -1.0), (2L, 1.0)))
  }

  // ---- Sampling.weightedSample ----

  test("weightedSample equals the brute-force sorted A-ES selection") {
    val df = (1L to 400L).map(i => (i, 1L + i % 17)).toDF("id", "w")
      .repartition(7)
    val got = graft.curate.Sampling.weightedSample(df, "id", "w", k = 50)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // brute force: same hash → uniform → key arithmetic, global sort
    val brute = (1L to 400L).map { i =>
      val h = Pca.hash60(s"aes:$i")
      val u = (h.toDouble + 1.0) / 1.152921504606846976e18
      val w = 1L + i % 17
      (Pca.r(-math.log(u) / w, 10), i, w)
    }.sortBy(t => (t._1, t._2)).take(50)
    assert(got.length == 50)
    got.zip(brute).zipWithIndex.foreach { case (((rank, id, w, key), (bk, bi, bw)), idx) =>
      assert(rank == idx + 1)
      assert(id == bi && w == bw && key == bk,
        s"rank ${idx + 1}: got ($id,$w,$key) want ($bi,$bw,$bk)")
    }
  }

  test("weightedSample excludes null and non-positive weights") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(0L)), (4L, Some(-3L)),
      (5L, Some(2L))).toDF("id", "w")
    val ids = graft.curate.Sampling.weightedSample(df, "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 5L))
  }

  test("weightedSample is a pure function of (id, salt)") {
    val df1 = (1L to 100L).map(i => (i, i)).toDF("id", "w").repartition(5)
    val df2 = (1L to 100L).reverse.map(i => (i, i)).toDF("id", "w")
    val a = graft.curate.Sampling.weightedSample(df1, "id", "w", 10)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    val b = graft.curate.Sampling.weightedSample(df2, "id", "w", 10)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(a == b) // input order / partitioning invisible
    val c = graft.curate.Sampling.weightedSample(df1, "id", "w", 10,
      salt = "other").orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(a != c) // a different salt is an independent redraw
  }

  // ---- SpanDedup.maximalDupSpans ----

  test("maximalDupSpans merges overlapping dup windows into maximal runs") {
    // shared phrase "a b c d" (w=3 → dup windows at its 2 positions)
    // appears in docs 1 and 2; doc 1 carries it twice, separated by
    // enough unique filler that the two occurrences stay SEPARATE runs
    val docs = Seq(
      (1L, "a b c d u1 u2 u3 u4 u5 a b c d"),
      (2L, "x y a b c d z w q"),
      (3L, "entirely unique text with no shared window at all")
    ).toDF("doc_id", "text")
    val got = graft.dedup.SpanDedup.maximalDupSpans(docs, "doc_id", "text", 3)
      .orderBy("doc_id", "start_win").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // doc1: tokens 0..3 and 9..12 are "a b c d" → windows {0,1} and {9,10}
    // doc2: tokens 2..5 → windows {2,3}; doc3: nothing
    assert(got.toSeq == Seq(
      (1L, 0L, 1L, 2L, 4L),
      (1L, 9L, 10L, 2L, 4L),
      (2L, 2L, 3L, 2L, 4L)), s"got ${got.toSeq}")
  }

  test("maximalDupSpans bridges touching dup windows (gap == w) only") {
    // doc1 = "p q r s t u": dup windows "p q r" (pos 0) and "s t u"
    // (pos 3) — gap 3 == w, token intervals [0,3) and [3,6) touch →
    // ONE run cutting all 6 tokens. doc2 carries the same two phrases
    // separated by 3 unique tokens (gap 6 > w) → two separate runs.
    val docs = Seq(
      (1L, "p q r s t u"),
      (2L, "p q r z1 z2 z3 s t u")
    ).toDF("doc_id", "text")
    val got = graft.dedup.SpanDedup.maximalDupSpans(docs, "doc_id", "text", 3)
      .orderBy("doc_id", "start_win").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, 3L, 2L, 6L),
      (2L, 0L, 0L, 1L, 3L),
      (2L, 6L, 6L, 1L, 3L)), s"got ${got.toSeq}")
  }
}
