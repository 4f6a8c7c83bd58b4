package graft

import org.apache.spark.sql.functions._
import graft.dedup.Containment
import graft.graph.{KCore, Triangles}
import graft.sim.SparseCosine

/** Brute-force cross-checks on seeded random inputs for the r9
  * lexical-similarity and graph operators — the oracle gates pin one
  * corpus; these pin the ALGEBRA (any corpus, any graph), so a
  * refactor that survives the fixed dataset by luck still fails here. */
class LexicalSimSpec extends SparkSpecBase {
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")

  private def randomDocs(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = 6 + rnd.nextInt(10)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  private def shingleSet(text: String, n: Int): Set[String] =
    text.split("\\s+").toSeq.sliding(n).filter(_.size == n)
      .map(_.mkString(" ")).toSet

  test("containment matches brute force on random docs") {
    val docs = randomDocs(7, 40)
    val df = docs.toDF("doc_id", "text")
    val maxDf = 15
    // reference: df-windowed shingle space, exact pairwise containment
    val sets = docs.map { case (id, t) => id -> shingleSet(t.toLowerCase, 3) }
    val dfCount = sets.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val keptSets = sets.map { case (id, s) =>
      id -> s.filter(sh => dfCount(sh) >= 2 && dfCount(sh) <= maxDf)
    }.toMap
    val expected = (for {
      (a, sa) <- keptSets; (b, sb) <- keptSets
      if a < b && sa.nonEmpty && sb.nonEmpty
      common = (sa & sb).size
      cab = BigDecimal(common.toDouble / sa.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      cba = BigDecimal(common.toDouble / sb.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cab >= 0.3 || cba >= 0.3
    } yield (a, b) -> ((cab, cba))).toMap
    val got = Containment.pairs(df, "doc_id", "text",
        threshold = 0.3, n = 3, maxDf = maxDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == expected,
      s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
  }

  test("sparse cosine ranks the exact tf-idf cosine on random docs") {
    val docs = randomDocs(11, 30)
    val df = docs.toDF("doc_id", "text")
    val got = SparseCosine.topPairs(df, "doc_id", "text",
        k = 5, maxDf = 20, n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // reference: exact tf-idf cosine in the same pruned space
    val shingles = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").toSeq.sliding(2)
        .filter(_.size == 2).map(_.mkString(" ")).toSeq
    }
    val dfCount = shingles.flatMap(_._2.distinct)
      .groupBy(identity).view.mapValues(_.size)
    val n = docs.size.toDouble
    val w = shingles.map { case (id, sh) =>
      id -> sh.groupBy(identity).collect {
        case (s, occ) if dfCount(s) >= 2 && dfCount(s) <= 20 =>
          s -> occ.size * BigDecimal(math.log(n / dfCount(s)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }.toMap
    def cos(a: Long, b: Long): Option[Double] = {
      val (wa, wb) = (w(a), w(b))
      val dot = wa.keySet.intersect(wb.keySet).toSeq
        .map(s => wa(s) * wb(s)).sum
      if (dot == 0.0) None
      else {
        val na = math.sqrt(wa.values.map(x => x * x).sum)
        val nb = math.sqrt(wb.values.map(x => x * x).sum)
        Some(BigDecimal(dot / (na * nb))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val expected = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      c <- cos(a, b)
    } yield (a, b, c)).sortBy { case (a, b, c) => (-c, a, b) }.take(5)
    assert(got.toSeq == expected, s"got=${got.toSeq}\nexpected=$expected")
  }

  test("triangle stats match brute-force triple enumeration") {
    val rnd = new scala.util.Random(13)
    val nodes = 0L until 25L
    val edges = (for {
      a <- nodes; b <- nodes if a < b && rnd.nextInt(5) == 0
    } yield (a, b)).toSeq
    val df = edges.toDF("a", "b")
    val es = edges.toSet
    def linked(x: Long, y: Long) =
      es.contains((math.min(x, y), math.max(x, y)))
    val tris = (for {
      x <- nodes; y <- nodes if x < y; z <- nodes if y < z
      if linked(x, y) && linked(x, z) && linked(y, z)
    } yield 1).size
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size)
    val wedges = deg.values.map(d => d.toLong * (d - 1) / 2).sum
    val row = Triangles.stats(df).head()
    assert(row.getLong(0) == tris, s"triangles ${row.getLong(0)} != $tris")
    assert(row.getLong(1) == wedges)
  }

  test("k-core peel rounds match brute-force iteration") {
    val rnd = new scala.util.Random(29)
    val nodes = 0L until 30L
    var edges = (for {
      a <- nodes; b <- nodes if a < b && rnd.nextInt(4) == 0
    } yield (a, b)).toSet
    val df = edges.toSeq.toDF("a", "b")
    val got = KCore.peelRounds(df, k = 3, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val expected = (1 to 3).map { r =>
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size)
      val keep = deg.collect { case (id, d) if d >= 3 => id }.toSet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
      (r, keep.size.toLong, edges.size.toLong)
    }
    assert(got.toSeq == expected, s"got=${got.toSeq} expected=$expected")

    // the shuffled-semi-join fallback (survivor set above the broadcast
    // cap) must produce the identical rounds table
    val noBcast = KCore.peelRounds(df, k = 3, rounds = 3, broadcastCap = 0L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(noBcast.toSeq == expected,
      s"fallback path diverged: ${noBcast.toSeq} != $expected")
  }
}
