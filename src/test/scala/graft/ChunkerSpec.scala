package graft

import org.apache.spark.sql.functions._
import graft.text.Chunker

/** Invariants of the context-window chunkers (text.Chunker) against an
  * in-memory reference: full token coverage, overlap geometry, and —
  * for the sentence packer — boundary alignment under real
  * punctuation (the registry gate uses a token-suffix boundary because
  * the driver corpus is punctuation-free; this spec covers the
  * default `([.!?])\s+` contract). */
class ChunkerSpec extends SparkSpecBase {
  import spark.implicits._

  private val W = 8
  private val S = 5

  private def slide(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(Chunker.slidingChunks(col("text"), W, S)).as("ch"))
      .select(col("doc_id"), col("ch.chunk_idx"), col("ch.chunk_text"),
        col("ch.n_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .toSeq

  test("sliding chunks reconstruct the token stream and keep overlap geometry") {
    val texts = Seq(
      "a b c d e f g h i j k l m n o p q r s t u v w",   // 23 toks → 4 chunks
      "one two three",                                    // under one window
      (1 to 8).map("t" + _).mkString(" "),                // exactly one window
      (1 to 13).map("t" + _).mkString(" "))               // window + one step
    for ((txt, id) <- texts.zipWithIndex) {
      val toks = txt.trim.split("\\s+").toSeq
      val chunks = slide(Seq(txt)).map { case (_, i, c, n) => (i, c, n) }
      val expectedCount =
        if (toks.size <= W) 1
        else math.ceil((toks.size - W).toDouble / S).toInt + 1
      assert(chunks.map(_._1) == (0 until expectedCount), s"doc $id ids")
      for ((i, c, n) <- chunks) {
        val expected = toks.slice(i * S, i * S + W)
        assert(c == expected.mkString(" "), s"doc $id chunk $i text")
        assert(n == expected.size, s"doc $id chunk $i n_tokens")
      }
      // reconstruction: the stride-prefix of each chunk, concatenated,
      // is exactly the original token stream (so no token is lost and
      // overlap is precisely window - stride)
      val rebuilt = chunks.flatMap { case (i, c, _) =>
        val ts = c.split(" ").toSeq
        if (i == chunks.last._1) ts else ts.take(S)
      }
      assert(rebuilt == toks, s"doc $id reconstruction")
    }
  }

  test("sliding chunker rejects a stride wider than the window") {
    intercept[IllegalArgumentException] {
      Chunker.slidingChunks(col("text"), 4, 5)
    }
  }

  private def pack(texts: Seq[String], maxTokens: Int,
                   boundary: String = "([.!?])\\s+") =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(Chunker.sentencePack(col("text"), maxTokens, boundary)).as("ch"))
      .select(col("doc_id"), col("ch.chunk_idx"), col("ch.chunk_text"),
        col("ch.n_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .toSeq

  test("sentence packer aligns to punctuation boundaries and respects the budget") {
    val doc = "One two three. Four five! Six seven eight nine? " +
      "Ten. Eleven twelve thirteen fourteen fifteen sixteen seventeen. End."
    val out = pack(Seq(doc), maxTokens = 6)
    val sentences = Seq("One two three.", "Four five!",
      "Six seven eight nine?", "Ten.",
      "Eleven twelve thirteen fourteen fifteen sixteen seventeen.", "End.")
    // chunks concatenate back to the sentence sequence, in order
    assert(out.map(_._3).mkString(" ") == sentences.mkString(" "))
    // no sentence is ever split across chunks: every chunk re-splits
    // into whole sentences from the original sequence
    val bySentences = out.map(_._3.split("(?<=[.!?]) ").toSeq)
    assert(bySentences.flatten == sentences)
    // start-offset bucketing: each chunk's first sentence starts inside
    // its bucket, so a chunk overshoots the budget by less than its
    // last sentence's length
    val allNtoks = sentences.map(_.split("\\s+").length)
    var before = 0
    var si = 0
    for ((_, idx, _, _) <- out) {
      assert(before / 6 == idx, s"chunk $idx start offset $before")
      val nSents = bySentences(out.indexWhere(_._2 == idx)).size
      before += allNtoks.slice(si, si + nSents).sum
      si += nSents
    }
    for ((_, _, text, n) <- out) {
      val lastLen = bySentences(out.indexWhere(_._3 == text)).last.split("\\s+").length
      assert(n < 6 + lastLen, s"chunk '$text' n=$n overshoot bound")
    }
    // n_tokens is the whitespace token count of the chunk
    for ((_, _, text, n) <- out)
      assert(n == text.trim.split("\\s+").length, s"chunk '$text'")
    // chunk ids strictly increase (monotone buckets)
    assert(out.map(_._2) == out.map(_._2).sorted &&
      out.map(_._2).distinct == out.map(_._2))
  }

  test("sentence packer handles unpunctuated and empty-ish inputs") {
    // no boundary at all → one sentence → one chunk with the whole text
    val whole = pack(Seq("alpha beta gamma delta"), maxTokens = 2)
    assert(whole.map(_._3) == Seq("alpha beta gamma delta"))
    assert(whole.head._4 == 4)
    // trailing boundary produces no empty chunk
    val trail = pack(Seq("alpha beta. "), maxTokens = 10)
    assert(trail.map(_._3) == Seq("alpha beta."))
  }

  test("packer matches an in-memory bucket reference on random docs") {
    val rnd = new scala.util.Random(7)
    val words = Vector("ab", "cd", "ef", "gh", "ij")
    val docs = (1 to 25).map { _ =>
      val nSents = 1 + rnd.nextInt(6)
      (1 to nSents).map { _ =>
        val n = 1 + rnd.nextInt(7)
        (1 to n).map(_ => words(rnd.nextInt(words.size))).mkString(" ") + "."
      }.mkString(" ")
    }
    val maxT = 8
    val got = pack(docs, maxT).groupBy(_._1)
    for ((doc, id) <- docs.zipWithIndex) {
      val sents = doc.split("(?<=\\.) ").toSeq
      val ntoks = sents.map(_.split("\\s+").length)
      val cums = ntoks.scanLeft(0)(_ + _).tail
      val ids = cums.zip(ntoks).map { case (c, t) => (c - t) / maxT }
      val expected = sents.zip(ids).groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (cid, ss) =>
          (cid, ss.map(_._1).mkString(" "), ss.map(_._1.split("\\s+").length).sum)
        }
      val actual = got(id.toLong).sortBy(_._2).map(t => (t._2, t._3, t._4))
      assert(actual == expected, s"doc $id")
    }
  }
}
