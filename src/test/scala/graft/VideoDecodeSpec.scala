package graft

import graft.multimodal.{AviCodec, BinaryPipeline, SyntheticVideo, VideoPipeline}

/** Real RIFF/AVI decode path: exact DIB round-trip, container
  * sniffing, totality over garbage, and frame extraction. */
class VideoDecodeSpec extends SparkSpecBase {
  import spark.implicits._

  private def expectFrameCs(id: Long, f: Int): Long = {
    val (w, h) = (SyntheticVideo.width(id), SyntheticVideo.height(id))
    var cs = 0L
    for (y <- 0 until h; x <- 0 until w)
      cs += SyntheticVideo.pixel(id, f, x, y).toLong * (y.toLong * w + x + 1)
    cs
  }

  test("AVI round-trip reproduces dims, fps, frame count, and pixel checksum") {
    val ids = Seq(0L, 1L, 5L, 7L, 123L).toDF("doc_id")
    val out = VideoPipeline.decodeVideo(SyntheticVideo.withAviPayload(ids))
      .select("doc_id", "media_type", "width", "height", "fps", "n_frames",
        "checksum")
      .as[(Long, String, Int, Int, Int, Int, Long)].collect()
      .map(r => r._1 -> r).toMap
    Seq(0L, 1L, 5L, 7L, 123L).foreach { id =>
      val cs = (0 until SyntheticVideo.nFrames(id))
        .map(f => (f + 1).toLong * expectFrameCs(id, f)).sum
      assert(out(id) == ((id, "video/avi", SyntheticVideo.width(id),
        SyntheticVideo.height(id), SyntheticVideo.fps(id),
        SyntheticVideo.nFrames(id), cs)), s"id=$id got ${out(id)}")
    }
  }

  test("decodeFrames extracts every Nth frame with per-frame checksums") {
    val ids = Seq(3L).toDF("doc_id")
    val rows = VideoPipeline.decodeFrames(
        SyntheticVideo.withAviPayload(ids), everyN = 2)
      .select("frame_idx", "frame_ts", "frame_checksum")
      .as[(Int, Double, Long)].collect().sortBy(_._1)
    val want = (0 until SyntheticVideo.nFrames(3L) by 2).toSeq
    assert(rows.map(_._1).toSeq == want)
    rows.foreach { case (f, ts, cs) =>
      assert(cs == expectFrameCs(3L, f))
      assert(math.abs(ts - f.toDouble / SyntheticVideo.fps(3L)) < 1e-5)
    }
  }

  test("sniffMediaType recognizes RIFF/AVI and the codec rejects non-DIB") {
    val avi = SyntheticVideo.aviBytes(2L)
    assert(BinaryPipeline.sniffMediaType(avi) == "video/avi")
    assert(BinaryPipeline.sniffMediaType(
      graft.multimodal.SyntheticAudio.wavBytes(2L)) == "audio/wav")
    // flip the strf compression field to MJPG: fast path must decline
    val compressed = avi.clone()
    val strfAt = {
      // locate 'strf' tag; compression dword sits 8 (header) + 16 in
      var i = 0
      while (!(compressed(i) == 's' && compressed(i + 1) == 't' &&
        compressed(i + 2) == 'r' && compressed(i + 3) == 'f')) i += 1
      i
    }
    "MJPG".getBytes("US-ASCII").zipWithIndex.foreach {
      case (b, k) => compressed(strfAt + 8 + 16 + k) = b
    }
    assert(AviCodec.read(compressed).isEmpty)
  }

  test("decode is total over null, empty, and corrupt payloads") {
    val rows = Seq(
      (1L, SyntheticVideo.aviBytes(1L)),
      (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array.empty[Byte]),
      (4L, "definitely not a video".getBytes("UTF-8")),
      (5L, SyntheticVideo.aviBytes(5L).take(64)))
      .toDF("doc_id", "payload")
    val out = VideoPipeline.decodeVideo(rows)
      .select("doc_id", "width", "n_frames")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 5)
    assert(out(1L) == ((SyntheticVideo.width(1L), SyntheticVideo.nFrames(1L))))
    Seq(2L, 3L, 4L, 5L).foreach { id =>
      assert(out(id) == ((0, 0)), s"corrupt row $id must decode to zeros")
    }
    // frame extraction over the same garbage yields rows only for the
    // decodable payload
    val fr = VideoPipeline.decodeFrames(rows).select("doc_id")
      .as[Long].collect()
    assert(fr.toSet == Set(1L))
  }
}
