package graft

import graft.multimodal.{AviCodec, SyntheticVideo, VideoPipeline}

/** MJPG (JPEG-in-AVI) decode path: bounded-error round-trip through
  * the real ImageIO JPEG codec, exact container metadata, and
  * totality over corrupt frames. */
class MjpgDecodeSpec extends SparkSpecBase {
  import spark.implicits._

  test("MJPG round-trip: exact dims/fps/frame count, bounded pixel error") {
    val ids = Seq(0L, 1L, 5L, 7L, 123L, 200L).toDF("doc_id")
    val out = VideoPipeline.decodeFidelity(
        SyntheticVideo.withMjpgPayload(ids), SyntheticVideo.mjpgPixel)
      .select("doc_id", "media_type", "width", "height", "fps", "n_frames",
        "max_err")
      .as[(Long, String, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    val worst = out.values.map(_._7).max
    info(s"max abs pixel error across clips = $worst")
    out.foreach { case (id, (_, mt, w, h, fps, nf, err)) =>
      assert(mt == "video/avi")
      assert(w == SyntheticVideo.width(id) && h == SyntheticVideo.height(id))
      assert(fps == SyntheticVideo.fps(id) && nf == SyntheticVideo.nFrames(id))
      // grayscale at encoder quality 1.0: residual is DCT rounding
      // only — the mm_video_mjpg gate pins the same bound
      assert(err >= 0 && err <= 8, s"id=$id max_err=$err")
    }
  }

  test("a corrupt JPEG frame reads as a torn stream (None), not a crash") {
    val good = SyntheticVideo.mjpgBytes(3L)
    assert(AviCodec.read(good).isDefined)
    // valid container, one frame replaced by bytes that are not a JPEG
    val (w, h, fps) = (SyntheticVideo.width(3L), SyntheticVideo.height(3L),
      SyntheticVideo.fps(3L))
    val frames = (0 until SyntheticVideo.nFrames(3L)).map { f =>
      if (f == 1) Array.fill[Byte](100)(0x42)
      else {
        // re-encode frame f exactly as mjpgBytes does
        val clip = AviCodec.read(SyntheticVideo.mjpgBytes(3L)).get
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        (0 until h).foreach(y => (0 until w).foreach(x =>
          img.getRaster.setSample(x, y, 0, clip.channel0(clip.frames(f), x, y))))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
    }
    assert(AviCodec.read(AviCodec.writeMjpg(w, h, fps, frames)).isEmpty)
    // truncated JPEG (plugin may throw RuntimeException internally —
    // the NonFatal guard turns it into a torn-stream None)
    val truncated = (0 until SyntheticVideo.nFrames(3L)).map { _ =>
      val full = {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      full.take(full.length / 2)
    }
    assert(AviCodec.read(AviCodec.writeMjpg(w, h, fps, truncated)).isEmpty)
  }

  test("frame dims diverging from the header fail the whole clip") {
    val (w, h, fps) = (16, 8, 10)
    val img = new java.awt.image.BufferedImage(w + 4, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    assert(AviCodec.read(
      AviCodec.writeMjpg(w, h, fps, Seq(bos.toByteArray))).isEmpty)
  }
}
