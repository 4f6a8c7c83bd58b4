package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{BinaryPipeline, SyntheticImages}

/** Real javax.imageio decode path: exact PNG round-trip, magic-byte
  * sniffing, and totality over garbage payloads. */
class ImageDecodeSpec extends SparkSpecBase {
  import spark.implicits._

  test("PNG round-trip reproduces the pattern dims and pixel checksum exactly") {
    val ids = Seq(0L, 1L, 7L, 15L, 123L).toDF("doc_id")
    val out = BinaryPipeline.decodeImages(SyntheticImages.withPngPayload(ids))
      .select("doc_id", "media_type", "width", "height", "n_frames", "checksum")
      .as[(Long, String, Int, Int, Int, Long)].collect()
      .map(r => r._1 -> r).toMap
    def expect(id: Long): (Int, Int, Long) = {
      val w = (16 + id % 16).toInt
      val h = (8 + id % 8).toInt
      var cs = 0L
      for (y <- 0 until h; x <- 0 until w)
        cs += ((id + 3L * x + 7L * y) % 256) * (y.toLong * w + x + 1)
      (w, h, cs)
    }
    Seq(0L, 1L, 7L, 15L, 123L).foreach { id =>
      val (w, h, cs) = expect(id)
      assert(out(id) == ((id, "image/png", w, h, 1, cs)),
        s"id=$id got ${out(id)} want ($w,$h,$cs)")
    }
  }

  test("sniffMediaType reads magic bytes, not claims") {
    assert(BinaryPipeline.sniffMediaType(SyntheticImages.pngBytes(3L)) == "image/png")
    assert(BinaryPipeline.sniffMediaType("BM0000".getBytes) == "image/bmp")
    assert(BinaryPipeline.sniffMediaType("GIF89a".getBytes) == "image/gif")
    assert(BinaryPipeline.sniffMediaType(
      Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)) == "image/jpeg")
    assert(BinaryPipeline.sniffMediaType("plain text".getBytes) == "unknown")
  }

  test("decode is total over null, empty, and corrupt payloads") {
    val rows = Seq(
      (1L, SyntheticImages.pngBytes(1L)),
      (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array.empty[Byte]),
      (4L, "not an image at all".getBytes("UTF-8")),
      // PNG magic but truncated body: sniffs as png, decodes to zeros
      (5L, SyntheticImages.pngBytes(5L).take(12)))
      .toDF("doc_id", "payload")
    val out = BinaryPipeline.decodeImages(rows)
      .select("doc_id", "width", "height")
      .as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 5)
    assert(out(1L)._1 == 17 && out(1L)._2 == 9)
    Seq(2L, 3L, 4L, 5L).foreach { id =>
      assert(out(id) == ((0, 0)), s"corrupt row $id must decode to zeros")
    }
  }

  test("a BMP payload decodes through the same path (multi-codec)") {
    // hand-encode the pattern as BMP via the JRE writer, decode it back
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 2; x <- 0 until 4) img.getRaster.setSample(x, y, 0, 10 * (y * 4 + x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val rows = Seq((9L, bos.toByteArray)).toDF("doc_id", "payload")
    val out = BinaryPipeline.decodeImages(rows)
      .select("doc_id", "media_type", "width", "height", "checksum")
      .as[(Long, String, Int, Int, Long)].collect().head
    val cs = (0 until 8).map(i => 10L * i * (i + 1)).sum
    assert(out == ((9L, "image/bmp", 4, 2, cs)))
  }
}
