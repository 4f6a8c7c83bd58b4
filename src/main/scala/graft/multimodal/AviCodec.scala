package graft.multimodal

/** Direct RIFF/AVI container codec for UNCOMPRESSED (BI_RGB DIB)
  * video — the video analog of [[WavCodec]], and what retires the
  * last multimodal stub with REAL decode.
  *
  * The JRE ships no video codec at all, so unlike images (imageio)
  * and audio (javax.sound) there is no built-in fallback — but the
  * AVI container and the uncompressed DIB frame format are public,
  * fixed layouts (RIFF lists `hdrl`(avih, strl(strh, strf)) +
  * `movi`(00db…)), and lossless: a decoded frame's pixels must equal
  * the encoded pattern exactly, which makes the decoder
  * closed-form-oracle-checkable the same way PNG and PCM are.
  * Compressed codecs (MJPG aside, which imageio could decode
  * per-frame) are out of scope and return None — a production
  * pipeline plugs an FFI codec into the same [[VideoPipeline]] batch
  * shape.
  *
  * DIB frames are bottom-up BGR24 with rows padded to 4 bytes; the
  * reader exposes top-down row access so checksum math matches image
  * conventions.
  */
object AviCodec {

  final case class Video(width: Int, height: Int, fps: Int,
                         frames: IndexedSeq[Array[Byte]]) {
    def rowBytes: Int = ((width * 3) + 3) / 4 * 4
    /** Blue-channel value at image coordinates (x, y top-down). */
    def channel0(frame: Array[Byte], x: Int, y: Int): Int =
      frame((height - 1 - y) * rowBytes + 3 * x) & 0xFF
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse an uncompressed-DIB AVI. None for anything else
    * (compressed fourcc, non-24-bit, truncated, not-AVI). */
  def read(bytes: Array[Byte]): Option[Video] = {
    if (bytes == null || bytes.length < 24) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ") return None
    var width, height, bits = 0
    var scale, rate = 0L
    var compression = -1L
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    def walk(off0: Int, end: Int): Boolean = {
      var off = off0
      while (off + 8 <= end) {
        val id = tag(bytes, off)
        val size = le32(bytes, off + 4).toInt
        val body = off + 8
        if (body + size > end) return false // truncated chunk
        id match {
          case "LIST" =>
            if (!walk(body + 4, body + size)) return false // skip list type
          case "strh" =>
            if (size >= 32 && tag(bytes, body) == "vids") {
              scale = le32(bytes, body + 20)
              rate = le32(bytes, body + 24)
            }
          case "strf" =>
            if (size >= 40) {
              width = le32(bytes, body + 4).toInt
              height = le32(bytes, body + 8).toInt
              bits = le16(bytes, body + 14)
              compression = le32(bytes, body + 16)
            }
          case "00db" | "00dc" =>
            frames += java.util.Arrays.copyOfRange(bytes, body, body + size)
          case _ => () // avih/idx1/JUNK…: skip
        }
        off = body + size + (size & 1) // chunks are word-aligned
      }
      true
    }
    if (!walk(12, bytes.length)) return None
    // BI_RGB (0) 24-bit only; anything else → no built-in decoder
    if (compression != 0L || bits != 24 || width <= 0 || height <= 0 ||
        scale <= 0 || rate <= 0 || frames.isEmpty) return None
    val rb = ((width * 3) + 3) / 4 * 4
    if (frames.exists(_.length != rb * height)) return None
    Some(Video(width, height, (rate / scale).toInt, frames.toIndexedSeq))
  }

  /** Minimal uncompressed-DIB AVI bytes: RIFF(hdrl(avih,
    * strl(strh, strf)) + movi(00db…)). `frames` are bottom-up BGR24
    * rows padded to 4 bytes (the DIB wire layout). */
  def write(width: Int, height: Int, fps: Int,
            frames: Seq[Array[Byte]]): Array[Byte] = {
    val rb = ((width * 3) + 3) / 4 * 4
    val frameBytes = rb * height
    require(frames.forall(_.length == frameBytes), "bad frame size")
    val n = frames.size
    val moviSize = 4 + n * (8 + frameBytes)
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = out.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); out.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); out.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); out.putInt(56)
    out.putInt(1000000 / fps)           // dwMicroSecPerFrame
      .putInt(frameBytes * fps)         // dwMaxBytesPerSec
      .putInt(0).putInt(0)              // padding, flags
      .putInt(n).putInt(0).putInt(1)    // totalFrames, initial, streams
      .putInt(frameBytes)               // suggested buffer
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    fourcc("LIST"); out.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); out.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    out.putInt(0)                        // flags
      .putShort(0.toShort).putShort(0.toShort) // priority, language
      .putInt(0)                         // initial frames
      .putInt(1).putInt(fps)             // dwScale, dwRate
      .putInt(0).putInt(n)               // start, length (frames)
      .putInt(frameBytes).putInt(-1)     // suggested buffer, quality
      .putInt(frameBytes)                // sample size
      .putShort(0.toShort).putShort(0.toShort) // rcFrame
      .putShort(width.toShort).putShort(height.toShort)
    fourcc("strf"); out.putInt(40)
    out.putInt(40)                       // biSize
      .putInt(width).putInt(height)
      .putShort(1.toShort).putShort(24.toShort) // planes, bits
      .putInt(0)                         // BI_RGB
      .putInt(frameBytes)
      .putInt(0).putInt(0).putInt(0).putInt(0) // pels, clr
    fourcc("LIST"); out.putInt(moviSize); fourcc("movi")
    frames.foreach { f => fourcc("00db"); out.putInt(frameBytes); out.put(f) }
    out.array()
  }
}
