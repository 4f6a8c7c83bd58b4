package graft.multimodal

/** Direct RIFF/WAVE PCM container codec for the decode HOT PATH.
  *
  * Why not `AudioSystem` per row: the JDK's audio service-provider
  * registry is globally synchronized, so per-row
  * `AudioSystem.getAudioInputStream` SERIALIZES every executor thread
  * in the JVM — measured on the 10× replica: 4 threads and 32 threads
  * both take ~17 s (throughput did not scale with cores at all). A
  * plain-PCM WAV is a public, fixed container (RIFF header + `fmt `
  * + `data` chunks), so the hot path parses it directly, lock-free;
  * anything not plain 8/16-bit PCM falls back to the AudioSystem path
  * in [[AudioPipeline]]. Both directions are cross-validated against
  * the JRE codec in AudioDecodeSpec (JRE-written bytes must parse
  * here; bytes written here must decode via AudioSystem).
  */
object WavCodec {

  final case class Pcm(sampleRate: Int, channels: Int, bits: Int,
                       data: Array[Byte]) {
    def frameBytes: Int = channels * (bits / 8)
    def nFrames: Long = if (frameBytes == 0) 0L else data.length.toLong / frameBytes
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a plain-PCM WAV. None for anything else (compressed,
    * float, extensible, truncated, not-RIFF) — caller falls back to
    * the full JRE codec. */
  def read(bytes: Array[Byte]): Option[Pcm] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    var data: Option[Array[Byte]] = None
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(bytes, off)
      val size = le32(bytes, off + 4)
      val body = off + 8
      if (body + size > bytes.length) return None // truncated chunk
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = le16(bytes, body)
          val channels = le16(bytes, body + 2)
          val rate = le32(bytes, body + 4).toInt
          val bits = le16(bytes, body + 14)
          // 1 = WAVE_FORMAT_PCM; everything else (IEEE float, a-law,
          // ADPCM, EXTENSIBLE) goes to the fallback codec
          if (audioFormat != 1 || (bits != 8 && bits != 16) ||
              channels <= 0 || rate <= 0) return None
          fmt = Some((rate, channels, bits))
        case "data" =>
          data = Some(java.util.Arrays.copyOfRange(
            bytes, body, (body + size).toInt))
        case _ => () // LIST/fact/cue…: skip
      }
      off = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    for ((rate, ch, bits) <- fmt; d <- data) yield Pcm(rate, ch, bits, d)
  }

  /** Canonical 44-byte-header plain-PCM WAV bytes. */
  def write(sampleRate: Int, channels: Int, bits: Int,
            pcm: Array[Byte]): Array[Byte] = {
    require(bits == 8 || bits == 16, s"plain PCM only, got $bits bits")
    val frameBytes = channels * (bits / 8)
    val byteRate = sampleRate * frameBytes
    val out = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(sampleRate).putInt(byteRate)
      .putShort(frameBytes.toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
      .put(pcm)
    out.array()
  }
}
