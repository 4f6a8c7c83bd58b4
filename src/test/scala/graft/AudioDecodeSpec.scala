package graft

import graft.multimodal.{AudioPipeline, BinaryPipeline, SyntheticAudio}

/** Real javax.sound.sampled decode path: exact PCM round-trip,
  * magic-byte sniffing, and totality over garbage payloads. */
class AudioDecodeSpec extends SparkSpecBase {
  import spark.implicits._

  private def expect(id: Long): (Int, Long, Long) = {
    val n = SyntheticAudio.nSamples(id)
    var cs = 0L
    var i = 0
    while (i < n) { cs += SyntheticAudio.sample(id, i).toLong * (i + 1); i += 1 }
    (SyntheticAudio.sampleRate(id), n.toLong, cs)
  }

  test("WAV round-trip reproduces format fields and sample checksum exactly") {
    val ids = Seq(0L, 1L, 2L, 7L, 199L, 123L).toDF("doc_id")
    val out = AudioPipeline.decodeAudio(SyntheticAudio.withWavPayload(ids))
      .select("doc_id", "media_type", "sample_rate", "channels", "bits",
        "n_samples", "checksum")
      .as[(Long, String, Int, Int, Int, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    Seq(0L, 1L, 2L, 7L, 199L, 123L).foreach { id =>
      val (rate, n, cs) = expect(id)
      assert(out(id) == ((id, "audio/wav", rate, 1, 16, n, cs)),
        s"id=$id got ${out(id)} want (rate=$rate,n=$n,cs=$cs)")
    }
  }

  test("WavCodec cross-validates against the JRE codec both directions") {
    import graft.multimodal.WavCodec
    Seq(0L, 3L, 42L, 199L).foreach { id =>
      // 1. the JRE writer's bytes must parse through our direct reader
      //    with identical format + samples
      val jre = SyntheticAudio.wavBytesJre(id)
      val viaOurs = WavCodec.read(jre).get
      assert(viaOurs.sampleRate == SyntheticAudio.sampleRate(id))
      assert(viaOurs.channels == 1 && viaOurs.bits == 16)
      assert(viaOurs.nFrames == SyntheticAudio.nSamples(id).toLong)
      // 2. our writer's bytes must decode through the JRE codec with
      //    identical format + samples
      val ours = SyntheticAudio.wavBytes(id)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(ours))
      assert(in.getFormat.getSampleRate.toInt == SyntheticAudio.sampleRate(id))
      assert(in.getFormat.getChannels == 1)
      assert(in.getFrameLength == SyntheticAudio.nSamples(id).toLong)
      val raw = in.readAllBytes()
      (0 until SyntheticAudio.nSamples(id)).foreach { i =>
        val s = (((raw(2 * i + 1) & 0xFF) << 8) | (raw(2 * i) & 0xFF)).toShort
        assert(s == SyntheticAudio.sample(id, i), s"id=$id sample $i")
      }
    }
    // non-PCM (IEEE float) must be rejected by the fast path
    val floatWav = {
      val b = WavCodec.write(8000, 1, 16, new Array[Byte](32))
      b(20) = 3 // audioFormat = WAVE_FORMAT_IEEE_FLOAT
      b
    }
    assert(WavCodec.read(floatWav).isEmpty)
  }

  test("sniffMediaType recognizes the RIFF/WAVE container") {
    assert(BinaryPipeline.sniffMediaType(SyntheticAudio.wavBytes(5L)) == "audio/wav")
    // RIFF but not WAVE must not claim audio: AVI sniffs as video,
    // an unhandled RIFF form (RMID = RIFF MIDI) as unknown
    val avi = "RIFF0000AVI LIST".getBytes("UTF-8")
    assert(BinaryPipeline.sniffMediaType(avi) == "video/avi")
    val rmid = "RIFF0000RMIDdata".getBytes("UTF-8")
    assert(BinaryPipeline.sniffMediaType(rmid) == "unknown")
  }

  test("decode is total over null, empty, and corrupt payloads") {
    val rows = Seq(
      (1L, SyntheticAudio.wavBytes(1L)),
      (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array.empty[Byte]),
      (4L, "definitely not audio".getBytes("UTF-8")),
      // WAV magic but truncated body: sniffs as wav, decodes to zeros
      (5L, SyntheticAudio.wavBytes(5L).take(16)))
      .toDF("doc_id", "payload")
    val out = AudioPipeline.decodeAudio(rows)
      .select("doc_id", "sample_rate", "n_samples")
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 5)
    assert(out(1L) == ((SyntheticAudio.sampleRate(1L),
      SyntheticAudio.nSamples(1L).toLong)))
    Seq(2L, 3L, 4L, 5L).foreach { id =>
      assert(out(id) == ((0, 0L)), s"corrupt row $id must decode to zeros")
    }
  }

  test("stereo 16-bit WAV checksums channel 0 only") {
    // hand-build a 2-channel stream: ch0 = i*3 - 10, ch1 = junk
    val n = 50
    val pcm = new Array[Byte](n * 4)
    for (i <- 0 until n) {
      val s0 = (i * 3 - 10).toShort
      val s1 = (i * 7 + 99).toShort
      pcm(4 * i) = (s0 & 0xFF).toByte
      pcm(4 * i + 1) = ((s0 >> 8) & 0xFF).toByte
      pcm(4 * i + 2) = (s1 & 0xFF).toByte
      pcm(4 * i + 3) = ((s1 >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val st = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(st,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val rows = Seq((9L, bos.toByteArray)).toDF("doc_id", "payload")
    val out = AudioPipeline.decodeAudio(rows)
      .select("doc_id", "channels", "n_samples", "checksum")
      .as[(Long, Int, Long, Long)].collect().head
    val cs = (0 until n).map(i => (i * 3 - 10).toLong * (i + 1)).sum
    assert(out == ((9L, 2, n.toLong, cs)))
  }
}
