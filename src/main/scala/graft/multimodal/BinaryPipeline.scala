package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, batched per-partition decode.
  *
  * The Spark-side shape is the real deliverable: schema (binary payload
  * + metadata struct), partition-parallel batched decoding via
  * mapPartitions (the Scala analog of mapInPandas batches), and typed
  * decoded output. Two decoders share the shape:
  *  - [[decodeImages]] — REAL: javax.imageio (PNG/BMP/GIF/JPEG ship
  *    with the JRE), magic-byte sniffing, pixel checksums, total over
  *    corrupt payloads. Oracle-gated against actual pixel output
  *    (`mm_decode`).
  *  - [[AudioPipeline.decodeAudio]] — REAL: javax.sound.sampled
  *    (WAV/PCM ships with the JRE), sample checksums, same batch
  *    shape. Oracle-gated against actual sample output
  *    (`mm_audio_decode`).
  *  - [[VideoPipeline.decodeVideo]] — REAL: direct RIFF/AVI container
  *    parse with uncompressed-DIB frames (AviCodec), per-frame pixel
  *    checksums, same batch shape. Oracle-gated (`mm_video_decode`,
  *    `mm_video_frames`).
  *  - [[decode]] — STUB kept as the generic plumbing contract for
  *    COMPRESSED codecs no JVM API covers (H.264 & co.): swap
  *    `stubDecode` for a JNI/FFI codec without touching the pipeline.
  *
  * Scale: decode is a narrow map-only pass; `batchSize` bounds peak
  * memory per task exactly like Arrow batch size does for Pandas UDFs.
  */
object BinaryPipeline {

  /** Decoded media features. A real decoder fills these from the
    * payload bytes; the stub derives them deterministically from
    * length/first bytes so tests and oracles can verify plumbing. */
  final case class DecodedMedia(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** STUB decoder: deterministic features from the payload. Replace
    * with a real codec; signature (batch of payloads → batch of
    * features) is the contract. */
  def stubDecode(batch: Seq[(Long, String, Array[Byte])]): Seq[DecodedMedia] =
    batch.map { case (id, mediaType, bytes) =>
      val n = bytes.length.toLong
      // cheap order-sensitive checksum of the first 64 payload bytes
      val checksum = bytes.iterator.take(64).zipWithIndex
        .map { case (b, i) => (b & 0xFFL) * (i + 1) }.sum
      DecodedMedia(id, mediaType,
        n, ((n * 7) % 640).toInt, ((n * 13) % 480).toInt, (n % 30).toInt,
        checksum)
    }

  /** Attach a binary payload column + metadata struct to a corpus
    * (testdata carries no real media, so payload = utf-8 bytes of the
    * text column; a real pipeline reads files into `payload`).
    *
    * Like the SyntheticVideo/Images/Audio generators, the corpus goes
    * through [[graft.core.Parallelism.widen]] first: single-row-group
    * testdata reads as ONE scan task, and the mapPartitions decode /
    * phash stages that consume this frame inherit its partitioning —
    * without the widen the whole stub-decode family ran 1-core. The
    * static-size guard keeps the shuffle conditional, so a real
    * multi-partition binaryFile source is left untouched. */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.core.Parallelism.widen(docs)
      .select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        when(col(idCol) % 3 === 0, "image")
          .when(col(idCol) % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        length(encode(col(textCol), "UTF-8")).as("content_length")).as("meta"))

  /** Aspect-preserving resize plan over decoded media: pure Column math
    * (inside WholeStageCodegen, no UDF), so at 100 TB it runs at scan
    * bandwidth. Downscale-only (`scale <= 1`), floor semantics, at
    * least 1px. Rows with degenerate dims are dropped — a real decoder
    * yields those only for corrupt payloads. */
  def resizePlan(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"),
      lit(1.0))
    decoded
      .filter(col("width") > 0 && col("height") > 0)
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        greatest(lit(1), floor(col("width") * scale).cast("int")).as("out_width"),
        greatest(lit(1), floor(col("height") * scale).cast("int")).as("out_height"))
  }

  /** Frame sampling for video media: one output row per sampled frame
    * index (0, everyN, 2·everyN, … < n_frames), with a deterministic
    * per-frame stub checksum. The explode is a narrow generator — frame
    * rows never shuffle; a real pipeline would decode each sampled
    * frame in the same `mapPartitions` batch shape as [[decode]]. */
  def sampleFrames(decoded: DataFrame, everyN: Int, fps: Int = 30): DataFrame =
    decoded
      .filter(col("media_type") === "video" && col("n_frames") > 0)
      .select(col("doc_id"), col("checksum"),
        posexplode(sequence(lit(0), col("n_frames") - 1, lit(everyN))))
      .select(col("doc_id"),
        col("col").as("frame_idx"),
        round(col("col").cast("double") / fps, 6).as("frame_ts"),
        (col("checksum") * 31 + col("col")).as("frame_checksum"))

  /** Batched per-partition decode: the mapInPandas-equivalent shape. */
  def decode(payloads: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val ds: Dataset[DecodedMedia] = payloads
      .select(col("doc_id"), col("meta.media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(batch => stubDecode(batch))
      }
    ds.toDF()
  }

  /** Container sniffing from magic bytes — metadata must come from the
    * payload, not from whatever a crawler claimed. */
  def sniffMediaType(b: Array[Byte]): String = {
    def at(i: Int, v: Int) = i < b.length && (b(i) & 0xFF) == v
    if (b == null || b.length < 4) "unknown"
    else if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) "image/png"
    else if (at(0, 'B') && at(1, 'M')) "image/bmp"
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F')) "image/gif"
    else if (at(0, 0xFF) && at(1, 0xD8) && at(2, 0xFF)) "image/jpeg"
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F') &&
      at(8, 'W') && at(9, 'A') && at(10, 'V') && at(11, 'E')) "audio/wav"
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F') &&
      at(8, 'A') && at(9, 'V') && at(10, 'I') && at(11, ' ')) "video/avi"
    else "unknown"
  }

  /** REAL image decode: javax.imageio (PNG/BMP/GIF/JPEG readers ship
    * with every JRE — no external codec needed), in the same batched
    * mapPartitions shape as the stub. Total over garbage: null, empty,
    * or undecodable payloads yield a zero-dimension row rather than
    * killing the pass — at 100 TB some fraction of any crawl's media
    * is corrupt by construction.
    *
    * checksum = Σ_pixels luminance(x,y) · (y·width + x + 1) over band
    * 0 — an order-sensitive pixel digest that an oracle can replay in
    * closed form for a known test pattern (SyntheticImages), and that
    * downstream near-dup ops can treat as a content fingerprint. */
  def decodeImages(payloads: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val ds: Dataset[DecodedMedia] = payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        it.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
          decodeImage(id, bytes)
        })
      }
    ds.toDF()
  }

  private def decodeImage(id: Long, bytes: Array[Byte]): DecodedMedia = {
    if (bytes == null || bytes.isEmpty)
      return DecodedMedia(id, "unknown", 0L, 0, 0, 0, 0L)
    val mt = sniffMediaType(bytes)
    try {
      SyntheticImages.readImage(bytes) match {
        case None =>
          DecodedMedia(id, mt, bytes.length.toLong, 0, 0, 0, 0L)
        case Some(img) =>
          val w = img.getWidth
          val h = img.getHeight
          val raster = img.getRaster
          var cs = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              cs += raster.getSample(x, y, 0).toLong * (y.toLong * w + x + 1)
              x += 1
            }
            y += 1
          }
          DecodedMedia(id, mt, bytes.length.toLong, w, h, 1, cs)
      }
    } catch {
      case _: Exception => DecodedMedia(id, mt, bytes.length.toLong, 0, 0, 0, 0L)
    }
  }
}
