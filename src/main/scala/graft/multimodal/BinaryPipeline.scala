package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, batched per-partition "decode".
  *
  * The Spark-side shape is the real deliverable: schema (binary payload
  * + metadata struct), partition-parallel batched decoding via
  * mapPartitions (the Scala analog of mapInPandas batches), and typed
  * decoded output. The decode itself is STUBBED deterministically —
  * image/audio codecs are not in this container — behind
  * `DecodedMedia.stubDecode`; swap that single function for a real
  * codec (JNI/FFI) without touching the pipeline.
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
    * text column; a real pipeline reads files into `payload`). */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
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
}
