package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic REAL video payloads: uncompressed-DIB AVI whose
  * every pixel is a pure function of (doc_id, frame, x, y), written
  * through [[AviCodec]]. DIB is lossless, so decoding must reproduce
  * the pattern exactly — closed-form-oracle-checkable like
  * [[SyntheticImages]] (PNG) and [[SyntheticAudio]] (PCM).
  *
  * pixel(f, x, y) = (doc_id + 11f + 3x + 7y) mod 256 (B = G = R),
  * width  = 16 + 4·(doc_id mod 4)  (multiple of 4 → no row padding),
  * height = 8 + doc_id mod 8,
  * frames = 4 + doc_id mod 6,
  * fps    = 10 + doc_id mod 5.
  */
object SyntheticVideo {

  def width(id: Long): Int = (16 + 4 * Math.floorMod(id, 4)).toInt
  def height(id: Long): Int = (8 + Math.floorMod(id, 8)).toInt
  def nFrames(id: Long): Int = (4 + Math.floorMod(id, 6)).toInt
  def fps(id: Long): Int = (10 + Math.floorMod(id, 5)).toInt
  def pixel(id: Long, f: Int, x: Int, y: Int): Int =
    Math.floorMod(id + 11L * f + 3L * x + 7L * y, 256).toInt

  /** AVI bytes of the doc's test clip. */
  def aviBytes(id: Long): Array[Byte] = {
    val (w, h) = (width(id), height(id))
    val rb = ((w * 3) + 3) / 4 * 4
    val frames = (0 until nFrames(id)).map { f =>
      val buf = new Array[Byte](rb * h)
      var y = 0
      while (y < h) {
        val rowOff = (h - 1 - y) * rb // DIB rows are bottom-up
        var x = 0
        while (x < w) {
          val v = pixel(id, f, x, y).toByte
          buf(rowOff + 3 * x) = v      // B
          buf(rowOff + 3 * x + 1) = v  // G
          buf(rowOff + 3 * x + 2) = v  // R
          x += 1
        }
        y += 1
      }
      buf
    }
    AviCodec.write(w, h, fps(id), frames)
  }

  /** (doc_id, payload) frame of real AVI bytes, generated partition-
    * parallel in the same batched shape the decoder consumes. */
  def withAviPayload(ids: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map(id => (id, aviBytes(id)))))
      .toDF("doc_id", "payload")
  }
}
