package graft

import graft.multimodal.Phash

class PhashSpec extends SparkSpecBase {
  import spark.implicits._

  test("ofBytes: localized edit flips at most one segment bit") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill[Byte](640)(rnd.nextInt(256).toByte)
    val edited = base.clone(); edited(300) = (edited(300) ^ 0x01).toByte
    val h = java.lang.Long.bitCount(Phash.ofBytes(base) ^ Phash.ofBytes(edited))
    assert(h <= 1, s"one-byte edit moved $h bits")
  }

  test("ofBytes: empty and short payloads are total") {
    assert(Phash.ofBytes(Array.emptyByteArray) == 0L)
    Phash.ofBytes(Array[Byte](1, 2, 3)) // < 64 bytes: must not throw
  }

  test("nearPairs finds planted duplicates and nothing else") {
    val rnd = new scala.util.Random(3)
    val payloads = (0L until 40L).map { i =>
      (i, Array.fill[Byte](512)(rnd.nextInt(256).toByte))
    }
    // plant: id 100 = copy of id 7 with one flipped byte
    val planted = payloads :+ (100L, {
      val c = payloads(7)._2.clone(); c(10) = (c(10) ^ 0x03).toByte; c
    })
    val df = planted.toDF("doc_id", "payload")
    val got = Phash.nearPairs(Phash.signatures(df), maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    assert(got.map(p => (p._1, p._2)).toSet == Set((7L, 100L)), got.toSeq.toString)
  }
}
