package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge

/** Custom Catalyst expression: 64-bit SimHash of a feature array in one
  * pass (same rationale as MinHashSig — a primitive loop replaces the
  * explode+64-vote-sums aggregation; bit-exact contract with
  * SimHash.signatures: feature hash = xxhash64(shingle), bit i of the
  * result set iff strictly more features have bit i set than clear).
  *
  * `portable = true` swaps the feature hash for the md5-derived 64-bit
  * value of SimHash.portableHash64 (first 8 digest bytes big-endian) —
  * bit-exact with the declarative portable path AND replayable by an
  * external SQL oracle, at ~2× the hashing cost of xxhash64. */
case class SimHashSig(child: Expression, portable: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  // MessageDigest is stateful and not thread-safe → one per task thread
  @transient private lazy val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def featureHash(s: org.apache.spark.unsafe.types.UTF8String): Long =
    if (!portable) XxHash64Function.hash(s, StringType, 42L)
    else {
      val d = md5Local.get(); d.reset()
      val bytes = d.digest(s.getBytes)
      // first 16 hex chars of md5 read big-endian = first 8 digest bytes
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (bytes(k) & 0xffL); k += 1 }
      h
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = featureHash(arr.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) != 0L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def apply(shingles: Column): Column = apply(shingles, portable = false)
  def apply(shingles: Column, portable: Boolean): Column =
    GraftColumnBridge.column(
      new SimHashSig(GraftColumnBridge.expression(shingles), portable))
}
