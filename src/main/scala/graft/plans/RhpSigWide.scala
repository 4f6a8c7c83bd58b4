package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Wide random-hyperplane signature: nBits > 64 sign bits packed into
  * an array of 64-bit words (word j holds bits [64j, 64j+64), same
  * bit-numbering convention as [[RhpSig]] — RhpSigWide(v)(0) equals
  * RhpSig(v) for the first 64 planes).
  *
  * Why wide: band geometry has to grow with the corpus. A fixed 64-bit
  * signature caps bands at 8×8 bits (256 bucket values), so RANDOM
  * pairs collide at n²/256 per band no matter how dissimilar — the
  * measured super-linear scaler in SCALE.md. 128 bits buy 8×16-bit
  * bands (65536 values, 256× fewer random collisions) while keeping
  * per-pair recall for true near-dups (more bands compensate the
  * longer band). Same one-tight-loop shape as RhpSig: the whole
  * signature stays inside the projection, no shuffle until the LSH
  * bucket join.
  */
case class RhpSigWide(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rhp_sig_wide"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nBits = planes.length
    val words = new Array[Long]((nBits + 63) / 64)
    var j = 0
    while (j < nBits) {
      val w = planes(j)
      val dim = math.min(arr.numElements(), w.length)
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += arr.getDouble(i) * w(i); i += 1 }
      if (acc >= 0) words(j >>> 6) |= (1L << (j & 63))
      j += 1
    }
    new GenericArrayData(words)
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSigWide =
    copy(child = newChild)
}

object RhpSigWide {
  /** Column-level API; `vec` must already be array<double>. */
  def apply(vec: Column, planes: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      new RhpSigWide(GraftColumnBridge.expression(vec), planes))
}
