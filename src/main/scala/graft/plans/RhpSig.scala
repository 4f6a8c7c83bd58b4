package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge

/** Custom Catalyst expression: all nBits random-hyperplane sign bits of
  * an embedding in ONE tight primitive loop per row.
  *
  * Why native (preference order (b) of the build rules): the
  * declarative formulation is explode + broadcast-join the plane matrix
  * + two aggregations — two shuffles of (id, band) pairs per corpus
  * pass. This kernel keeps the whole signature inside the projection:
  * no shuffle at all until the LSH bucket join, so at 100 TB signatures
  * stream at scan bandwidth.
  *
  * Bit-exact contract with RhpLsh.signatures' declarative path: both
  * accumulate the per-plane dot product left-to-right over the vector
  * (the declarative sum sees exploded elements in order because every
  * element of one row stays in one partition's partial aggregate), and
  * both set bit j iff the projection is >= 0.
  *
  * Input must be array<double> (cast float embeddings first — identical
  * to what the declarative path's `v.cast("double")` does per element).
  */
case class RhpSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nBits = planes.length
    var sig = 0L
    var j = 0
    while (j < nBits) {
      val w = planes(j)
      val dim = math.min(arr.numElements(), w.length)
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += arr.getDouble(i) * w(i); i += 1 }
      if (acc >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSig =
    copy(child = newChild)
}

object RhpSig {
  /** Column-level API; `vec` must already be array<double>. */
  def apply(vec: Column, planes: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      new RhpSig(GraftColumnBridge.expression(vec), planes))
}
