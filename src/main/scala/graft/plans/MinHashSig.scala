package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge

/** Custom Catalyst expression: the full k-permutation MinHash signature
  * of a shingle array in ONE tight loop per row.
  *
  * Why a native Expression (preference order (b) of the build rules):
  * the declarative formulation needs either an explode+groupBy (extra
  * aggregation machinery per row) or k higher-order-function lambdas
  * (interpreted, one closure dispatch per element per permutation).
  * This kernel hashes each shingle once with Spark's own XXH64 (bit-
  * compatible with the xxhash64() builtin, seed 42) and updates all k
  * mins in a primitive long loop — no allocation beyond the result.
  *
  * Bit-exact contract with MinHashLSH's declarative path:
  *   h  = pmod(xxhash64(shingle), p)
  *   mᵢ = min over shingles of pmod(h·aᵢ + bᵢ, p)
  */
case class MinHashSig(child: Expression, numPerms: Int,
                      prime: Long, consts: Seq[(Long, Long)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private lazy val as: Array[Long] = consts.map(_._1).toArray
  private lazy val bs: Array[Long] = consts.map(_._2).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = numPerms
    val p = prime
    val mins = Array.fill[Long](k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val raw = XxHash64Function.hash(s, StringType, 42L)
      val h = ((raw % p) + p) % p
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % p // h,a < 2^31 => no overflow
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-level API. */
  def apply(shingles: Column, numPerms: Int, prime: Long,
            consts: Seq[(Long, Long)]): Column =
    GraftColumnBridge.column(
      new MinHashSig(GraftColumnBridge.expression(shingles), numPerms, prime, consts))
}
