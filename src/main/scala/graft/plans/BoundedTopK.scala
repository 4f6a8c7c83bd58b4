package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over ANY orderable column type: returns the
  * k largest values of the group as a DESCENDING array (a multiset —
  * ties and duplicates kept, unlike BoundedMinK's distinct set).
  *
  * This is the scale-safe form of "top-k per group": the ubiquitous
  * `row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k` sorts
  * EVERY row of every group on the shuffled side, and `slice(
  * sort_array(collect_list(x)))` buffers whole groups. This buffer is
  * O(k) per group and combines MAP-SIDE, so a billion-row group costs
  * each task a k-element heap and the exchange carries k values per
  * group. Pack `struct(score, tiebreak, payload...)` to carry rows:
  * struct ordering is lexicographic, so put the ranking key first.
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]]
  with UnaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"k out of range: $k")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  // min-heap: the head is the SMALLEST retained value, evicted first
  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    new mutable.PriorityQueue[Any]()(ordering.reverse)

  private def add(buf: mutable.PriorityQueue[Any], v: Any): Unit = {
    if (buf.size < k) { buf.enqueue(v); () }
    else if (ordering.compare(v, buf.head) > 0) {
      buf.dequeue(); buf.enqueue(v); ()
    }
  }

  override def update(buf: mutable.PriorityQueue[Any],
                      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) add(buf, InternalRow.copyValue(v))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[Any],
                     other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(v => add(buf, v))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering.reverse))

  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { v =>
      val u = proj(InternalRow(v))
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val u = new UnsafeRow(1)
      u.pointTo(rowBytes, len)
      buf.enqueue(InternalRow.copyValue(u.get(0, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)
}

object BoundedTopK {
  /** Column-level API: k largest values of the group, descending. */
  def apply(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      new BoundedTopK(GraftColumnBridge.expression(c), k)
        .toAggregateExpression(isDistinct = false))
}
