package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.types._

object VectorSumAgg {

  /** `vector_sum(array<bigint>)` — exact elementwise sum of fixed-length
    * integer vectors, as a native [[TypedImperativeAggregate]]. State is one
    * `long[]` per group and partial aggregation combines on the MAP side, so
    * a k-group aggregate over N vectors shuffles `k x dim` longs instead of
    * `N x dim` rows — the scale-correct centroid-update kernel for
    * quantized k-means ([[graft.operators.KMeans]]): a lattice-point sum is
    * EXACT in 64-bit integers (no float summation-order drift), which is
    * what makes the update engine-portable and oracle-checkable.
    *
    * Semantics (mirrored by the SQL replay `sum(vq[i]) GROUP BY i`):
    * null rows are skipped; null ELEMENTS, ragged lengths, and EMPTY
    * (dim-0) vectors raise — a centroid over ragged input is a silent
    * wrong answer, and a dim-0 "vector" is indistinguishable from the
    * not-yet-initialized buffer, so it is rejected rather than silently
    * treated as absent.
    */
  def vector_sum(vec: Column): Column =
    compat.column(
      VectorSumAgg(compat.expression(vec)).toAggregateExpression())
}

case class VectorSumAgg(
    vec: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "vector_sum"
  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_sum expects array<bigint>, got $other")
  }

  /** Empty marker; real buffer is allocated lazily at the first input so the
    * aggregate adapts to the data's dimensionality.
    */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val a = vec.eval(input)
    if (a == null) return buffer
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // A dim-0 input would alias the lazy 'uninitialized' marker below and
    // silently vanish from the group — reject it like other ragged input.
    require(n > 0, "vector_sum: empty (dim-0) vector")
    val buf = if (buffer.length == 0) new Array[Long](n) else buffer
    require(buf.length == n,
      s"vector_sum: ragged input (dim $n vs ${buf.length})")
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), s"vector_sum: null element at $i")
      buf(i) = Math.addExact(buf(i), arr.getLong(i))
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buffer
    if (buffer.length == 0) return other
    require(buffer.length == other.length,
      s"vector_sum: ragged partials (${other.length} vs ${buffer.length})")
    var i = 0
    while (i < buffer.length) {
      buffer(i) = Math.addExact(buffer(i), other(i))
      i += 1
    }
    buffer
  }

  /** NULL for an all-null/empty group (matches SQL `sum`). */
  override def eval(buffer: Array[Long]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bb.getInt())
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(vec = newChildren(0))
}
