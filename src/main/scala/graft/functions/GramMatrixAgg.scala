package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.types._

object GramMatrixAgg {

  /** `gram_matrix(array<bigint>)` — the exact integer Gram matrix
    * `G = Σ_rows v·vᵀ` over quantized micro-lattice vectors, flattened
    * row-major to `array<bigint>` of length `dim²`. The PCA / whitening /
    * covariance input: `cov = G/n − μμᵀ` follows from this plus the
    * [[VectorSumAgg]] mean, both exact integers until the final division.
    *
    * SHAPE is the whole point at 100 TB: state is ONE `dim²` long array
    * (32 KB at dim=64) that partials combine on the MAP side, so the
    * corpus-sized input reduces to `partitions × dim²` longs — never a
    * per-row explode of the dim² products (which would be a `n·dim²`-row
    * shuffle). Overflow checks via `Math.addExact`; products are exact in
    * 64-bit for micro-lattice inputs (|v| ≤ ~10^6 ⇒ |v_i·v_j| ≤ 10^12).
    *
    * Same null/ragged contract as [[VectorSumAgg]]: null rows skip, null
    * elements / ragged lengths / dim-0 raise.
    */
  def gram_matrix(vec: Column): Column =
    compat.column(
      GramMatrixAgg(compat.expression(vec)).toAggregateExpression())
}

case class GramMatrixAgg(
    vec: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "gram_matrix"
  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_matrix expects array<bigint>, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val a = vec.eval(input)
    if (a == null) return buffer
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    require(n > 0, "gram_matrix: empty (dim-0) vector")
    require(n <= 4096, s"gram_matrix: dim $n exceeds the 4096 state bound")
    val buf = if (buffer.length == 0) new Array[Long](n * n) else buffer
    require(buf.length == n * n,
      s"gram_matrix: ragged input (dim $n vs dim^2 ${buf.length})")
    val v = new Array[Long](n)
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), s"gram_matrix: null element at $i")
      v(i) = arr.getLong(i)
      i += 1
    }
    i = 0
    while (i < n) {
      val vi = v(i)
      val row = i * n
      var j = 0
      while (j < n) {
        buf(row + j) = Math.addExact(buf(row + j), Math.multiplyExact(vi, v(j)))
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buffer
    if (buffer.length == 0) return other
    require(buffer.length == other.length,
      s"gram_matrix: ragged partials (${other.length} vs ${buffer.length})")
    var i = 0
    while (i < buffer.length) {
      buffer(i) = Math.addExact(buffer(i), other(i))
      i += 1
    }
    buffer
  }

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

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrixAgg =
    copy(vec = newChildren(0))
}
