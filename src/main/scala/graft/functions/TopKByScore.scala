package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.types._

/** Bounded-heap top-k buffer: keeps the k best (score, id) pairs under the
  * ordering (score DESC, id ASC). Backed by a binary MIN-heap on that
  * ordering (the WORST survivor at the root) so insertion against a full
  * buffer is one compare + O(log k) sift — O(n log k) per group total,
  * O(k) memory, no sort of the full scored set.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** true iff (s1, i1) ranks BELOW (s2, i2): lower score, or tied score
    * with larger id. The heap root is the minimum under this order.
    */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); val ti = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = ts; ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      val ts = scores(i); val ti = ids(i)
      scores(i) = scores(m); ids(i) = ids(m)
      scores(m) = ts; ids(m) = ti
      i = m
    }
  }

  def add(s: Double, id: Long): Unit =
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown()
    }

  /** Entries ordered (score DESC, id ASC) — rank order. */
  def sorted: Array[(Double, Long)] =
    Array.tabulate(size)(i => (scores(i), ids(i)))
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
}

object TopKByScore {

  /** `top_k_by_score(score, id, k)` — aggregate returning the k best
    * `struct<score, id>` rows of the group, ordered (score DESC, id ASC).
    * A native bounded-heap [[TypedImperativeAggregate]]: partial
    * aggregation keeps per-group state at O(k) on the MAP side, so the
    * shuffle moves `groups x k` rows instead of the whole scored set, and
    * no SortExec over the scored set ever appears — the scale-correct
    * replacement for `row_number().over(Window.partitionBy(...).orderBy)`
    * top-k, whose window sorts every scored row of every group.
    */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    compat.column(
      TopKByScore(compat.expression(score), compat.expression(id), k)
        .toAggregateExpression())
}

case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k >= 1 && k <= (1 << 20), s"top-k k out of range: $k")

  override def prettyName: String = "top_k_by_score"
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score expects (double, bigint), got ($s, $i)")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) {
      buffer.add(other.scores(i), other.ids(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i)).putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val id = bb.getLong()
      buf.add(s, id)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}
