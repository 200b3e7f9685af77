package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.types._

/** Sparse label-frequency histogram: distinct label → multiplicity. The
  * sufficient statistic for the label-propagation mode — `collect_list`
  * carries the full neighbour-label multiset (one entry per edge through
  * the shuffle, no map-side reduction, O(degree) per-group state on hubs),
  * while the histogram partials combine on the map side and its size is
  * bounded by the number of DISTINCT neighbour labels, not the degree. On
  * a skewed graph a degree-d celebrity vertex's aggregation state shrinks
  * from d entries to the distinct-label count — in late LPA rounds usually
  * a handful — the same skew-robust shape [[CoreHistogram]] gives k-core.
  */
final class LabelHistogram {
  val counts = scala.collection.mutable.LongMap.empty[Long]

  def add(v: Long, c: Long = 1L): Unit =
    counts.update(v, counts.getOrElse(v, 0L) + c)

  /** Mode with the LPA tie-break: the smallest label among the most
    * frequent. Identical to folding the ascending-sorted multiset with a
    * strict `>` replacement rule (the formulation the unrolled-SQL oracle
    * and the driver sweep use), spec-pinned against that fold.
    */
  def mode: Long = {
    var best = 0L
    var bestCnt = 0L
    counts.foreachEntry { (v, c) =>
      if (c > bestCnt || (c == bestCnt && v < best)) { best = v; bestCnt = c }
    }
    best
  }

  def isEmpty: Boolean = counts.isEmpty
}

object LabelModeAgg {

  /** `label_mode(v)` — aggregate returning the group's most frequent value,
    * ties broken by the smallest value; NULL for an all-NULL/empty group.
    * The fused, map-side-combinable form of label propagation's
    * `collect_list` + sorted run-length fold.
    */
  def label_mode(v: Column): Column =
    compat.column(LabelModeAgg(compat.expression(v)).toAggregateExpression())
}

case class LabelModeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LabelHistogram] {

  override def prettyName: String = "label_mode"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t        => TypeCheckResult.TypeCheckFailure(s"label_mode expects bigint, got $t")
  }

  override def createAggregationBuffer(): LabelHistogram = new LabelHistogram

  override def update(buffer: LabelHistogram, input: InternalRow): LabelHistogram = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: LabelHistogram, other: LabelHistogram): LabelHistogram = {
    other.counts.foreachEntry((v, c) => buffer.add(v, c))
    buffer
  }

  override def eval(buffer: LabelHistogram): Any =
    if (buffer.isEmpty) null else buffer.mode

  override def serialize(buffer: LabelHistogram): Array[Byte] = {
    val n = buffer.counts.size
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    buffer.counts.foreachEntry { (v, c) => bb.putLong(v); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LabelHistogram = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new LabelHistogram
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val v = bb.getLong(); val c = bb.getLong()
      buf.add(v, c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LabelModeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LabelModeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LabelModeAgg =
    copy(child = newChildren(0))
}
