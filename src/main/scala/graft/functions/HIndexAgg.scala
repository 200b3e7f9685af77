package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.types._

/** Sparse histogram of core estimates: distinct value → multiplicity.
  * The sufficient statistic for the H-index — `collect_list` carries the
  * full multiset (one row per edge through the shuffle, no map-side
  * reduction, O(degree) per-group state on hubs), while the histogram
  * partials combine on the map side and its size is bounded by the number
  * of DISTINCT neighbour core values, not the degree. On a skewed graph a
  * degree-d hub's aggregation state shrinks from d entries to at most the
  * distinct-core count — the skew-robust shape for 100 TB graphs.
  */
final class CoreHistogram {
  val counts = scala.collection.mutable.LongMap.empty[Long]

  def add(v: Long, c: Long = 1L): Unit =
    counts.update(v, counts.getOrElse(v, 0L) + c)

  /** H-index of the multiset: max `l` such that at least `l` elements are
    * ≥ `l`. Standard identity: scan distinct values descending with the
    * cumulative multiplicity `cum`; the answer is max of min(v, cum) —
    * equal to `max(least(row_number, value))` over the DESC-sorted list
    * (the unrolled-SQL oracle formulation) and to the capped-histogram
    * scan of [[KCoreMerge]].
    */
  def hIndex: Long = {
    val vs = counts.keysIterator.toArray
    java.util.Arrays.sort(vs)
    var cum = 0L
    var h = 0L
    var i = vs.length - 1
    while (i >= 0) {
      cum += counts(vs(i))
      val cand = math.min(vs(i), cum)
      if (cand > h) h = cand
      i -= 1
    }
    h
  }
}

object HIndexAgg {

  /** `h_index(v)` — aggregate returning the H-index of the group's values:
    * the largest `l` such that at least `l` values are ≥ `l`. The fused,
    * map-side-combinable form of `kcore_merge(collect_list(v), current)`
    * minus the cap (apply `least(current, h_index)` outside): identical
    * values by the H-index identity (spec-pinned against [[KCoreMerge]]
    * on random multisets).
    */
  def h_index(v: Column): Column =
    compat.column(HIndexAgg(compat.expression(v)).toAggregateExpression())
}

case class HIndexAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CoreHistogram] {

  override def prettyName: String = "h_index"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t        => TypeCheckResult.TypeCheckFailure(s"h_index expects bigint, got $t")
  }

  override def createAggregationBuffer(): CoreHistogram = new CoreHistogram

  override def update(buffer: CoreHistogram, input: InternalRow): CoreHistogram = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: CoreHistogram, other: CoreHistogram): CoreHistogram = {
    other.counts.foreachEntry((v, c) => buffer.add(v, c))
    buffer
  }

  override def eval(buffer: CoreHistogram): Any = buffer.hIndex

  override def serialize(buffer: CoreHistogram): Array[Byte] = {
    val n = buffer.counts.size
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    buffer.counts.foreachEntry { (v, c) => bb.putLong(v); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CoreHistogram = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new CoreHistogram
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val v = bb.getLong(); val c = bb.getLong()
      buf.add(v, c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HIndexAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HIndexAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HIndexAgg =
    copy(child = newChildren(0))
}
