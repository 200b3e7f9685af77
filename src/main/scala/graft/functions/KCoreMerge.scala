package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-vertex update rule of distributed k-core decomposition.
  *
  * Given the neighbours' current core estimates and the vertex's own current
  * core, returns the largest `l` such that at least `l` neighbours have an
  * estimate `>= l`, capped by `current_core` (so cores are monotonically
  * non-increasing). Semantics match the reference kernel
  * (`/root/reference/src/expressions/kcore_merge.rs:29-161`):
  *   - NULL current core => 0
  *   - NULL neighbour list (no message this iteration) => keep current core
  *   - empty list => 0; NULL elements skipped; negatives clamp to 0
  *   - histogram capped at min(current, numNeighbors) so a pathological
  *     current core (e.g. Long.MaxValue) cannot blow up the allocation.
  *
  * Based on Mandal & Al Hasan, "A distributed k-core decomposition algorithm
  * on Spark", IEEE Big Data 2017.
  */
object KCoreMerge {
  def merge(neighbors: Array[Long], currentCore: Long): Long = {
    val cap = math.min(math.max(currentCore, 0L), neighbors.length.toLong).toInt
    val counts = new Array[Long](cap + 1)
    var i = 0
    while (i < neighbors.length) {
      val el = neighbors(i)
      val bucket = math.min(math.max(el, 0L), cap.toLong).toInt
      counts(bucket) += 1
      i += 1
    }
    var currentWeight = 0L
    var k = cap
    while (k >= 1) {
      currentWeight += counts(k)
      if (k.toLong <= currentWeight) return k.toLong
      k -= 1
    }
    0L
  }

  /** Column-level helper: `kcore_merge(neighbors, currentCore)`. */
  def kcore_merge(neighbors: Column, currentCore: Column): Column =
    compat.column(KCoreMergeExpression(
      compat.expression(neighbors), compat.expression(currentCore)))
}

/** Catalyst expression with the reference's custom NULL semantics (a NULL
  * list is "no message", not "unknown"), hence the explicit `eval` instead
  * of `nullSafeEval`. Interpreted eval only: it runs once per vertex per
  * k-core iteration over an already-aggregated list — not the hot path.
  */
case class KCoreMergeExpression(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "kcore_merge"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kcore_merge expects (array<bigint>, bigint), got ($l, $r)")
    }
  }

  override def eval(input: InternalRow): Any = {
    val cur = right.eval(input)
    if (cur == null) return 0L
    val currentCore = cur.asInstanceOf[Long]
    val arr = left.eval(input)
    if (arr == null) return currentCore
    val data = arr.asInstanceOf[ArrayData]
    val n = data.numElements()
    // Skip NULL elements, as the reference's lazy iterator does.
    val values = new scala.collection.mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) {
      if (!data.isNullAt(i)) values += data.getLong(i)
      i += 1
    }
    KCoreMerge.merge(values.toArray, currentCore)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KCoreMergeExpression =
    copy(left = newLeft, right = newRight)
}
