package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.types._

/** `array_dot(a, b)` — dot product of two double arrays as a native codegen
  * expression. The composable formulation `aggregate(zip_with(a, b, *), …)`
  * allocates an intermediate array per row and falls out of whole-stage
  * codegen (higher-order functions are interpreted); on all-pairs cosine
  * scans (O(n²) rows) that overhead dominates. This kernel is a single
  * allocation-free loop, left-to-right — the SAME IEEE summation order as
  * the left fold, so results stay bit-identical with the SQL-oracle
  * formulation.
  *
  * Edge semantics mirror DuckDB's `list_dot_product` (the oracle twin):
  * mismatched lengths RAISE and a null element RAISES — silently truncating
  * or skipping would return a plausible-but-wrong similarity. The null scan
  * is compiled away when both child types declare `containsNull = false`.
  */
object ArrayDot {
  def array_dot(a: Column, b: Column): Column =
    compat.column(ArrayDotExpression(compat.expression(a), compat.expression(b)))

  def kernel(a: ArrayData, b: ArrayData, checkNulls: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"array_dot: array lengths must be equal, got $n and ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i)))
        throw new IllegalArgumentException(
          s"array_dot: arrays must not contain null elements (index $i)")
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

case class ArrayDotExpression(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "array_dot"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"array_dot expects two array<double>, got $l, $r")
    }

  private def checkNulls: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _                                    => true
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], checkNulls)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayDot.kernel($a, $b, $checkNulls)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotExpression =
    copy(left = newLeft, right = newRight)
}
