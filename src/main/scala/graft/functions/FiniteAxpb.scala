package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.types.{DataType, LongType}

/** GF(2^64) affine hash: `(a ⊗ x) ⊕ b`.
  *
  * `⊗` is carry-less (polynomial) multiplication over GF(2^64), reduced
  * modulo the irreducible polynomial `x^64 + x^4 + x^3 + x + 1` (reduction
  * constant `0x1b`); `⊕` is XOR (the field's addition). Bit-identical to the
  * reference kernel (`/root/reference/src/expressions/finite_axpb.rs:17-34`)
  * — connected components composes these maps on the driver during
  * back-propagation, so the distributed and host evaluations must agree.
  */
object FiniteAxpb {
  final val IrrPoly: Long = 0x1bL

  def axpb(a: Long, x: Long, b: Long): Long = {
    var r: Long = 0L
    var currentA: Long = a
    var currentX: Long = x
    while (currentX != 0L) {
      if ((currentX & 1L) != 0L) r ^= currentA
      currentX >>>= 1
      currentA =
        if ((currentA & Long.MinValue) != 0L) (currentA << 1) ^ IrrPoly
        else currentA << 1
    }
    r ^ b
  }

  /** Column-level helper: `finite_axpb(a, x, b)` over three Long columns. */
  def finite_axpb(a: Column, x: Column, b: Column): Column =
    compat.column(FiniteAxpbExpression(
      compat.expression(a), compat.expression(x), compat.expression(b)))
}

/** Native Catalyst expression for [[FiniteAxpb.axpb]] with whole-stage
  * codegen (called once per edge per WCC iteration — the hot path).
  * Null-propagating, deterministic, foldable when all inputs are literals.
  */
case class FiniteAxpbExpression(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def prettyName: String = "finite_axpb"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"finite_axpb expects three bigint arguments, got ${children.map(_.dataType)}")

  override protected def nullSafeEval(a: Any, x: Any, b: Any): Any =
    FiniteAxpb.axpb(a.asInstanceOf[Long], x.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, x, b) => s"graft.functions.FiniteAxpb.axpb($a, $x, $b)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): FiniteAxpbExpression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
