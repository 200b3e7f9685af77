package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.types._

/** `first_zero_band(x, r, nBands)` — index of the lowest `r`-bit group of
  * `x` that is all zeros, or -1 when none of the first `nBands` groups is.
  *
  * The banded-LSH dedup joins emit a candidate pair once per colliding band
  * and then need exactly one of those emissions. A post-join `distinct`
  * pays a full shuffle of the pre-dedup pair stream (b/2^r of the quadratic
  * pair space); instead, the join keeps a pair only in the FIRST band where
  * the two signatures agree — `first_zero_band(sigA ^ sigB) = band` — which
  * makes the candidate set unique by construction inside the join's codegen,
  * before anything hits the wire.
  */
object FirstZeroBand {
  def first_zero_band(x: Column, r: Int, nBands: Int): Column =
    compat.column(FirstZeroBandExpression(compat.expression(x), r, nBands))

  def kernel(x: Long, r: Int, nBands: Int): Int = {
    val mask = (1L << r) - 1L
    var b = 0
    while (b < nBands) {
      if (((x >>> (b * r)) & mask) == 0L) return b
      b += 1
    }
    -1
  }
}

case class FirstZeroBandExpression(child: Expression, r: Int, nBands: Int)
    extends UnaryExpression {
  require(r >= 1 && nBands >= 1 && r * nBands <= 64,
    s"need 1 <= r, 1 <= nBands, r*nBands <= 64; got r=$r nBands=$nBands")

  override def prettyName: String = "first_zero_band"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t        => TypeCheckResult.TypeCheckFailure(s"first_zero_band expects bigint, got $t")
  }

  override protected def nullSafeEval(x: Any): Any =
    FirstZeroBand.kernel(x.asInstanceOf[Long], r, nBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.FirstZeroBand.kernel($x, $r, $nBands)")

  override protected def withNewChildInternal(newChild: Expression): FirstZeroBandExpression =
    copy(child = newChild)
}
