package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text, n)` — distinct token n-gram shingle hashes in ONE
  * codegen pass.
  *
  * Semantically identical to the composable formulation
  * `transform(array_distinct(tokenNgrams(text, n)), g -> xxhash64(g))`
  * (tokens = `[a-z0-9]+` runs of the lower-cased text, n-grams joined with
  * a single space, hashed with Spark's xxhash64 seed 42) — but the lambda
  * chain is CodegenFallback in Spark, which pushes the whole dedup map
  * stage out of whole-stage codegen and allocates three intermediate
  * arrays per row. This kernel tokenizes, shingles, dedups and hashes in a
  * single scan.
  */
object ShingleHashes {
  def shingleHashes(text: Column, n: Int): Column =
    compat.column(ShingleHashesExpression(compat.expression(text), n))

  def kernel(text: UTF8String, n: Int): ArrayData = {
    // Same lowercase as Spark's lower(): UTF8String.toLowerCase.
    val s = text.toLowerCase.toString
    val tokens = new scala.collection.mutable.ArrayBuffer[String](32)
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        while (i < len && {
          val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        tokens += s.substring(start, i)
      } else i += 1
    }
    val m = tokens.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[String](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var t = 0
    while (t < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(t + j))
        j += 1
      }
      seen.add(sb.toString)
      t += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = XxHash64Function.hash(UTF8String.fromString(it.next()), StringType, 42L)
      k += 1
    }
    new GenericArrayData(out)
  }
}

case class ShingleHashesExpression(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 16, s"shingle width out of range: $n")

  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_hashes expects string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.kernel(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.kernel($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpression =
    copy(child = newChild)
}
