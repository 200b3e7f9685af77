package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ENGINE-PORTABLE text-hash kernels: the 60-bit "portable hash" of a string
  * is the first 15 hex digits of its md5, read as an integer — a value ANY
  * engine with md5 can reproduce in plain SQL
  * (`('0x' || substr(md5(g), 1, 15))::BIGINT` in DuckDB,
  * `conv(substring(md5(g), 1, 15), 16, 10)` in Spark SQL). xxhash64
  * ([[ShingleHashes]]) stays the hot-path shingle hash for MinHash (whose
  * gate compares Jaccard VALUES, not hashes); these kernels back the
  * operators whose OUTPUT embeds hash values (SimHash fingerprints,
  * winnowing fingerprints), where cross-engine reproducibility is what
  * makes an exact oracle possible at all. 60 bits keeps the value inside a
  * signed BIGINT for every engine.
  *
  * Both expressions are native codegen kernels — the composable
  * `transform(...)`/`aggregate(...)` formulations are CodegenFallback in
  * Spark and fall out of whole-stage codegen in the per-document hot path.
  */
object PortableHashes {

  /** Ordered (positional, duplicate-preserving) token n-gram portable
    * hashes: tokenize like [[graft.text.TextFunctions.tokens]], join n
    * consecutive tokens with single spaces, hash each. `distinct = true`
    * dedups shingles in first-occurrence order (the SimHash input
    * convention); `false` keeps the full positional sequence (the
    * winnowing input).
    */
  def portableNgramHashes(text: Column, n: Int, distinct: Boolean): Column =
    compat.column(PortableNgramHashes(compat.expression(text), n, distinct))

  /** Distinct per-window minima of a rolling window of width `w` over the
    * hash sequence — winnowing fingerprints (Schleimer et al., SIGMOD'03).
    */
  def winnowMin(hashes: Column, w: Int): Column =
    compat.column(WinnowMin(compat.expression(hashes), w))

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(s) as a long — equals
    * `('0x' || substr(md5(s),1,15))::BIGINT`.
    */
  def portableHash60(s: String): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(7) & 0xffL) >>> 4)
  }

  def ngramKernel(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    // Same tokenizer as ShingleHashes.kernel: [a-z0-9]+ runs of the
    // lower-cased text.
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
    val sb = new java.lang.StringBuilder(64)
    val seen = if (distinct) new java.util.HashSet[String](m * 2) else null
    val out = new scala.collection.mutable.ArrayBuffer[Long](m)
    var t = 0
    while (t < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(t + j))
        j += 1
      }
      val g = sb.toString
      if (seen == null || seen.add(g)) out += portableHash60(g)
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  def winnowKernel(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    if (n - w + 1 <= 0) return new GenericArrayData(Array.emptyLongArray)
    // Monotonic-deque rolling minimum: O(n) total, indices in dq hold
    // strictly increasing hash values within the current window.
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      while (tail > head && hashes.getLong(dq(tail - 1)) >= h) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(hashes.getLong(dq(head)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** See [[PortableHashes.portableNgramHashes]]. */
case class PortableNgramHashes(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1 && n <= 16, s"shingle width out of range: $n")

  override def prettyName: String = "portable_ngram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"portable_ngram_hashes expects string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    PortableHashes.ngramKernel(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHashes.ngramKernel($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): PortableNgramHashes =
    copy(child = newChild)
}

/** See [[PortableHashes.winnowMin]]. */
case class WinnowMin(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1 && w <= 4096, s"winnow window out of range: $w")

  override def prettyName: String = "winnow_min"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_min expects array<bigint> without nulls, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    PortableHashes.winnowKernel(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHashes.winnowKernel($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMin =
    copy(child = newChild)
}
