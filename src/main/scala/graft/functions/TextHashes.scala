package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.types._

/** Hash kernels for large-scale text dedup, designed as native Catalyst
  * expressions (whole-stage codegen, no UDF serialization) because they sit
  * in the per-document hot path of 100 TB dedup sweeps.
  *
  * All constants are fixed so signatures are reproducible across runs and
  * clusters (a requirement for incremental dedup: yesterday's signatures
  * must stay comparable with today's).
  */
object TextHashes {

  /** Deterministic affine-family parameters for MinHash, derived from a
    * seeded SplittableRandom-style mix so every executor agrees without
    * shipping state. `a` is forced odd (invertible mod 2^64).
    */
  private[functions] def minhashParams(k: Int): (Array[Long], Array[Long]) = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var s = 0x9e3779b97f4a7c15L // fixed seed: golden-ratio increment
    def next(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    var i = 0
    while (i < k) { a(i) = next() | 1L; b(i) = next(); i += 1 }
    (a, b)
  }

  /** `minhash_signature(tokenHashes)` — k-wide MinHash signature of a
    * shingle-hash array: `sig[i] = min over h of (a_i*h + b_i)` (mod 2^64,
    * wrapping). Empty/NULL-element-free input yields Long.MaxValue slots so
    * empty docs never collide with real content.
    */
  def minhashSignature(tokenHashes: Column, k: Int): Column =
    compat.column(MinHashSignature(compat.expression(tokenHashes), k))

  /** `simhash64(tokenHashes)` — 64-bit SimHash: bit j of the result is set
    * iff the majority of token hashes have bit j set (ties -> 0). Documents
    * with small symmetric difference land within small Hamming distance.
    */
  def simhash64(tokenHashes: Column): Column =
    compat.column(SimHash64(compat.expression(tokenHashes)))

  /** `cosine_lsh_bits(vec, nBits)` — random-hyperplane signature of a float
    * embedding: bit j = sign(v . p_j) with pseudo-random unit-free planes
    * p_j[i] = ±1 derived from a fixed hash of (j, i). Hamming distance on the
    * output estimates angular distance; used to bucket ANN candidates.
    */
  def cosineLshBits(vec: Column, nBits: Int): Column =
    compat.column(CosineLshBits(compat.expression(vec), nBits))

  // ---- kernels (public static so generated code can call them) ----

  def minhashKernel(hashes: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      if (!hashes.isNullAt(t)) {
        val h = hashes.getLong(t)
        var i = 0
        while (i < k) {
          val v = a(i) * h + b(i)
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  def simhashKernel(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      if (!hashes.isNullAt(t)) {
        val h = hashes.getLong(t)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) != 0L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** ENGINE-PORTABLE ±1 plane entry: the lowest bit of
    * `portableHash60("plane:j:i")` (see [[PortableHashes]]) — in DuckDB,
    * `('0x' || substr(md5('plane:' || j || ':' || i), 1, 15))::BIGINT % 2`.
    * Portability is what lets an oracle replay the WHOLE ANN pipeline
    * (bits → bands → candidates → exact rerank) in plain SQL. Planes are
    * data-independent, so rows are memoized: the md5 cost is paid once per
    * (plane, dimension), never in the per-row hot loop.
    */
  private val planeRows =
    new java.util.concurrent.atomic.AtomicReferenceArray[Array[Byte]](64)

  private def planeRow(j: Int, dim: Int): Array[Byte] = {
    val cur = planeRows.get(j)
    if (cur != null && cur.length >= dim) cur
    else planeRows.synchronized {
      val again = planeRows.get(j)
      if (again != null && again.length >= dim) again
      else {
        val n = math.max(64, math.max(dim, if (again == null) 0 else again.length * 2))
        val row = new Array[Byte](n)
        var i = 0
        while (i < n) {
          row(i) =
            if ((PortableHashes.portableHash60(s"plane:$j:$i") & 1L) == 0L) 1 else -1
          i += 1
        }
        planeRows.set(j, row)
        row
      }
    }
  }

  def cosineLshKernel(vec: ArrayData, nBits: Int): Long = {
    val n = vec.numElements()
    var out = 0L
    var j = 0
    while (j < nBits) {
      val row = planeRow(j, n)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!vec.isNullAt(i)) {
          val x = vec.getFloat(i).toDouble
          if (row(i) > 0) acc += x else acc -= x
        }
        i += 1
      }
      if (acc > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** See [[TextHashes.minhashSignature]]. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 1024, s"minhash k out of range: $k")
  @transient private lazy val (pa, pb) = TextHashes.minhashParams(k)

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_signature expects array<bigint>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.minhashKernel(input.asInstanceOf[ArrayData], pa, pb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mh", this, classOf[MinHashSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalArray($c)")
  }

  def evalArray(input: ArrayData): ArrayData = TextHashes.minhashKernel(input, pa, pb)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** See [[TextHashes.simhash64]]. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<bigint>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.simhashKernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhashKernel($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** See [[TextHashes.cosineLshBits]]. */
case class CosineLshBits(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 64, s"cosine LSH bits out of range: $nBits")

  override def prettyName: String = "cosine_lsh_bits"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cosine_lsh_bits expects array<float>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.cosineLshKernel(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.cosineLshKernel($c, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): CosineLshBits =
    copy(child = newChild)
}
