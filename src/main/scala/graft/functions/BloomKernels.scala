package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** PACKED Bloom-filter kernels for runtime semi-join pruning — the "build a
  * tiny filter from the dimension keys, drop fact rows map-side before any
  * shuffle" pattern Spark itself applies in `InjectRuntimeFilter`, exposed
  * here as an explicit, oracle-checkable operator
  * ([[graft.operators.RuntimeFilter]]).
  *
  * Two pieces:
  *   - [[BloomWordsAgg]]: aggregates bit POSITIONS into a packed `long[]`
  *     bitset (`mBits/64` words). State is fixed-size, partials OR together
  *     on the map side, so building the filter over a billion-key dimension
  *     shuffles `partitions x mBits/64` words — never the keys.
  *   - [[BloomContains]]: a native codegen predicate testing all `kHashes`
  *     probe positions of a LONG key against a driver-collected bitset. The
  *     bitset rides into codegen as a referenced object (exactly how
  *     Spark's own bloom runtime filter ships its subquery result), so the
  *     probe is `kHashes` xxhash64+mask ops inside WholeStageCodegen,
  *     sitting directly above the fact scan.
  *
  * Probe-position contract (shared by [[position]], the JVM kernel, and the
  * declarative build side in `RuntimeFilter`): `pos(salt, key) =
  * xxhash64(key, seed = 42 + salt) mod mBits`. The hash is deliberately
  * NOT the engine-portable md5 family: the bitset is internal — exactness
  * comes from the exact join on the survivors, so the q21 oracle never
  * models it — and xxhash64 probes are ~20x cheaper than md5 in the
  * per-fact-row hot path.
  */
object BloomKernels {

  /** `bloom_words(pos, mBits)` — OR bit positions into a packed bitset.
    * `pos` may be a single integral position per row, or an
    * `array<bigint>` of positions (all set per row) — the array form lets
    * a grouped aggregation build one bloom per group in a single scan
    * with no `explode` row duplication (the [[graft.sources
    * .ManifestTables]] per-file sidecar, where min/max aggregates ride
    * the same scan).
    */
  def bloom_words(pos: Column, mBits: Int): Column =
    org.apache.spark.sql.graft.compat.column(
      BloomWordsAgg(org.apache.spark.sql.graft.compat.expression(pos), mBits)
        .toAggregateExpression())

  /** Per-row probe of a packed-bitset COLUMN (`array<bigint>`, as built by
    * [[bloom_words]]): true iff all `kHashes` probe positions of the long
    * `key` are set. `mBits` derives from the array length (words x 64), so
    * a probe never needs the writer's sizing out-of-band beyond `kHashes`.
    * The column twin of [[bloom_contains]] (which holds a driver-side
    * bitset) — for scans where each ROW carries its own bloom, e.g. a
    * file-manifest with one sidecar per data file.
    */
  def bloom_words_contain(words: Column, key: Column, kHashes: Column): Column =
    org.apache.spark.sql.graft.compat.column(
      BloomWordsContain(org.apache.spark.sql.graft.compat.expression(words),
        org.apache.spark.sql.graft.compat.expression(key),
        org.apache.spark.sql.graft.compat.expression(kHashes)))

  /** Predicate: all `kHashes` positions of the long `key` are set. */
  def bloom_contains(key: Column, words: Array[Long], mBits: Int, kHashes: Int): Column =
    org.apache.spark.sql.graft.compat.column(
      BloomContains(org.apache.spark.sql.graft.compat.expression(key),
        words, mBits, kHashes))

  /** JVM twin of the declarative probe-position formula
    * (`XxHash64(Seq(key), 42 + salt)` == `XXH64.hashLong(key, 42 + salt)`).
    */
  def position(salt: Int, key: Long, mBits: Int): Int =
    java.lang.Math.floorMod(XXH64.hashLong(key, 42L + salt), mBits.toLong).toInt

  def containsKernel(words: Array[Long], key: Long, mBits: Int, kHashes: Int): Boolean = {
    var salt = 0
    while (salt < kHashes) {
      val pos = position(salt, key, mBits)
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      salt += 1
    }
    true
  }

  /** [[containsKernel]] over an unmaterialized ArrayData bitset (the
    * per-row column form — reads only the probed words, never copies the
    * array). mBits = words x 64 by construction of [[BloomWordsAgg]].
    */
  def containsWords(words: org.apache.spark.sql.catalyst.util.ArrayData,
      key: Long, kHashes: Int): Boolean = {
    val mBits = words.numElements() * 64
    var salt = 0
    while (salt < kHashes) {
      val pos = position(salt, key, mBits)
      if ((words.getLong(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      salt += 1
    }
    true
  }
}

/** See [[BloomKernels.bloom_words]]. */
case class BloomWordsAgg(
    pos: Expression, mBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(mBits >= 64 && mBits <= (1 << 28) && mBits % 64 == 0,
    s"bloom mBits must be a multiple of 64 in [64, 2^28], got $mBits")

  override def prettyName: String = "bloom_words"
  override def children: Seq[Expression] = Seq(pos)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = pos.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_words expects an integral position or array<bigint> of " +
        s"positions, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  private def setBit(buffer: Array[Long], p: Long): Unit = {
    require(p >= 0 && p < mBits, s"bloom position out of range: $p (mBits=$mBits)")
    buffer((p >>> 6).toInt) |= 1L << (p & 63)
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = pos.eval(input)
    if (v != null) v match {
      case l: java.lang.Long => setBit(buffer, l.longValue())
      case i: java.lang.Integer => setBit(buffer, i.longValue())
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        var i = 0
        while (i < a.numElements()) {
          if (!a.isNullAt(i)) setBit(buffer, a.getLong(i))
          i += 1
        }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomWordsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomWordsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomWordsAgg =
    copy(pos = newChildren(0))
}

/** See [[BloomKernels.bloom_contains]]. */
case class BloomContains(child: Expression, words: Array[Long], mBits: Int, kHashes: Int)
    extends UnaryExpression {
  require(words.length * 64 == mBits,
    s"bitset word count ${words.length} does not match mBits=$mBits")
  require(kHashes >= 1 && kHashes <= 16, s"bloom kHashes out of range: $kHashes")

  override def prettyName: String = "bloom_contains"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects a LONG key, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    BloomKernels.containsKernel(words, input.asInstanceOf[Long], mBits, kHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomKernels.containsKernel($wordsRef, $c, $mBits, $kHashes)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)

  // words is a plain array — exclude it from case-class equality semantics
  // by comparing identity (two filters with different bitsets must not be
  // deduplicated by plan canonicalization).
  override def equals(other: Any): Boolean = other match {
    case BloomContains(c, w, m, k) =>
      (c == child) && (w eq words) && m == mBits && k == kHashes
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(System.identityHashCode(words)),
      Integer.valueOf(mBits), Integer.valueOf(kHashes))
}

/** See [[BloomKernels.bloom_words_contain]]. Null-propagating; codegen
  * calls the same JVM kernel the eval path uses, reading only the probed
  * words of the per-row bitset (never materializing the array).
  */
case class BloomWordsContain(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def prettyName: String = "bloom_words_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), LongType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "bloom_words_contain expects (array<bigint> words, bigint key, " +
          s"int kHashes), got $other")
    }

  override protected def nullSafeEval(w: Any, k: Any, kh: Any): Any =
    BloomKernels.containsWords(
      w.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      k.asInstanceOf[Long], kh.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, k, kh) =>
      s"graft.functions.BloomKernels.containsWords($w, $k, $kh)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BloomWordsContain =
    copy(first = newFirst, second = newSecond, third = newThird)
}
