package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Ports the reference kernels' algebraic unit tests
  * (`finite_axpb.rs:141-213`, `kcore_merge.rs:205-259`).
  */
class KernelSpec extends AnyFunSuite with SparkTestHarness {
  import FiniteAxpb.axpb

  private def longs(n: Int): Seq[Long] = {
    val rng = new scala.util.Random(42)
    Seq.fill(n)(rng.nextLong()) ++ Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue)
  }

  test("axpb: zero multiplier is the constant map") {
    for (x <- longs(50); b <- Seq(0L, 7L, -3L)) assert(axpb(0L, x, b) === b)
  }

  test("axpb: zero input is the constant map") {
    for (a <- longs(50); b <- Seq(0L, 7L, -3L)) assert(axpb(a, 0L, b) === b)
  }

  test("axpb: identity multiplier is XOR with b") {
    for (x <- longs(50); b <- Seq(0L, 7L, -3L)) assert(axpb(1L, x, b) === (x ^ b))
  }

  test("axpb: carry-less multiplication commutes") {
    val vs = longs(30)
    for (a <- vs; x <- vs.take(10)) assert(axpb(a, x, 0L) === axpb(x, a, 0L))
  }

  test("axpb: bit-63 reduction path") {
    assert(axpb(Long.MinValue, 0x3L, 0L) === (Long.MinValue ^ 0x1bL))
  }

  test("axpb: XOR distributes over the affine term") {
    for (a <- longs(20); x <- longs(5); b <- Seq(13L, -99L))
      assert(axpb(a, x, b) === (axpb(a, x, 0L) ^ b))
  }

  test("axpb: SQL expression matches the host kernel (codegen parity)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (0L, 5L, 7L), (1L, 5L, 7L), (Long.MinValue, 3L, 0L),
      (123456789L, -987654321L, 42L), (-1L, -1L, -1L))
    val got = rows.toDF("a", "x", "b")
      .select(FiniteAxpb.finite_axpb(col("a"), col("x"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(got === rows.map { case (a, x, b) => axpb(a, x, b) })
  }

  test("axpb: null propagation in SQL") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((Some(1L), None: Option[Long], Some(2L))).toDF("a", "x", "b")
    val got = df.select(FiniteAxpb.finite_axpb(col("a"), col("x"), col("b"))).collect()
    assert(got.head.isNullAt(0))
  }

  import KCoreMerge.merge

  test("kcore_merge: rule cases from the reference") {
    assert(merge(Array.empty[Long], 5L) === 0L)
    assert(merge(Array(1L), 1L) === 1L)
    assert(merge(Array(2L, 2L), 2L) === 2L)
    assert(merge(Array(1L, 1L, 1L), 3L) === 1L)
    assert(merge(Array(5L, 5L, 5L), 3L) === 3L)
    assert(merge(Array(2L, 2L, 1L), 4L) === 2L)
    assert(merge(Array(-5L, -1L), 3L) === 0L)
  }

  test("kcore_merge: capped by current core") {
    assert(merge(Array(9L, 9L, 9L, 9L), 2L) === 2L)
  }

  test("kcore_merge: pathological Long.MaxValue inputs do not OOM") {
    assert(merge(Array(Long.MaxValue, Long.MaxValue), Long.MaxValue) === 2L)
    assert(merge(Array(Long.MaxValue), 1L) === 1L)
  }

  test("kcore_merge: SQL expression with NULL semantics") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Some(Seq(2L, 2L)), 2L),
      (2L, None, 7L),            // NULL list => keep current core
      (3L, Some(Seq.empty[Long]), 3L)
    ).toDF("id", "nbrs", "core")
    val got = df.select(col("id"), KCoreMerge.kcore_merge(col("nbrs"), col("core")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 7L, 3L -> 0L))
  }
}
