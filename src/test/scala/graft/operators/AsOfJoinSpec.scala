package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** As-of join semantics pinned against DuckDB's native `ASOF LEFT JOIN`
  * behavior (the q20 oracle): inclusive `b.t <= p.t`, greatest-predecessor
  * wins, probes with no predecessor get NULLs, and NULL never matches —
  * not as a key (`NULL = NULL` is not a match) and not as a build time.
  */
class AsOfJoinSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private def build = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c")
  ).toDF("k", "t", "v")

  private def run(probe: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame = build) =
    AsOfJoin.lastAtOrBefore(probe, b, "k", "t", Seq("k", "t"), Seq("v"))
      .orderBy("k", "t").collect().toSeq

  test("greatest at-or-before wins; equal t is inclusive; no predecessor -> NULLs") {
    val probe = Seq((1L, 15L), (1L, 25L), (1L, 10L), (1L, 5L), (2L, 5L), (3L, 1L))
      .toDF("k", "t")
    assert(run(probe) == Seq(
      Row(1L, 5L, null, null),        // before every build row
      Row(1L, 10L, "a", 10L),         // equal-t inclusive
      Row(1L, 15L, "a", 10L),
      Row(1L, 25L, "b", 20L),         // greatest predecessor, not first
      Row(2L, 5L, "c", 5L),
      Row(3L, 1L, null, null)))       // key with no build rows
  }

  test("NULL build times never match (DuckDB parity: p.t >= NULL is no match)") {
    val b = build.unionByName(Seq((1L, Option.empty[Long], "z"))
      .toDF("k", "t", "v"))
    val probe = Seq((1L, 5L), (1L, 15L)).toDF("k", "t")
    assert(run(probe, b) == Seq(
      Row(1L, 5L, null, null),        // "z" must NOT leak in
      Row(1L, 15L, "a", 10L)))
  }

  test("NULL keys never match each other; null-key/null-t probes pass through") {
    val b = build.unionByName(Seq((Option.empty[Long], 1L, "n"))
      .toDF("k", "t", "v"))
    val probe = Seq(
      (Option.empty[Long], Option[Long](15L)),
      (Option[Long](1L), Option.empty[Long])).toDF("k", "t")
    val got = AsOfJoin.lastAtOrBefore(probe, b, "k", "t", Seq("k", "t"), Seq("v"))
      .collect().toSet
    assert(got == Set(
      Row(null, 15L, null, null),     // NULL = NULL is not a match
      Row(1L, null, null, null)))     // null probe time precedes everything
  }

  test("probe duplicates at equal t all get the same payload") {
    val probe = Seq((1L, 10L), (1L, 10L), (1L, 10L)).toDF("k", "t")
    assert(run(probe) == Seq.fill(3)(Row(1L, 10L, "a", 10L)))
  }

  test("output name collisions are rejected") {
    val probe = Seq((1L, 10L)).toDF("k", "t")
    intercept[IllegalArgumentException] {
      AsOfJoin.lastAtOrBefore(probe, build, "k", "t", Seq("k", "t", "v"), Seq("v"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.lastAtOrBefore(probe, build, "k", "t", Seq("k", "t", "asof_t"), Seq("v"))
    }
  }
}
