package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

class SamplingSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private def docs = (0L until 1000L).toDF("doc_id")

  test("hashSplit: deterministic, total, and stable under repartitioning") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val once = Sampling.hashSplit(docs, "doc_id", splits).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once.size == 1000, "every row assigned")
    // Weights hold approximately (hash uniformity, n=1000).
    val counts = once.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 160)
    // Stability: a different physical layout yields the identical map.
    val again = Sampling.hashSplit(docs.repartition(7), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == once)
  }

  test("hashSplit rejects weights that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.1))
    }
  }

  test("stratifiedTakeK: k smallest hashes per stratum, sort/window-free plan") {
    val df = (0L until 300L).map(i => (s"s${i % 3}", i)).toDF("source", "doc_id")
    val sampled = Sampling.stratifiedTakeK(df, "source", "doc_id", 4)
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(!plan.toLowerCase.contains("sort "), s"sort in plan:\n$plan")
    val got = sampled.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // Oracle: brute-force smallest-4 by (hash, id) per stratum.
    val hashed = df.withColumn("h", Sampling.keyHash60(col("doc_id")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = hashed.groupBy(_._1).view.mapValues(
      _.sortBy(t => (t._3.toDouble, t._2)).take(4).map(_._2).toSet).toMap
    assert(got == expected)
    // Strata smaller than k return everything.
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("source", "doc_id")
    assert(Sampling.stratifiedTakeK(tiny, "source", "doc_id", 4).count() == 3)
  }
}
