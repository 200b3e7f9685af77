package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Plan-shape assertions (SURVEY §5 layer 5): the optimizations the engine
  * relies on at 100 TB must be visible in the physical plan at any scale —
  * filter pushdown into the parquet scan, column pruning, broadcast of the
  * small join side, and map-side partial aggregation.
  */
class PlanSpec extends AnyFunSuite with SparkTestHarness {

  private val sf = "/root/testdata/sf0.001"

  test("filter is pushed into the parquet scan") {
    val plan = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 50000.0)
      .select("o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,50000.0)]"),
      s"missing pushed filter in:\n$plan")
  }

  test("column pruning reaches the scan: 2-column projection reads 2 columns") {
    val plan = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_returnflag:string>"),
      s"scan reads more than the projection needs:\n$plan")
  }

  test("group-by aggregation is partial (map-side combine) before the shuffle") {
    val plan = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), s"no partial aggregation in:\n$plan")
  }

  test("cosine top-k broadcasts the query side — corpus is never shuffled") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = Similarity.cosineTopK(e, e.filter(col("vec_id") % 50 === 0),
      "vec_id", "embedding", 5)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$plan")
    // The corpus side of the scoring join must not be exchanged.
    val joinIdx = plan.indexOf("Broadcast")
    assert(joinIdx >= 0)
  }

  test("whole-stage codegen covers the custom expression pipeline") {
    // shingle_hashes -> simhash64 and shingle_hashes -> minhash_signature
    // are native expressions: the entire dedup map stage must stay inside
    // one WholeStageCodegen span (the composable higher-order-function
    // formulation is CodegenFallback and breaks the span — that regression
    // is exactly what this guards).
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(
        graft.functions.TextHashes.simhash64(
          graft.text.TextFunctions.shingleHashes(col("text"), 3)).as("sh"),
        graft.functions.TextHashes.minhashSignature(
          graft.text.TextFunctions.shingleHashes(col("text"), 3), 16).as("sig"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"custom expressions broke codegen:\n$plan")
  }
}
