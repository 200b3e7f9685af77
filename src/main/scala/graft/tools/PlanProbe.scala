package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.checkpointing

/** Demonstrates (a) Dataset.localCheckpoint under AQE LOSES output
  * partitioning — the groupBy re-shuffles; (b) graft's
  * localCheckpointHashPartitioned declares it — no Exchange.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = (1L to 10000L).map(i => (i % 500, i % 997)).toDF("src", "dst")

    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(l => l.contains("Exchange hashpartitioning"))

    val plain = base.repartition(8, col("src")).localCheckpoint(true)
    val declared = checkpointing.localCheckpointHashPartitioned(
      base.repartition(8, col("src")), Seq("src"), 8, eager = true)

    val gPlain = plain.groupBy(col("src")).agg(min(col("dst")).as("rep"))
    val gDecl = declared.groupBy(col("src")).agg(min(col("dst")).as("rep"))
    println(s"PROBE exchanges: plainCheckpoint=${exchanges(gPlain)} declaredCheckpoint=${exchanges(gDecl)}")
    // correctness: same aggregation result either way
    val a = gPlain.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = gDecl.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"PROBE results-equal=${a == b} rows=${a.size}")
    spark.stop()
  }
}
