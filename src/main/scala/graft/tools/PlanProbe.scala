package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = (1L to 10000L).map(i => (i % 500, i % 997)).toDF("src", "dst")
      .repartition(8, col("src")).localCheckpoint(true)
    val reps = e.groupBy(col("src")).agg(min(col("dst")).as("rep"))
    val joined = e.join(reps.withColumnRenamed("src", "v"), col("src") === col("v"))
    println("=== groupBy plan ===")
    println(reps.queryExecution.executedPlan.toString.linesIterator.filter(l => l.contains("Exchange") || l.contains("HashAggregate") || l.contains("Scan")).mkString("\n"))
    println("=== join plan ===")
    println(joined.queryExecution.executedPlan.toString.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Scan")).mkString("\n"))
    spark.stop()
  }
}
