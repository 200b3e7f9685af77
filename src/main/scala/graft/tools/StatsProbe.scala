package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: does `localCheckpoint` propagate ESTIMATED stats into the new
  * leaf, compounding across iterative rounds? Prints the leaf's estimated
  * sizeInBytes bit-length per round of a self-join loop.
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (noStats <- Seq(false, true)) {
      var df = spark.range(100).selectExpr("id % 10 AS k", "id AS v")
        .localCheckpoint(true)
      for (r <- 1 to 12) {
        val t0 = System.nanoTime()
        val joined = df.as("a").join(df.as("b"), "k")
          .select(col("k"), (col("a.v") + col("b.v")).as("v"))
          .groupBy("k").agg(max("v").as("v"))
        df =
          if (noStats)
            org.apache.spark.sql.graft.checkpointing.localCheckpointNoStats(joined)
          else joined.localCheckpoint(true)
        val bits = df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
        println(f"noStats=$noStats round $r: leaf sizeInBytes bitLength=$bits " +
          f"roundMs=${(System.nanoTime() - t0) / 1e6}%.0f")
      }
    }
    spark.stop()
  }
}
