package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import graft.graph.GraphFrame
object WccTime {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(); taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    val d = s"/root/testdata/sf$sf"
    val edges = spark.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey").as("src"), (col("c_nationkey").cast("long") + 3000000L).as("dst"))
      .unionAll(spark.read.parquet(s"$d/nation.parquet").select(
        (col("n_nationkey").cast("long") + 3000000L).as("src"),
        (col("n_regionkey").cast("long") + 3500000L).as("dst")))
    val g = GraphFrame.fromEdges(edges)
    for (i <- 1 to 2) {
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      val r = g.connectedComponents.run()
      val n = r.components.count()
      val wall = (System.nanoTime()-t0)/1e9
      println(f"WCCTIME run$i sf=$sf rows=$n iters=${r.iterations} sec=$wall%.2f jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} taskSec=${taskMs.get/1000.0}%.1f")
    }
    spark.stop()
  }
}
