package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/** Measures the interpreted-HOF lambda cost in [[TextFunctions.htmlToText]]
  * (the r11 quantize-lambda precedent: ingest-scan HOFs deserve the check).
  * Two formulations of the t18 kernel over the same synthesized HTML:
  *
  *  - `hof`: the shipped shape — filter/transform lambdas over the line
  *    array, map-only, zero shuffle, but higher-order lambda bodies run
  *    INTERPRETED (HOFs never enter whole-stage codegen).
  *  - `exploded`: posexplode the lines, per-line keep/visible as flat
  *    codegen projections, then ONE groupBy(doc_id) re-assembly — every
  *    regex runs inside codegen, at the price of a corpus-sized shuffle.
  *
  * Prints per-rep wall seconds for each and cross-checks the two produce
  * identical text, so the measurement can never drift off the semantics.
  * `runMain graft.tools.HtmlHofProbe [reps]`, SPARK_GRAFT_SF_DIR as usual.
  */
object HtmlHofProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val shared = () => graft.SparkEntry.queries("t18_html_extract")(spark, sfDir)
    val hof3 = () => tripleHofExtract(spark, sfDir)
    val expl = () => explodedHtmlExtract(spark, sfDir)

    // Semantics cross-check first: the three formulations must agree row
    // for row, or the timing below compares different operators.
    Seq("hof3x" -> hof3, "exploded" -> expl).foreach { case (name, mk) =>
      val diff = shared().exceptAll(mk()).count() + mk().exceptAll(shared()).count()
      require(diff == 0, s"$name disagrees with shipped shared-aux on $diff rows")
    }
    println("PROBE html formulations agree")

    // Materialize EVERY output column (Bench.materialize's discipline):
    // under .count() Catalyst prunes all projections and elides the HTML
    // kernel entirely for the map-only branches — the probe would time
    // a parquet row count, not the lambdas it exists to measure. And
    // build a FRESH DataFrame per rep: re-counting a cached
    // queryExecution.toRdd would let the exploded branch reuse its
    // shuffle map output across reps, timing only the reduce stage.
    Seq("shared" -> shared, "hof3x" -> hof3, "exploded" -> expl)
      .foreach { case (name, mk) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          mk().queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE html-$name%-10s ${times.map(t => f"$t%.2f").mkString("  ")}")
      }
    spark.stop()
  }

  /** The pre-r15 shipped shape: three independent HOF output columns, each
    * embedding its own copy of the block-strip/split/visible regex chain —
    * kept as the probe baseline that motivated the shared-aux rewrite.
    */
  private def tripleHofExtract(spark: SparkSession, d: String): DataFrame = {
    import graft.text.TextFunctions
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val html = synthHtml
    docs.select(col("doc_id"),
      TextFunctions.htmlToText(html).as("clean_text"),
      TextFunctions.htmlKeptLines(html).as("n_kept_lines"),
      TextFunctions.htmlDroppedLines(html).as("n_boiler_lines"))
  }

  private def synthHtml: org.apache.spark.sql.Column = {
    val nl = "\n"
    concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title>" + nl +
        "<style>" + nl + "p { color: red; }" + nl + "</style>" + nl +
        "<script>" + nl + "var x = 1; if (x < 2) { x = 3; }" + nl +
        "</script>" + nl +
        "</head><body>" + nl +
        "<!-- boilerplate" + nl + "nav comment -->" + nl +
        "<div><a href=\"/home\">Home</a> | <a href=\"/about\">About us</a>" +
        " | <a href=\"/contact\">Contact</a></div>" + nl +
        "<h1>Title &amp; subtitle "), col("doc_id").cast("string"),
      lit("</h1>" + nl + "<p>"), col("text"),
      lit("</p>" + nl +
        "<p>Footer &nbsp;entities&nbsp; stay &lt;escaped&gt;" +
        " &quot;quoted&quot;</p>" + nl +
        "<div>Read more: <a href=\"/next\">next page</a>" +
        " and other stories follow here</div>" + nl +
        "</body></html>"))
  }

  /** The t18 kernel with every lambda flattened: per-line columns in a
    * codegen projection after posexplode, re-assembled per doc with a
    * sort_array(collect_list(struct)) aggregate. The final tiny
    * array re-join uses one transform on the already-aggregated array —
    * per-DOC, not per-line, so its interpretation cost is amortized.
    */
  private def explodedHtmlExtract(spark: SparkSession, d: String): DataFrame = {
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(
      coalesce(synthHtml, lit("")),
      HtmlCommentRe, " "), HtmlScriptRe, " "), HtmlStyleRe, " ")
    def visible(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(regexp_replace(c, HtmlTagRe, " "), "[ \\t\\r]+", " "))
    val perLine = docs
      .select(col("doc_id"), posexplode(split(noBlocks, "\n")).as(Seq("pos", "l")))
      .select(col("doc_id"), col("pos"), visible(col("l")).as("v"),
        length(visible(array_join(
          regexp_extract_all(col("l"), lit(HtmlAnchorRe), lit(1)), " "))).as("al"))
      .withColumn("keep", length(col("v")) > 0 && lit(2) * col("al") <= length(col("v")))
      .withColumn("drop", length(col("v")) > 0 && lit(2) * col("al") > length(col("v")))
    perLine.groupBy("doc_id")
      .agg(
        sort_array(collect_list(when(col("keep"), struct(col("pos"), col("v")))))
          .as("kept"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept_lines"),
        sum(when(col("drop"), 1L).otherwise(0L)).as("n_boiler_lines"))
      .select(col("doc_id"),
        trim(regexp_replace(
          Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
              "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
            .foldLeft(array_join(transform(col("kept"), x => x.getField("v")), " ")) {
              case (acc, (k, v)) => replace(acc, lit(k), lit(v)) },
          "[ \\t\\r]+", " ")).as("clean_text"),
        col("n_kept_lines"), col("n_boiler_lines"))
  }
}
