package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Reps >= 2 makes the record self-defending: the steady-state (2nd)
    // rep of a trivial query is immune to one-time costs, so single-shot
    // >> steady on UNCHANGED trivial queries indicates a starved host
    // (the round-4 ~690 s artifact), not a plan regression.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-bench-warehouse-${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Materialize EVERY output column, not just the row count: under
    // .count() Catalyst prunes all columns and can elide the gated
    // computation entirely (the documented q17b 0.16 s artifact — the
    // register math was never run). Executing the physical plan's own RDD
    // counts rows AFTER whole-stage codegen has written every output column
    // into each UnsafeRow, so the bench measures exactly what Verify's
    // parquet dump computes, minus the write I/O — and it is type-agnostic
    // (no hash-function restrictions on map/binary columns).
    def materialize(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(); ()
    }
    // Warm the session (codegen, shuffle machinery, parquet footers) so the
    // first measured query doesn't absorb one-time startup costs.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    // (name, single-shot sec, steady sec, error). A throwing query must not
    // masquerade as a fast one: its timing is still recorded but flagged in
    // "errors"; later reps are skipped once a query errors.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var err: Option[String] = None
      val times = (1 to reps).flatMap { _ =>
        if (err.isDefined) None
        else {
          val t0 = System.nanoTime()
          err = try { materialize(fn(spark, sfDir)); None }
            catch { case e: Throwable => Some(e.getClass.getSimpleName) }
          Some((System.nanoTime() - t0) / 1e9)
        }
      }
      (name, times.head, times.last, err)
    }
    def jmap(f: ((String, Double, Double, Option[String])) => Option[String]) =
      results.flatMap(r => f(r)).mkString("{", ",", "}")
    val qs = jmap { case (k, v, _, _) => Some(s"\"" + k + "\":" + v) }
    val steady = jmap { case (k, _, v, _) => Some(s"\"" + k + "\":" + v) }
    val errs = jmap { case (k, _, _, e) => e.map(x => s"\"" + k + "\":\"" + x + "\"") }
    val total = results.map(_._2).sum
    val steadyTotal = results.map(_._3).sum
    // Round-over-round regression tracking: against the newest PRIOR round's
    // BENCH_r*.json in the cwd, emit per-query steady deltas (this - prev,
    // seconds) so a single-query 5x move surfaces in the round's own
    // artifact instead of a judge diff. Prev values are scraped as the LAST
    // "name":number occurrence in the file (the steady map follows the
    // single-shot map in this format, and the driver may keep only the
    // stdout tail). Placed at the END of the JSON line so it survives that
    // tail truncation too.
    //
    // "Prior round" matters: when this run's own BENCH_r{N}.json already
    // sits in the work tree (a judge or builder re-run), naively taking the
    // newest file compares the run against itself and reports ~0 deltas,
    // hiding regressions (the round-11 incident). The current round is
    // VERDICT.md's "Round V" + 1 (the verdict on disk always describes the
    // round BEFORE the one being benchmarked, both in driver runs and in
    // judge re-runs that predate the new verdict); files from that round on
    // are excluded. SPARK_GRAFT_BENCH_ROUND overrides the derivation.
    val deltas: String = try {
      // No VERDICT.md and no env override => the current round is UNKNOWN,
      // and an Int.MaxValue fallback would treat this round's own
      // BENCH_r{N}.json (if already on disk from a re-run) as prior — the
      // self-comparison (~0 deltas) this derivation exists to prevent.
      // Unknown round => no deltas, honestly.
      val roundOpt: Option[Int] = sys.env.get("SPARK_GRAFT_BENCH_ROUND")
        .map(_.toInt)
        .orElse {
          val v = new java.io.File("VERDICT.md")
          if (!v.exists()) None
          else "Round\\s+(\\d+)".r
            .findFirstMatchIn(new String(java.nio.file.Files.readAllBytes(v.toPath)))
            .map(_.group(1).toInt + 1)
        }
      if (roundOpt.isEmpty) throw new IllegalStateException("round unknown")
      val currentRound: Int = roundOpt.get
      val dir = new java.io.File(".")
      // Newest-first over PRIOR rounds; a file whose payload was lost to
      // tail truncation (the r11 parsed-null artifact) yields zero scraped
      // entries and the walk falls back one round further.
      val prevFiles = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.matches("BENCH_r\\d+\\.json"))
        .filter(f => "\\d+".r.findFirstIn(f.getName).get.toInt < currentRound)
        .sortBy(f => -"\\d+".r.findFirstIn(f.getName).get.toInt)
      prevFiles.iterator.map { f =>
        val raw = new String(java.nio.file.Files.readAllBytes(f.toPath))
        // Truncate at the prev round's own deltas block: otherwise the
        // LAST "name":number occurrence IS last round's delta and the
        // scrape would feed on its own output from round N+1 onward.
        val text = raw.indexOf("deltas_vs_prev") match {
          case -1 => raw
          case i  => raw.substring(0, i)
        }
        val entries = results.flatMap { case (name, _, cur, _) =>
          // \\? : the driver wraps Bench's stdout inside a quoted JSON
          // string field, so quotes arrive escaped (\"name\":1.2).
          val re = ("\\\\?\"" + java.util.regex.Pattern.quote(name) +
            "\\\\?\":([0-9.eE+-]+)").r
          re.findAllMatchIn(text).toSeq.lastOption.map { m =>
            val prev = m.group(1).toDouble
            // Locale.ROOT: a comma-decimal default locale would emit
            // invalid JSON ("q01":-0,300).
            val d = String.format(java.util.Locale.ROOT, "%.3f",
              Double.box(cur - prev))
            s""""$name":$d"""
          }
        }
        entries.mkString("{", ",", "}")
      }.find(_ != "{}").getOrElse("{}")
    } catch { case _: Throwable => "{}" }
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""queries_steady":$steady,"steady_total":$steadyTotal,""" +
      s""""reps":$reps,"errors":$errs,"sf":"$sfDir",""" +
      s""""deltas_vs_prev":$deltas}"""
    // BENCH_LAST.json is written BEFORE spark.stop(): the file belt must
    // not depend on a clean shutdown (a wedged or throwing stop() would
    // otherwise lose both channels). The stdout line prints AFTER stop():
    // the async state-store maintenance thread's benign
    // RpcEnvStoppedException stack trace during shutdown flooded the
    // driver's stdout tail capture in round 11 and destroyed the
    // artifact's payload (BENCH_r11.json parsed: null) — printing last
    // keeps the JSON line at the tail the driver captures.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LAST.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    // Two stdout channels + the file belt: the bare line LAST (the
    // documented one-JSON-line contract — kept at the very tail so the
    // driver's tail capture sees it), and a greppable "BENCH-JSON: "
    // prefixed copy just above it for parsers that scan by marker instead
    // of position (sbt appends its own "[success]" line after main
    // returns, which broke position-based parsing of BENCH_r12.json).
    println("BENCH-JSON: " + line)
    println(line)
  }
}
