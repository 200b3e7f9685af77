package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Degraded-host window detector — four rounds of driver artifacts
    * (4, 5, 13, 14) needed manual judge adjudication on the SAME two
    * mechanical signals, so the payload now self-adjudicates:
    *
    *  1. `backwards` — steady (a later rep of the SAME query in the same
    *     warm session) reads materially SLOWER than its own single-shot:
    *     steady > 1.25x single AND steady - single > 1 s (both: the ratio
    *     alone flags sub-second jitter, the margin alone flags long
    *     queries' normal variance). One such query is noise;
    *     `minBackwards` (5) of them is a starved host (the r14 artifact
    *     had q15b 4.5->29.0 s, g10b 14.7->19.2 s — 1.31x, which sets the
    *     ratio floor — and nine more).
    *  2. `inflated` — steady_total > 1.5x the newest prior full payload
    *     with > 80% of the per-query deltas positive: broad uniform
    *     inflation across untouched families, not a plan regression
    *     (a real regression moves specific queries, not the whole board).
    *
    * Pure so the spec can drive it with synthetic windows. Returns
    * (suspect, offending query names — backwards ones, worst first).
    */
  def hostSuspect(
      perQuery: Seq[(String, Double, Double)],
      steadyTotal: Double,
      prevSteadyTotal: Option[Double],
      deltas: Seq[Double],
      minBackwards: Int = 5): (Boolean, Seq[String]) = {
    val backwards = perQuery
      .filter { case (_, single, steady) =>
        steady > single * 1.25 && steady - single > 1.0 }
      .sortBy { case (_, single, steady) => single - steady }
      .map(_._1)
    val inflated = prevSteadyTotal.exists(p => p > 0 && steadyTotal > 1.5 * p) &&
      deltas.nonEmpty && deltas.count(_ > 0).toDouble / deltas.size > 0.8
    (backwards.size >= minBackwards || inflated, backwards)
  }

  /** INFORMATIONAL drift band below [[hostSuspect]]'s `inflated` bar:
    * six rounds (4, 5, 13, 14, 15, 16) produced same-code windows
    * inflated ~1.2x with broadly positive per-query deltas — real
    * environmental drift, but under the 1.5x threshold, so every one
    * needed manual judge adjudication. steady_total > 1.15x the prior
    * payload AND > 70% of deltas positive names that shape in the
    * payload itself (`host_drift`) WITHOUT tripping `host_suspect` or
    * diverting the belt write — a self-describing window, not a block
    * (a genuine board-wide plan change would move specific queries by
    * large margins, which the per-query delta list still shows). Pure,
    * spec-driven like its siblings.
    */
  def hostDrift(steadyTotal: Double, prevSteadyTotal: Option[Double],
      deltas: Seq[Double]): Boolean =
    prevSteadyTotal.exists(p => p > 0 && steadyTotal > 1.15 * p) &&
      deltas.nonEmpty && deltas.count(_ > 0).toDouble / deltas.size > 0.7

  /** Belt-file guard (r15 verdict): a `host_suspect: true` payload must
    * not OVERWRITE a same-name belt file whose on-disk payload is healthy
    * (`"host_suspect":false`) — round 15's committed `BENCH_FULL_r15.json`
    * carried the driver's degraded 362 s window over the builder's healthy
    * 209 s one, leaving the wrong prior for the next round's delta scrape.
    * A suspect payload diverts to `<name>_suspect.json` instead, so the
    * degraded window is still recorded (the detector's evidence) without
    * destroying the healthy prior. Healthy payloads always take the
    * default name (newer healthy > older healthy: same-code re-runs are
    * the more current prior). Pure so the spec drives it with synthetic
    * payloads; existing = the current on-disk content, None if absent or
    * unreadable.
    *
    * `suffix` (r19 verdict: the driver's c8 re-run clobbered the c32
    * suspect payload — same divert name) distinguishes diverts from runs
    * at different core counts: suffix "_c8" diverts to
    * `<name>_suspect_c8.json`. Healthy payloads are unaffected — they
    * always take the default name.
    */
  def fullPayloadTarget(defaultName: String, existing: Option[String],
      newSuspect: Boolean, suffix: String = ""): String =
    if (newSuspect && existing.exists(_.contains("\"host_suspect\":false")))
      defaultName.stripSuffix(".json") + "_suspect" + suffix + ".json"
    else defaultName

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Reps >= 2 makes the record self-defending: the steady-state (2nd)
    // rep of a trivial query is immune to one-time costs, so single-shot
    // >> steady on UNCHANGED trivial queries indicates a starved host
    // (the round-4 ~690 s artifact), not a plan regression.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    val spark = SparkDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
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
    // SPARK_GRAFT_QUERIES=a,b,c narrows the board for dev smoke runs.
    // A subset run NEVER writes the file belts (enforced at the write
    // site below, not by convention): a partial board's totals are
    // meaningless as a belt, and the host_suspect guard cannot catch
    // the clobber because a subset total is faster, not slower.
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val board = subset match {
      case Some(names) =>
        val unknown = names -- SparkEntry.queries.keySet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_QUERIES names unknown gates: ${unknown.mkString(", ")}")
        SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }
    // (name, single-shot sec, steady sec, error). A throwing query must not
    // masquerade as a fast one: its timing is still recorded but flagged in
    // "errors"; later reps are skipped once a query errors.
    val results = board.toSeq.sortBy(_._1).map { case (name, fn) =>
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
    // No VERDICT.md and no env override => the current round is UNKNOWN,
    // and an Int.MaxValue fallback would treat this round's own
    // BENCH_r{N}.json (if already on disk from a re-run) as prior — the
    // self-comparison (~0 deltas) this derivation exists to prevent.
    // Unknown round => no deltas, honestly (and no thrown signal: a real
    // NumberFormatException from a bad SPARK_GRAFT_BENCH_ROUND must stay
    // distinguishable from "no verdict yet" — it is logged below, not
    // silently converted).
    val roundOpt: Option[Int] =
      try sys.env.get("SPARK_GRAFT_BENCH_ROUND").map(_.toInt)
        .orElse {
          val v = new java.io.File("VERDICT.md")
          if (!v.exists()) None
          else "Round\\s+(\\d+)".r
            .findFirstMatchIn(new String(java.nio.file.Files.readAllBytes(v.toPath)))
            .map(_.group(1).toInt + 1)
        }
      catch {
        case e: Throwable =>
          System.err.println(s"BENCH-WARN round derivation failed: $e")
          None
      }
    val (deltas: String, prevSteadyTotal: Option[Double]) =
      if (roundOpt.isEmpty) ("{}", None) else try {
      val currentRound: Int = roundOpt.get
      val dir = new java.io.File(".")
      // Candidate prior payloads: the driver's BENCH_r{M}.json artifacts
      // (historically tail-truncated to ~2000 chars, so they may carry
      // only a dozen scrapable entries) AND our own full committed copies
      // BENCH_FULL_r{M}.json (written below each round — complete by
      // construction). Among all PRIOR-round candidates take the one
      // with the MOST scraped entries (ties to the newest round): the
      // r13 artifact chain showed "first non-empty parse" collapsing
      // delta coverage to 12/170 because a truncated file parsed
      // non-empty and won over a complete older payload.
      // BENCH_LAST.json (the previous run's full file belt) rides along
      // as a round-unknown candidate: until the first BENCH_FULL_r{N}
      // exists it is the ONLY complete prior payload on disk (the
      // driver's BENCH_r{M}.json artifacts are tail-truncated), so it
      // rescues delta coverage for this transition round. Ranked below
      // any equal-coverage numbered file by the round tie-break, and it
      // is overwritten only after the scrape reads it, so the comparison
      // is always against the PREVIOUS run.
      // A same-round BENCH_LAST (this round's own earlier run — a retry
      // or a local measurement) must NOT serve as "prior": comparing a
      // round to itself reports ~0 deltas and masks regressions. The
      // payload's own "round" field (written below) makes that
      // detectable; a legacy payload without the field is accepted.
      def lastIsPrior(f: java.io.File): Boolean =
        try {
          val raw = new String(java.nio.file.Files.readAllBytes(f.toPath))
          "\"round\":(\\d+)".r.findFirstMatchIn(raw)
            .forall(_.group(1).toInt < currentRound)
        } catch { case _: Throwable => false }
      val prevFiles = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.matches("BENCH(_FULL)?_r\\d+\\.json"))
        .filter(f => "\\d+".r.findFirstIn(f.getName).get.toInt < currentRound) ++
        Option(new java.io.File("BENCH_LAST.json"))
          .filter(f => f.exists() && lastIsPrior(f))
      val candidates = prevFiles.map { f =>
        val raw = new String(java.nio.file.Files.readAllBytes(f.toPath))
        // Truncate at the prev payload's own delta blocks: otherwise the
        // LAST "name":number occurrence IS last round's delta and the
        // scrape would feed on its own output from round N+1 onward.
        // Cut at the FIRST of deltas_vs_prev (full payload), n_deltas /
        // deltas_top_abs (compact tail line — its abs-valued pairs would
        // scrape as prev times if a compact artifact ever won selection,
        // e.g. on a fresh clone with no BENCH_FULL/BENCH_LAST).
        val text = Seq("deltas_vs_prev", "n_deltas", "deltas_top_abs")
          .map(raw.indexOf).filter(_ >= 0)
          .reduceOption(_ min _) match {
            case None    => raw
            case Some(i) => raw.substring(0, i)
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
        val round = "\\d+".r.findFirstIn(f.getName).map(_.toInt).getOrElse(-1)
        // The prior window's headline, for the host-suspect inflation
        // signal below (same escaped-quote tolerance as the entries).
        val prevTotal = "\\\\?\"steady_total\\\\?\":([0-9.eE+-]+)".r
          .findFirstMatchIn(text).map(_.group(1).toDouble)
        // A prior that flagged ITSELF degraded must not serve as the
        // inflation/drift baseline while any healthy prior exists: the
        // r20 bank run compared against a suspect 610 s BENCH_LAST (it
        // had 2 more entries than the healthy close) and a ~1.5x-drifted
        // window sailed through both detectors unflagged.
        val wasSuspect = "\\\\?\"host_suspect\\\\?\":true".r
          .findFirstIn(text).isDefined
        (entries, round, prevTotal, wasSuspect)
      }
      candidates.sortBy { case (e, r, _, suspect) => (suspect, -e.size, -r) }
        .headOption.filter(_._1.nonEmpty)
        .map { case (e, _, pt, _) => (e.mkString("{", ",", "}"), pt) }
        .getOrElse(("{}", None))
    } catch {
      case e: Throwable =>
        System.err.println(s"BENCH-WARN delta scrape failed: $e")
        ("{}", None)
    }
    val deltaPairsAll = "\\\"([^\\\"]+)\\\":(-?[0-9.]+)".r
      .findAllMatchIn(deltas)
      .map(m => m.group(1) -> m.group(2).toDouble).toSeq
    // Self-adjudicating host flag (see hostSuspect): reps >= 2 gives the
    // backwards signal; a prior payload + deltas gives the inflation one.
    val (suspect, suspectQs) = hostSuspect(
      results.map(r => (r._1, r._2, r._3)), steadyTotal,
      prevSteadyTotal, deltaPairsAll.map(_._2))
    val drift = hostDrift(steadyTotal, prevSteadyTotal,
      deltaPairsAll.map(_._2))
    val suspectField = s""""host_suspect":$suspect,"host_drift":$drift,""" +
      s""""host_suspect_queries":""" +
      suspectQs.take(8).map("\"" + _ + "\"").mkString("[", ",", "]") + ","
    val roundField = roundOpt.map(r => s""""round":$r,""").getOrElse("")
    val line = s"""{"metric":"total","value":$total,"unit":"sec",$roundField""" +
      s""""queries":$qs,""" +
      s""""queries_steady":$steady,"steady_total":$steadyTotal,""" +
      s""""reps":$reps,"errors":$errs,"sf":"$sfDir",$suspectField""" +
      s""""deltas_vs_prev":$deltas}"""
    // COMPACT tail line: the driver's artifact keeps only a ~2000-char
    // stdout tail, and the full per-query payload left that budget rounds
    // ago (BENCH_r13.json arrived with its head truncated — unparseable).
    // The bare LAST line therefore carries the headline numbers plus
    // bounded top-K maps only, and points at the two full-payload belts
    // (BENCH_LAST.json + the committed BENCH_FULL_r{N}.json) for the rest.
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def topMap(xs: Seq[(String, Double)], k: Int) =
      xs.sortBy(-_._2).take(k)
        .map { case (n, v) => s""""$n":${fmt(v)}""" }.mkString("{", ",", "}")
    val fullName = roundOpt.map(r => s"BENCH_FULL_r$r.json")
    val compact = s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""steady_total":${fmt(steadyTotal)},"reps":$reps,""" +
      s""""n_queries":${results.size},""" +
      s""""n_errors":${results.count(_._4.isDefined)},"errors":$errs,""" +
      s""""sf":"$sfDir","full_payload":"${fullName.getOrElse("BENCH_LAST.json")}",""" +
      s"""$suspectField""" +
      s""""queries":${topMap(results.map(r => r._1 -> r._2), 12)},""" +
      s""""queries_steady_top":${topMap(results.map(r => r._1 -> r._3), 12)},""" +
      s""""n_deltas":${deltaPairsAll.size},""" +
      s""""deltas_top_abs":${topMap(deltaPairsAll.map { case (n, v) => n -> math.abs(v) }, 8)}}"""
    // Files are written BEFORE spark.stop(): the file belt must not
    // depend on a clean shutdown (a wedged or throwing stop() would
    // otherwise lose both channels). BENCH_FULL_r{N}.json is the
    // committed-per-round complete payload the NEXT round's delta scrape
    // prefers — the driver's own artifact can never serve that role
    // again once tail-truncated.
    try {
      // Both belts route through the suspect guard: a degraded window
      // never clobbers a healthy on-disk prior (see fullPayloadTarget).
      def write(name: String): Unit = {
        val p = java.nio.file.Paths.get(name)
        val existing =
          if (java.nio.file.Files.exists(p))
            try Some(java.nio.file.Files.readString(p))
            catch { case _: Throwable => None }
          else None
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(
            fullPayloadTarget(name, existing, suspect, s"_c$cpus")),
          line + "\n")
      }
      // SPARK_GRAFT_BELT=off disables BOTH file belts for mid-round
      // smoke runs (the r17 judge tripped the unconditional overwrite
      // and had to restore from git): the stdout channels still carry
      // the full payload, so a smoke run loses nothing except the
      // on-disk clobber hazard. Round-close runs leave it unset.
      // A SPARK_GRAFT_QUERIES subset run skips the belts UNCONDITIONALLY:
      // a partial board's totals are meaningless as a belt, and the
      // suspect guard can't catch the clobber (a subset total is FASTER
      // than the healthy prior, not slower) — asking operators to pair
      // the two env vars was advisory-only and exactly the r17 incident.
      if (!sys.env.get("SPARK_GRAFT_BELT").contains("off") &&
          subset.isEmpty) {
        write("BENCH_LAST.json")
        fullName.foreach(write)
      }
    } catch { case _: Throwable => () }
    spark.stop()
    // Stdout channels + the file belts: the compact line LAST (kept at
    // the very tail so the driver's truncated capture parses whole), and
    // the greppable full "BENCH-JSON: " marker copy above it for parsers
    // that scan by marker instead of position. The full payload is
    // printed ONCE (marker form only) — the former bare full line would
    // double-match substring-grep consumers and can't survive the tail
    // budget anyway. stdout line order: BENCH-JSON full, then compact.
    println("BENCH-JSON: " + line)
    println(compact)
  }
}
