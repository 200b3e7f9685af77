package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench payload's self-adjudication machinery — pure logic, no
  * SparkSession: the degraded-host detector (rounds 4/5/13/14 each needed
  * a manual judge call on these exact signals) and its thresholds.
  */
class BenchSpec extends AnyFunSuite {

  private def healthy(n: Int): Seq[(String, Double, Double)] =
    (1 to n).map(i => (s"q$i", 2.0, 1.5))

  test("hostSuspect: healthy window (steady <= single, flat deltas) is not flagged") {
    val (s, qs) = Bench.hostSuspect(healthy(100), steadyTotal = 150.0,
      prevSteadyTotal = Some(140.0), deltas = Seq.fill(100)(0.1))
    assert(!s && qs.isEmpty)
  }

  test("hostSuspect: K backwards queries (steady >> own single-shot) trip the flag") {
    // The r14 artifact shape: q15b 4.5 -> 29.0, g10b 14.7 -> 19.2, etc.
    val backwards = Seq(
      ("q15b", 4.5, 29.0), ("g10b", 14.7, 19.2), ("s10", 3.0, 13.1),
      ("s14", 3.1, 12.9), ("s13", 1.2, 11.6))
    val (s, qs) = Bench.hostSuspect(healthy(95) ++ backwards,
      steadyTotal = 200.0, prevSteadyTotal = None, deltas = Nil)
    assert(s, "five backwards queries must flag the window")
    // Worst (largest steady - single) first, and only the offenders named.
    assert(qs.head == "q15b" && qs.toSet ==
      Set("q15b", "g10b", "s10", "s14", "s13"))
  }

  test("hostSuspect: four backwards queries stay under the K=5 floor") {
    val backwards = Seq(("a", 2.0, 9.0), ("b", 2.0, 9.0),
      ("c", 2.0, 9.0), ("d", 2.0, 9.0))
    val (s, _) = Bench.hostSuspect(healthy(96) ++ backwards,
      steadyTotal = 180.0, prevSteadyTotal = None, deltas = Nil)
    assert(!s)
  }

  test("hostSuspect: backwards needs BOTH the 1.25x ratio and the 1s margin") {
    // Sub-second moves and sub-ratio moves are warm-cache noise, not a
    // starved host — even many of them.
    val noise = (1 to 50).map(i => (s"n$i", 0.4, 0.9)) ++   // >1.25x, <1s
      (1 to 50).map(i => (s"m$i", 10.0, 12.0))              // >1s, <1.25x
    val (s, qs) = Bench.hostSuspect(noise, 300.0, None, Nil)
    assert(!s && qs.isEmpty)
  }

  test("hostSuspect: broad uniform inflation vs the prior payload trips the flag") {
    // steady_total 1.6x prior, 90% of deltas positive — the r4/r5/r13
    // artifact shape (every family slower, no plan changed).
    val deltas = Seq.fill(90)(0.8) ++ Seq.fill(10)(-0.1)
    val (s, qs) = Bench.hostSuspect(healthy(100), steadyTotal = 320.0,
      prevSteadyTotal = Some(200.0), deltas = deltas)
    assert(s, "1.6x inflation with 90% positive deltas must flag")
    assert(qs.isEmpty, "inflation names no individual queries")
  }

  test("hostSuspect: real regressions (few queries moved) do not trip inflation") {
    // 1.6x total but only 30% of deltas positive: specific queries moved —
    // that is a regression to investigate, not a degraded window.
    val deltas = Seq.fill(30)(4.0) ++ Seq.fill(70)(-0.05)
    val (s, _) = Bench.hostSuspect(healthy(100), steadyTotal = 320.0,
      prevSteadyTotal = Some(200.0), deltas = deltas)
    assert(!s)
  }

  test("hostSuspect: inflation under 1.5x stays quiet even with positive deltas") {
    val (s, _) = Bench.hostSuspect(healthy(100), steadyTotal = 280.0,
      prevSteadyTotal = Some(200.0), deltas = Seq.fill(100)(0.8))
    assert(!s)
  }

  // ---- host_drift (r16 verdict task 4): the informational band under
  // the inflated bar — six rounds of ~1.2x same-code windows needed
  // manual adjudication; now the payload names them itself.

  test("hostDrift: the r16 window shape (1.19x, broadly positive) is named") {
    // 348.1 s driver artifact over the 292.0 s prior, most deltas up.
    val deltas = Seq.fill(180)(0.25) ++ Seq.fill(50)(-0.05)
    assert(Bench.hostDrift(348.1, Some(292.0), deltas))
    // ... without tripping the blocking flag at that ratio.
    val (s, _) = Bench.hostSuspect(healthy(230), steadyTotal = 348.1,
      prevSteadyTotal = Some(292.0), deltas = deltas)
    assert(!s)
  }

  test("hostDrift: under 1.15x, or without broad positivity, stays quiet") {
    val broadlyUp = Seq.fill(80)(0.2) ++ Seq.fill(20)(-0.1)
    assert(!Bench.hostDrift(220.0, Some(200.0), broadlyUp), "1.10x ratio")
    val mixed = Seq.fill(50)(0.4) ++ Seq.fill(50)(-0.1)
    assert(!Bench.hostDrift(250.0, Some(200.0), mixed), "50% positive")
    assert(!Bench.hostDrift(250.0, None, broadlyUp), "no prior")
    assert(!Bench.hostDrift(250.0, Some(200.0), Nil), "no deltas")
  }

  // ---- belt-file guard (r15 verdict task 5): a suspect payload must not
  // overwrite a healthy same-name belt; every other combination writes to
  // the default name.
  private val healthyPayload =
    Some("""{"steady_total":209.0,"host_suspect":false,"queries":{}}""")
  private val suspectPayload =
    Some("""{"steady_total":362.1,"host_suspect":true,"queries":{}}""")

  test("fullPayloadTarget: suspect payload diverts when the on-disk belt is healthy") {
    assert(Bench.fullPayloadTarget("BENCH_FULL_r16.json", healthyPayload,
      newSuspect = true) === "BENCH_FULL_r16_suspect.json")
    assert(Bench.fullPayloadTarget("BENCH_LAST.json", healthyPayload,
      newSuspect = true) === "BENCH_LAST_suspect.json")
  }

  test("fullPayloadTarget: cpu-suffixed diverts don't clobber each other") {
    // r19 verdict: the driver's c8 re-run overwrote the c32 suspect payload
    // (same divert name). With the core count in the suffix the two windows
    // land in distinct files; healthy payloads still take the default name.
    assert(Bench.fullPayloadTarget("BENCH_FULL_r20.json", healthyPayload,
      newSuspect = true, suffix = "_c32") === "BENCH_FULL_r20_suspect_c32.json")
    assert(Bench.fullPayloadTarget("BENCH_FULL_r20.json", healthyPayload,
      newSuspect = true, suffix = "_c8") === "BENCH_FULL_r20_suspect_c8.json")
    assert(Bench.fullPayloadTarget("BENCH_FULL_r20.json", healthyPayload,
      newSuspect = false, suffix = "_c8") === "BENCH_FULL_r20.json")
  }

  test("fullPayloadTarget: healthy payloads always take the default name") {
    // Newer healthy over older healthy (same-code re-runs are the more
    // current prior), healthy over suspect, healthy over nothing.
    for (existing <- Seq(healthyPayload, suspectPayload, None))
      assert(Bench.fullPayloadTarget("BENCH_FULL_r16.json", existing,
        newSuspect = false) === "BENCH_FULL_r16.json", s"existing=$existing")
  }

  test("fullPayloadTarget: suspect payload may overwrite a suspect or absent belt") {
    // Nothing healthy to protect: the suspect window is still the best
    // (only) record of the round.
    assert(Bench.fullPayloadTarget("BENCH_FULL_r16.json", suspectPayload,
      newSuspect = true) === "BENCH_FULL_r16.json")
    assert(Bench.fullPayloadTarget("BENCH_FULL_r16.json", None,
      newSuspect = true) === "BENCH_FULL_r16.json")
  }
}
