package graft.util

/** Dev-only wall-clock phase attribution, shared by the operators whose
  * cost is spread across many small driver actions (the foreachBatch
  * maintenance loops, the incremental graph composes): with
  * `GRAFT_PHASE_TIMING` set each `phase("name") { ... }` prints its wall
  * millis to stderr; otherwise it is a bare closure call. Profiling
  * instrumentation only — never load-bearing.
  */
object PhaseTiming {
  val enabled: Boolean = sys.env.contains("GRAFT_PHASE_TIMING")

  def phase[T](name: String)(f: => T): T =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"GRAFT-PHASE $name ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      r
    }
}
