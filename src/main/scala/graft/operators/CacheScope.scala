package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped caching for operators whose plans scan an intermediate frame more
  * than once (self-joined shingle/signature/embedding frames).
  *
  * Persisting those frames is mandatory — without it the expensive map stage
  * runs once per scan — but a bare `persist` leaks: the operator returns a
  * lazy DataFrame, the caller evaluates it at an unknown later time, and
  * nobody is left holding the cache references. On a long-lived session each
  * dedup call then permanently pins its intermediates in executor storage
  * (observed as an across-the-board bench slowdown once enough calls
  * accumulate).
  *
  * `CacheScope.scoped` fixes the lifecycle: the body registers intermediates
  * with `scope.cache`, the RESULT is eagerly materialized (local checkpoint
  * — results here are candidate/pair sets, orders of magnitude smaller than
  * the corpus-sized intermediates), and every registered cache is released
  * in a `finally` before the result is returned. The caller gets a
  * self-contained frame backed by its own checkpoint blocks and zero
  * residual cache entries. Total work is unchanged: the evaluation the
  * caller would have triggered simply happens inside the scope.
  */
private[graft] object CacheScope {

  /** DEV-ONLY plan-audit hook: when set, [[scoped]] hands the PRE-
    * materialization frame to it before the eager checkpoint runs. The
    * checkpoint otherwise hides the operator's real plan from probes —
    * explaining the RETURNED frame shows one `Scan ExistingRDD` (the r19
    * g28 plan-dump gap: the committed "after" file proved nothing about
    * the join strategies). `ExplainProbe` installs a formatted-explain
    * printer here; Bench/Verify never touch it (one volatile None read
    * per scoped call — not on any per-row path).
    */
  @volatile private[graft] var preMaterializeHook: Option[DataFrame => Unit] =
    None

  final class Scope private[CacheScope] () {
    private val cached = scala.collection.mutable.Buffer.empty[DataFrame]

    /** Persist `df` (MEMORY_AND_DISK) for the lifetime of the scope. */
    def cache(df: DataFrame): DataFrame = {
      cached += df
      df.persist(StorageLevel.MEMORY_AND_DISK)
    }

    private[CacheScope] def releaseAll(): Unit =
      cached.foreach(_.unpersist(blocking = false))
  }

  /** Build a result frame with scoped caches; returns it eagerly
    * materialized, with every scoped cache released.
    */
  def scoped(build: Scope => DataFrame): DataFrame = {
    val scope = new Scope
    try {
      val built = build(scope)
      preMaterializeHook.foreach(_(built))
      built.localCheckpoint(true)
    } finally scope.releaseAll()
  }

  /** Scoped caches around a DRIVER-MATERIALIZED computation (collected
    * arrays, counts): the body's result must not lazily reference the
    * scoped frames, which are released on return.
    */
  def scopedValue[T](build: Scope => T): T = {
    val scope = new Scope
    try build(scope)
    finally scope.releaseAll()
  }
}
