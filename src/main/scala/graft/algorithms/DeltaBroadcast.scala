package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The incremental/CDC composes' COUNT-GUARDED broadcast hint.
  *
  * Delta frames (canonical removals, truly-new edges, oriented fanout
  * seeds) ride stats-free checkpoint leaves that Catalyst sizes at
  * `defaultSizeInBytes` and refuses to auto-broadcast, so the composes
  * hint `broadcast()` explicitly (r19 optimization round). But
  * delta-boundedness is an API contract, not code: a bulk deletion batch
  * (a domain takedown at 100 TB) handed to the same entry point must
  * degrade to the shuffle join, not OOM the executors building a giant
  * broadcast relation (r19 verdict). The guard compares the frame's KNOWN
  * row count — captured from the materialization its eager checkpoint
  * already paid for, never a fresh count job — against
  * [[graft.GraftConf.deltaBroadcastRowCap]]; above the cap the hint is
  * withheld and the stats-free leaf keeps the planner on the shuffle
  * strategies.
  */
private[graft] object DeltaBroadcast {
  def hintIfBounded(df: DataFrame, rows: Long): DataFrame =
    if (rows <= graft.GraftConf.deltaBroadcastRowCap(df.sparkSession))
      broadcast(df)
    else df
}
