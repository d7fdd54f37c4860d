package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Guarded broadcast hints (round-1 verdict item #3).
  *
  * An unconditional `broadcast()` on a "small" side is an OOM grenade the
  * first time a caller feeds a corpus-sized table where a serving batch
  * was expected (e.g. `cosineTopK(corpus, corpus, k)`). The guard keeps
  * the hint only when the caller forces it or when the optimizer's size
  * estimate fits the session's `autoBroadcastJoinThreshold` — otherwise
  * the join degrades to a shuffle/cartesian plan that spills instead of
  * OOMing, and AQE may still upgrade it at runtime from exact sizes.
  */
object Broadcasting {

  /** Optimizer size estimate of `df` in bytes (no job is run). Parquet
    * relations report file sizes; local relations report row estimates.
    */
  def sizeEstimate(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** True when `df`'s size estimate fits the session broadcast
    * threshold (threshold ≤ 0 disables auto-broadcast entirely).
    */
  def fitsBroadcast(df: DataFrame): Boolean = {
    val threshold = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    threshold > 0 && sizeEstimate(df) <= BigInt(threshold)
  }

  /** Apply a broadcast hint per `force`: Some(true) always hints,
    * Some(false) never hints, None hints only when [[fitsBroadcast]].
    */
  def maybeBroadcast(df: DataFrame, force: Option[Boolean] = None): DataFrame =
    if (force.getOrElse(fitsBroadcast(df))) broadcast(df) else df
}
