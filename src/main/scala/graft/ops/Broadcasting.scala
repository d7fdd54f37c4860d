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

  /** True when a frame DERIVED from `df` — `fanout` rows per `df` row,
    * `bytesPerRow` each — fits the broadcast threshold. The guard for
    * batch-bounded sides whose own estimates pass through aggregates
    * and are meaningless (survivor pair-lists, ADC tables, probe
    * fan-outs): bound them from the SOURCE frame's stats instead.
    * Rows use CBO `rowCount` when present, else `sizeInBytes` over the
    * schema's `defaultSize` width — `defaultSize` UNDERSTATES
    * variable-width columns (an array reports one element), which
    * OVERSTATES rows and keeps the guard conservative.
    */
  def fitsBroadcastRows(df: DataFrame, fanout: Long, bytesPerRow: Long): Boolean = {
    val threshold = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return false
    // rows the threshold can afford at this fan-out
    val maxRows = BigInt(threshold) / (BigInt(fanout) * BigInt(math.max(1L, bytesPerRow)))
    if (maxRows <= 0) return false
    val stats = df.queryExecution.optimizedPlan.stats
    val rowW = math.max(1, df.schema.map(_.dataType.defaultSize).sum)
    val est = stats.rowCount.getOrElse(stats.sizeInBytes / rowW + 1)
    if (est <= maxRows) true
    else if (stats.rowCount.isDefined) false // CBO count is exact — trust it
    else {
      // The sizeInBytes-derived estimate said "too big", but on
      // filter-derived frames that estimate ignores selectivity and can
      // overstate rows by orders of magnitude — multiplied by the
      // fan-out it silently demotes genuinely tiny serving batches to
      // sort-merge joins (round-8 verdict: ann_pq exec 0.8 → 4.6 s).
      // Settle it with a LIMIT-bounded runtime count: the limit is
      // maxRows+1 — small by construction (threshold / fan-out bytes),
      // so the job early-exits after a handful of rows on big frames
      // and costs one cheap scan on batch frames. Serving flows already
      // pay per-batch jobs; a bounded count is noise next to a wrongly
      // shuffled corpus.
      val cap = maxRows.min(BigInt(Int.MaxValue) - 1).toInt
      df.limit(cap + 1).count() <= cap.toLong
    }
  }
}
