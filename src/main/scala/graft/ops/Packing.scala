package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftFunctions

/** Deterministic sequence packing — the batch-shaping step between a
  * cleaned corpus and a training run: documents are laid head-to-tail
  * per source and cut into fixed token-budget bins (training
  * sequences).
  *
  * Assignment is OFFSET-BASED: a document belongs to the bin its start
  * offset falls in (`bin = cum_tokens_before div budget`), so the
  * mapping is a pure function of the ordered corpus — stable across
  * runs, partitionings, and engines — unlike first-fit/best-fit
  * packing whose output depends on mutable bin state and visit order.
  * A document may straddle a bin boundary (the trainer's
  * concat-then-chunk view handles the spill, exactly as an LLM data
  * loader concatenates documents and slices fixed-length windows).
  */
object Packing {

  /** Default token budget per bin (training-sequence length). Mirrored
    * in the DuckDB oracle.
    */
  val DefaultBudget = 256L

  /** One row per document: (doc_id, source, n_tokens, bin_id,
    * bin_offset), bins numbered per source in doc_id order.
    *
    * Shape (r9): a DISTRIBUTED PREFIX SUM, not a per-source ordered
    * window. The former `Window.partitionBy(source).orderBy(doc_id)`
    * coalesced each source onto ONE task — a mega-source (the normal
    * case: one crawl dominates a training mix) serialized the whole
    * pack on a single straggler. Now:
    *
    *   1. range-exchange on (source, doc_id) — a PARALLEL global sort
    *      whose sampling splits a mega-source across many partitions
    *      (explicit partition count so AQE cannot re-coalesce the two
    *      consumers onto different pid maps);
    *   2. per-(partition, source) token totals — a few rows per
    *      partition, map-side;
    *   3. per-source running offsets over PARTITION IDS — a
    *      #partitions × #sources-row window (driver-scale);
    *   4. within-partition running sums (every window group bounded by
    *      the range partition size, independent of source skew) + the
    *      broadcast offsets.
    *
    * `cum_before` is a pure function of the global (source, doc_id)
    * order, so the output is identical to the single-window form — and
    * to the oracle — under ANY partition boundaries.
    *
    * The ranged frame is MATERIALIZED before fan-out: range boundaries
    * are sampled per exchange execution (seeded by RDD id), so `__pid`
    * is only meaningful within one execution — two independent
    * computations of the same subtree can disagree on the pid map and
    * silently mis-join the offsets (caught by the 1M-doc smoke rung,
    * not by small specs: tiny inputs land identical boundaries by
    * luck). The cached result is the single source both consumers
    * read; the returned frame is the cache scope
    * ([[graft.ops.Caching.materialized]] — CacheLifecycleSpec
    * contract), with the usual eviction caveat: on a fault-prone
    * cluster replace the cache with a reliable checkpoint.
    */
  def packSequences(docs: DataFrame, budget: Long = DefaultBudget): DataFrame =
    packCounts(docs.select(col("doc_id"), col("source"),
      size(GraftFunctions.tokens(col("text"))).cast("long").as("n_tokens")), budget)

  /** [[packSequences]] over a PRE-COUNTED (doc_id, source, n_tokens)
    * frame — the entry point for packing under a learned tokenizer
    * ([[graft.text.Bpe.tokenCounts]]): the budget arithmetic does not
    * care where the counts came from, so whitespace packing and BPE
    * packing share one prefix-sum implementation.
    */
  def packCounts(counted: DataFrame, budget: Long = DefaultBudget): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val nPart = counted.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = counted
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .repartitionByRange(nPart, col("source"), col("doc_id"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-source mass of every EARLIER range partition: tiny frame,
    // its window runs over partition ids, never document rows
    val wOff = Window.partitionBy(col("source")).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"), col("source"))
      .agg(sum(col("n_tokens")).as("__psum"))
      .withColumn("__offset", coalesce(sum(col("__psum")).over(wOff), lit(0L)))
      .select(col("__pid"), col("source"), col("__offset"))
    val wIn = Window.partitionBy(col("__pid"), col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = ranged
      .withColumn("__cum_in", coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .join(broadcast(offsets), Seq("__pid", "source"))
      .withColumn("cum_before", col("__cum_in") + col("__offset"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"cum_before div $budget").as("bin_id"),
        (col("cum_before") % budget).as("bin_offset"))
    Caching.materialized(out) { ranged.unpersist(false) }
  }
}
