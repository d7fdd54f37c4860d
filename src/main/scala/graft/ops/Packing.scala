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
    * Shape: one token-count projection (map-side), then ONE shuffle —
    * the per-source ordered window for the running total. At 100 TB
    * the window partitions by source (coarse); for a skewed mega-source
    * pre-split the key (e.g. source × doc_id range) and renumber bins
    * by adding per-range bin-count prefix sums — same offsets, two
    * cheap passes.
    */
  def packSequences(docs: DataFrame, budget: Long = DefaultBudget): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), col("source"),
        size(GraftFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_before",
        coalesce(
          sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"cum_before div $budget").as("bin_id"),
        (col("cum_before") % budget).as("bin_offset"))
      .orderBy(col("source"), col("doc_id"))
  }
}
