package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** End-to-end corpus cleaning — the composition a training-data
  * pipeline actually runs: per-document signals (quality score, exact-
  * duplicate keep flag, near-dup cluster keep flag) computed
  * independently over the corpus and combined into one keep decision.
  *
  * Signals are policy-combinable flags rather than sequential filters,
  * so each stage remains individually auditable (every document carries
  * all its reasons) and the three stages can run concurrently over the
  * same scan at 100 TB instead of serializing on each other's output.
  */
object Pipeline {

  /** Per-document cleaning decision:
    * (doc_id, quality_score, exact_keep, cluster_id, cluster_keep,
    * keep) where `keep = quality_score ≥ minQuality ∧ exact_keep ∧
    * cluster_keep`. The near-dup stage reuses the MinHash-LSH cluster
    * labels, so `cluster_keep` retains exactly one representative (the
    * min doc_id) per near-dup component.
    */
  def cleanCorpus(docs: DataFrame, minQuality: Double = 0.3,
      minJaccard: Double = 0.7): DataFrame = {
    // ONE corpus scan + ONE tokenize pass, cached: every stage's
    // withToks trusts the precomputed `toks` column instead of
    // re-reading the source and re-running the tokenizer (the honest
    // version of the "stages share one scan" claim above)
    val toked = docs.withColumn("toks", graft.GraftFunctions.tokens(col("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = TextAnalysis.quality(toked).select(col("doc_id"), col("quality_score"))
    val ex = Dedup.exact(toked).select(col("doc_id"), col("keep").as("exact_keep"))
    val clRaw = Dedup.nearDupClusters(toked, minJaccard) // owns its cache scope
    val cl = clRaw
      .select(col("doc_id"), col("cluster_id"), col("keep").as("cluster_keep"))
    Caching.materialized(
      q.join(ex, Seq("doc_id")).join(cl, Seq("doc_id"))
        .select(col("doc_id"), col("quality_score"), col("exact_keep"),
          col("cluster_id"), col("cluster_keep"),
          (col("quality_score") >= minQuality && col("exact_keep") && col("cluster_keep"))
            .as("keep"))
        .orderBy(col("doc_id"))) {
      clRaw.unpersist(false); toked.unpersist(false)
    }
  }
}
