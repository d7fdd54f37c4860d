package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared final-ranking step of every ANN/serving operator: scored
  * (q_id, cand_id, score) rows → bounded
  * [[graft.expressions.TopKByScore]] aggregate per query → exploded
  * (q_id, rn, cand_id, score) rows ordered (q_id, rn). One definition
  * so the output contract (rn type, (score desc, id asc) tie-break,
  * total ordering) cannot drift across the six operators that share it
  * (Knn.cosineTopK, Quantize.quantizedTopK/binaryTopK, Pq.pqTopK,
  * Ivf.probeTopKOnIndex, TextAnalysis.hashEmbedTopK).
  */
object TopK {

  /** Rank `scored` (columns: q_id, cand_id, and `scoreCol`) to the
    * per-query top `k`, emitting the score back under `scoreCol`.
    */
  def rankByScore(scored: DataFrame, k: Int, scoreCol: String = "sim"): DataFrame =
    scored
      .groupBy(col("q_id"))
      .agg(graft.GraftFunctions.top_k_by_score(col(scoreCol), col("cand_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rn"),
        col("t.id").as("cand_id"), col("t.score").as(scoreCol))
      .orderBy(col("q_id"), col("rn"))

  /** The exact-cosine rerank tail shared by the prefilter ANN tiers:
    * join survivor (q_id, cand_id) pairs to query and corpus vectors,
    * score with the codegen cosine, [[rankByScore]] top-k.
    *
    * Join order: bare survivors against the corpus FIRST, then the
    * query vectors. Survivors are batch-bounded (≤ prefilterK ×
    * queries ids, no embeddings yet) but their size estimate passes
    * through aggregates and is meaningless, so the broadcast decision
    * is taken off the queries frame — when the batch fits, the corpus
    * streams with ZERO shuffle (the alternative sort-merge join
    * shuffles + sorts the full corpus to meet 10³-ish survivor rows;
    * measured seconds at the 500k smoke). A corpus-sized query batch
    * degrades to the shuffle join instead of an OOM.
    */
  def cosineRerank(survivors: DataFrame, corpus: DataFrame, queries: DataFrame,
      k: Int, broadcastQueries: Option[Boolean] = None,
      prefilterK: Option[Long] = None): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb"))
    val bcBatch = broadcastQueries.orElse(Some(Broadcasting.fitsBroadcast(q)))
    // survivors are ≤ prefilterK × |queries| rows — the queries frame
    // is a PROXY whose size understates them by the prefilterK fan-out
    // (ADVICE r7: prefilterK=100k × a modest batch dwarfs the frame
    // the proxy measured, and a forced broadcastQueries=Some(true)
    // used to extend to them unconditionally). When the caller supplies
    // prefilterK, bound the survivors side from the source stats —
    // even a forced broadcast is capped to the q/batch frames.
    val bcSurv = prefilterK match {
      case Some(pk) =>
        Some(bcBatch.contains(true) && Broadcasting.fitsBroadcastRows(q, pk, 32L))
      case None => bcBatch
    }
    rankByScore(
      Broadcasting.maybeBroadcast(survivors, bcSurv)
        .join(c, Seq("cand_id"))
        .join(Broadcasting.maybeBroadcast(q, bcBatch), Seq("q_id"))
        .select(col("q_id"), col("cand_id"),
          graft.GraftFunctions.cosine_sim(col("q_emb"), col("cand_emb")).as("sim")),
      k)
  }
}
