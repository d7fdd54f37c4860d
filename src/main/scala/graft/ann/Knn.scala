package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftFunctions.cosine_sim

/** Exact cosine k-NN — the brute-force baseline every ANN variant is
  * recalled against, and the standalone form of the reference's rerank
  * primitive (lshrs/utils/similarity.py:93 top_k_cosine).
  *
  * Scale notes: the query side is broadcast (batch ANN serving at
  * 100 TB keeps query batches ≤ O(10⁴) rows); the corpus streams
  * through the codegen'd cosine without shuffling, and only
  * (corpus × queries) score rows enter the top-k shuffle. For corpus-×-
  * corpus self-joins use the LSH/IVF variants instead.
  */
object Knn {

  /** Top-k cosine neighbors per query vector (excluding self-matches
    * by id). Output: (q_id, rn, cand_id, sim).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("cand_id"), cosine_sim(col("q_emb"), col("cand_emb")).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("cand_id"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("cand_id"), col("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Embedding near-dup detection: nearest neighbor per vector plus a
    * duplicate flag at the given cosine threshold.
    */
  def nearestNeighborDedup(corpus: DataFrame, threshold: Double = 0.95): DataFrame =
    cosineTopK(corpus, corpus, 1)
      .select(
        col("q_id").as("vec_id"), col("cand_id").as("nn_id"), col("sim"),
        (col("sim") >= threshold).as("is_dup"))
      .orderBy(col("vec_id"))
}
