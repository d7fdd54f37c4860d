package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftFunctions.{cosine_sim, top_k_by_score}

/** Prototype-based semantic data pruning (SSL prototypes — Sorscher
  * et al. NeurIPS 2022 "Beyond neural scaling laws"; the second stage
  * of D4, Tirumala et al. 2023): cluster the embedding space, rank
  * each cluster's members by similarity to their own centroid, and
  * prune the most PROTOTYPICAL points — near-centroid examples are
  * the redundant "easy" mass; the far-from-centroid tail carries the
  * information. The complement of [[Knn.semanticDedup]] (which removes
  * pairwise near-duplicates): prototype pruning thins dense cluster
  * cores even when no individual pair is near-identical.
  *
  * Scale shape (100 TB of vectors): cell assignment is the
  * [[Ivf.assign]] idiom — broadcast centroids, per-vector argmax as a
  * `max(struct)` PARTIAL aggregation (map-side; the corpus × nCells
  * scored rows never shuffle). The per-cell prototype rank is a
  * bounded [[graft.expressions.TopKByScore]] aggregate (≤ k rows per
  * cell per partition pre-exchange — no window, no per-cell sort), and
  * the ≤ nCells·k winners broadcast back for the flag join. One real
  * shuffle (the argmax exchange) end to end.
  */
object Prune {

  /** Per-vector prototype ranking against a deterministic centroid
    * table: (vec_id, cell, cent_sim, prune_rank, pruned) — `pruned`
    * marks the k most-prototypical members of each cell (highest
    * cosine to the cell centroid, ties to the smaller vec_id).
    */
  def prototypePrune(corpus: DataFrame, centroids: DataFrame, k: Int): DataFrame = {
    val c = centroids.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val asg = corpus
      .crossJoin(graft.ops.Broadcasting.maybeBroadcast(c, Some(true)))
      .select(col("vec_id"), col("c_id"),
        cosine_sim(col("embedding"), col("c_emb")).as("c_sim"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("c_sim"), (-col("c_id")).as("neg_id"),
        col("c_id"))).as("m"))
      .select(col("vec_id"), col("m.c_id").as("cell"), col("m.c_sim").as("cent_sim"))
    val prototypes = asg
      .groupBy(col("cell"))
      .agg(top_k_by_score(col("cent_sim"), col("vec_id"), k).as("top"))
      .select(col("cell"), posexplode(col("top.id")).as(Seq("pos", "vec_id")))
      .select(col("cell"), col("vec_id"), (col("pos") + 1).cast("long").as("prune_rank"))
    asg.join(broadcast(prototypes), Seq("cell", "vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("cent_sim"), col("prune_rank"),
        col("prune_rank").isNotNull.as("pruned"))
  }
}
