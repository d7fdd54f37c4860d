package graft.ann

import org.apache.spark.sql.DataFrame
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
    *
    * Uses the bounded [[graft.GraftFunctions.top_k_by_score]] aggregate
    * instead of a rank window: map-side partials cut the top-k shuffle
    * from (corpus × queries) rows to k rows per query per partition.
    *
    * `broadcastQueries`: None (default) broadcasts only when the query
    * side's size estimate fits the session broadcast threshold — a
    * corpus-sized query table (as in [[nearestNeighborDedup]]) falls
    * back to a non-broadcast cartesian plan instead of OOMing the
    * executors on the broadcast build.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      broadcastQueries: Option[Boolean] = None): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb"))
    val scored = c.crossJoin(graft.ops.Broadcasting.maybeBroadcast(q, broadcastQueries))
      .filter(col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("cand_id"), cosine_sim(col("q_emb"), col("cand_emb")).as("sim"))
    graft.ops.TopK.rankByScore(scored, k)
  }

  /** Embedding near-dup detection: nearest neighbor per vector plus a
    * duplicate flag at the given cosine threshold.
    */
  def nearestNeighborDedup(corpus: DataFrame, threshold: Double = 0.95): DataFrame =
    cosineTopK(corpus, corpus, 1)
      .select(
        col("q_id").as("vec_id"), col("cand_id").as("nn_id"), col("sim"),
        (col("sim") >= threshold).as("is_dup"))
    // unordered from the API (r12): gate rows sort, production doesn't
    // pay a global range exchange on a corpus-sized ledger

  /** k-NN majority-vote classification over a labeled corpus: each
    * query takes the label with the most votes among its k nearest
    * neighbors (ties → the label with the nearer best-ranked neighbor,
    * then the smaller label). Composes [[cosineTopK]] (bounded
    * TopKByScore shuffle) with two small keyed aggregations — the
    * vote argmax is a `max(struct)` partial aggregate, not a window.
    * Output: (q_id, pred_label, votes).
    */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int,
      broadcastQueries: Option[Boolean] = None): DataFrame =
    voteOnNeighbors(cosineTopK(corpus, queries, k, broadcastQueries), corpus)

  /** The majority-vote stage over ANY ranked neighbor frame
    * `(q_id, rn, cand_id, …)` — shared by the brute [[knnClassify]]
    * and the cell-pruned [[knnClassifyIvf]]: two small keyed
    * aggregations, the argmax a `max(struct)` partial aggregate, not
    * a window.
    */
  def voteOnNeighbors(nn: DataFrame, labeled: DataFrame): DataFrame = {
    val labels = labeled.select(col("vec_id").as("cand_id"), col("label").cast("long").as("label"))
    nn.join(labels, Seq("cand_id"))
      .groupBy(col("q_id"), col("label"))
      .agg(count(lit(1)).as("votes"), min(col("rn")).as("best_rn"))
      .groupBy(col("q_id"))
      .agg(max(struct(col("votes"), (-col("best_rn")).as("neg_rn"),
        (-col("label")).as("neg_label"), col("label"))).as("m"))
      .select(col("q_id"), col("m.label").as("pred_label"), col("m.votes").as("votes"))
      .orderBy(col("q_id"))
  }

  /** Cell-pruned k-NN classification: the [[knnClassify]] vote over
    * [[graft.ann.Ivf.probeTopK]] neighbors instead of a brute scan —
    * the serving-scale classifier (probed cells only; at 100 TB the
    * per-query cost is probe selectivity, not corpus size), with the
    * identical deterministic vote semantics.
    */
  def knnClassifyIvf(corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, nProbe: Int, k: Int,
      broadcastQueries: Option[Boolean] = None): DataFrame =
    voteOnNeighbors(
      graft.ann.Ivf.probeTopK(corpus, queries, centroids, nProbe, k, broadcastQueries),
      corpus)

  /** Scale path for embedding near-dup: LSH candidate pairs (corpus
    * never self-cross-joins) verified by exact cosine ≥ threshold.
    * The brute-force variant is O(n²) in comparisons; this is bounded
    * by bucket co-occurrence.
    */
  def lshNearDupPairs(corpus: DataFrame, p: graft.lsh.LshParams,
      threshold: Double = 0.6): DataFrame = {
    val cand = graft.lsh.LshIndex.candidatePairs(graft.lsh.LshIndex.build(corpus, p))
    val vecs = corpus.select(col("vec_id"), col("embedding"))
    cand
      .join(vecs.as("va"), col("a") === col("va.vec_id"))
      .join(vecs.as("vb"), col("b") === col("vb.vec_id"))
      .select(col("a"), col("b"), col("n_shared_bands"),
        cosine_sim(col("va.embedding"), col("vb.embedding")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023): partition
    * the embedding space into centroid cells, then drop every vector
    * with a more-senior (smaller-id) in-cell neighbor above the cosine
    * threshold. Near-identical documents land in the same cell with
    * overwhelming probability, so the quadratic comparison is confined
    * to each cell — n²/nCells at balanced cells instead of a corpus
    * self-join, and the cells come free from [[graft.ann.Ivf.assign]]'s
    * map-side argmax. Output one row per vector:
    * (vec_id, cell, is_dup, keep).
    *
    * Semantics: greedy min-id survivorship (the dedup family's keep
    * rule) — a vector is a duplicate iff some SMALLER vec_id sharing a
    * probed cell has cosine ≥ threshold with it; survivors are vectors
    * with no senior near-neighbor. Single-probe assignment misses
    * near-dups split by a cell boundary, so each vector probes its
    * top-`nProbe` cells ([[graft.ann.Ivf.assignProbes]]) and the
    * comparison runs within the union — comparisons grow ~nProbe² /
    * nCells per pair of probes but stay cell-confined (never a corpus
    * self-join); the reported `cell` is the primary (argmax) cell.
    * At 100 TB a skewed cell re-balances by splitting on a secondary
    * hash — the comparison stays in-cell either way.
    */
  def semanticDedup(corpus: DataFrame, centroids: DataFrame,
      threshold: Double = 0.95, nProbe: Int = 2): DataFrame = {
    val probed = Ivf.assignProbes(corpus, centroids, nProbe)
    val primary = probed.filter(col("probe_rank") === 1)
      .select(col("vec_id"), col("cell"))
    val e = corpus.select(col("vec_id"), col("embedding"))
      .join(probed.select(col("vec_id"), col("cell")), Seq("vec_id"))
    val dups = e.as("x").join(e.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .filter(cosine_sim(col("x.embedding"), col("y.embedding")) >= threshold)
      .select(col("y.vec_id").as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    primary.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"),
        (!coalesce(col("is_dup"), lit(false))).as("keep"))
  }

  /** Recall evaluation of an ANN result against an exact baseline —
    * the operational metric every approximate index is tuned by
    * (nProbe / prefilterK / band counts all trade recall for cost, and
    * production serving tracks it continuously). Per query:
    * (q_id, n_got, n_truth, n_common, recall = n_common / n_truth).
    * Both inputs are (q_id, cand_id, ...) top-k frames — bounded at
    * queries × k rows by construction, so the evaluation costs
    * nothing at any corpus scale; the division is one IEEE op over two
    * exact integers (cross-engine hash-exact).
    */
  /** Ranked-list evaluation — [[recallEval]]'s ORDER-aware sibling:
    * per query, the rank of the first true neighbor in the
    * approximate list (`first_hit_rank`) and its reciprocal (`mrr` —
    * the metric retrieval/serving stacks track alongside recall,
    * because a true neighbor at rank 1 and at rank k are different
    * user experiences at identical recall). Inputs are the usual
    * (q_id, rn, cand_id) top-k frames — queries×k-bounded, free at
    * any corpus scale; 1/rank is one IEEE division of exact integers
    * (hash-exact). Queries with no true neighbor in the list carry
    * null rank/mrr (not 0 — "never hit" and "hit at rank 10⁹" must
    * not compare equal).
    */
  def rankEval(got: DataFrame, truth: DataFrame): DataFrame = {
    val g = got.select(col("q_id"), col("rn"), col("cand_id"))
    val t = truth.select(col("q_id"), col("cand_id"))
    val hits = g.join(t, Seq("q_id", "cand_id"), "left_semi")
      .groupBy(col("q_id"))
      .agg(min(col("rn")).as("first_hit_rank"),
        count(lit(1)).as("n_common"))
    g.select(col("q_id")).distinct()
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        col("first_hit_rank"),
        (lit(1.0) / col("first_hit_rank")).as("mrr"))
      .orderBy(col("q_id"))
  }

  def recallEval(got: DataFrame, truth: DataFrame): DataFrame = {
    val g = got.select(col("q_id"), col("cand_id"))
    val t = truth.select(col("q_id"), col("cand_id"))
    val common = g.join(t, Seq("q_id", "cand_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_common"))
    val gn = g.groupBy(col("q_id")).agg(count(lit(1)).as("n_got"))
    val tn = t.groupBy(col("q_id")).agg(count(lit(1)).as("n_truth"))
    gn.join(tn, Seq("q_id"), "full_outer")
      .join(common, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_got"), lit(0L)).as("n_got"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("recall", when(col("n_truth") > 0,
        col("n_common").cast("double") / col("n_truth")))
      .orderBy(col("q_id"))
  }
}
