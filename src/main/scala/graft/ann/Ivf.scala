package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftFunctions.cosine_sim

/** IVF-style ANN: partition the corpus into cells around centroids,
  * probe only the nProbe cells nearest to each query, rerank probed
  * candidates by exact cosine.
  *
  * Centroid selection here is deterministic (caller-provided centroid
  * table — e.g. a fixed id prefix or k-means output); cell assignment
  * is a broadcast argmax over centroids, so corpus rows never shuffle
  * until the final per-query top-k. At 100 TB the assignment pass is
  * embarrassingly parallel and the probe join touches only
  * nProbe/nCells of the data — the classic IVF pruning win.
  */
object Ivf {

  /** Assign each vector to its nearest centroid: (vec_id, cell).
    * The centroid side is O(nCells) by construction, but the guard
    * protects against a corpus-sized table passed as centroids.
    */
  def assign(corpus: DataFrame, centroids: DataFrame,
      broadcastCentroids: Option[Boolean] = None): DataFrame = {
    val c = centroids.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_sim").desc, col("c_id"))
    corpus.crossJoin(graft.ops.Broadcasting.maybeBroadcast(c, broadcastCentroids))
      .select(col("vec_id"), col("c_id"),
        cosine_sim(col("embedding"), col("c_emb")).as("c_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cell"))
  }

  /** Probe-and-rerank top-k: (q_id, rn, cand_id, sim).
    * `broadcastQueries` guards the rerank's query-vector join the same
    * way as [[graft.ann.Knn.cosineTopK]] — corpus-as-queries falls back
    * to a shuffle join.
    */
  def probeTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      nProbe: Int, k: Int, broadcastQueries: Option[Boolean] = None): DataFrame = {
    val cells = assign(corpus, centroids)
    val c = centroids.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val wq = Window.partitionBy(col("q_id")).orderBy(col("c_sim").desc, col("c_id"))
    val probes = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(graft.ops.Broadcasting.maybeBroadcast(c))
      .select(col("q_id"), col("c_id"),
        cosine_sim(col("q_emb"), col("c_emb")).as("c_sim"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("q_id"), col("c_id").as("cell"))
    val cand = probes.join(cells, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"))
      .distinct()
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val corp = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("cand_id"))
    cand
      .join(graft.ops.Broadcasting.maybeBroadcast(q, broadcastQueries), Seq("q_id"))
      .join(corp, Seq("cand_id"))
      .select(col("q_id"), col("cand_id"), cosine_sim(col("q_emb"), col("cand_emb")).as("sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("cand_id"), col("sim"))
      .orderBy(col("q_id"), col("rn"))
  }
}
