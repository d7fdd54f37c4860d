package graft.ann

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss dimensionality reduction for the embedding
  * family: a seeded Gaussian random projection d → d' that
  * approximately preserves inner products (distortion O(1/√d')), the
  * third compression lever next to scalar quantization
  * ([[Quantize]]) and product quantization ([[Pq]]) — 64→16 dims is a
  * 4× shrink BEFORE either of those applies, and candidate generation
  * in the projected space composes with every exact-rerank flow here.
  *
  * Zero state: the planes are a pure function of the seed (the
  * [[graft.lsh.RandomProjection]] family sign-LSH already uses — the
  * LSH signature is literally this projection with magnitudes
  * discarded), so projection is a map-side codegen expression — no
  * broadcast, no shuffle, no fitted model to store.
  */
object Project {

  val Seed = 42L
  val OutDim = 16
  val Dim = 64

  /** Projected vector as array<double> of [[OutDim]]. */
  def project(v: Column, outDim: Int = OutDim, dim: Int = Dim,
      seed: Long = Seed): Column =
    GraftColumnBridge.column(graft.expressions.GaussianProjectExpr(
      GraftColumnBridge.expression(v), outDim, dim, seed))

  /** Driver row: one (vec_id, dim_idx, value) row per projected
    * component — long format because the gate canonicalizes scalar
    * cells (array cells don't sort in pandas).
    */
  def projectQuery(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), posexplode(project(col("embedding")))
        .as(Seq("dim_idx", "value")))
      .select(col("vec_id"), col("dim_idx").cast("long").as("dim_idx"), col("value"))

  /** IVF serving with candidate generation in the PROJECTED space and
    * exact rerank in the ORIGINAL space — the standard compressed-
    * candidates/exact-rerank composition (the [[Quantize.quantizedTopK]]
    * shape with JL as the compressor): cell assignment and probing
    * score 16-dim vectors (4× less arithmetic and shuffle width than
    * the raw 64-dim IVF), and only probed-cell candidates ever touch
    * the full-precision embeddings. Same map-side `max(struct)` /
    * TopKByScore discipline as [[Ivf]] — no window, no cross join.
    */
  def probeTopKProjected(embeddings: DataFrame, queries: DataFrame,
      centroids: DataFrame, nProbe: Int, k: Int,
      projector: Column => Column = project(_)): DataFrame = {
    import graft.GraftFunctions.{cosine_sim, top_k_by_score}
    val proj = embeddings.select(col("vec_id"), projector(col("embedding")).as("p"))
    val cents = centroids.select(col("vec_id").as("c_id"),
      projector(col("embedding")).as("cp"))
    val scored = proj
      .crossJoin(graft.ops.Broadcasting.maybeBroadcast(cents, Some(true)))
      .select(col("vec_id"), col("c_id"),
        cosine_sim(col("p"), col("cp")).as("c_sim"))
    val asg = scored.groupBy(col("vec_id"))
      .agg(max(struct(col("c_sim"), (-col("c_id")).as("neg"), col("c_id"))).as("m"))
      .select(col("vec_id"), col("m.c_id").as("cell"))
    val qIds = queries.select(col("vec_id").as("q_id"))
    val probes = scored
      .join(broadcast(qIds), col("vec_id") === col("q_id"), "left_semi")
      .groupBy(col("vec_id").as("q_id"))
      .agg(top_k_by_score(col("c_sim"), col("c_id"), nProbe).as("top"))
      .select(col("q_id"), explode(col("top.id")).as("cell"))
    val cand = probes.join(asg, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id")).distinct()
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val sims = cand
      .join(broadcast(queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"))), Seq("q_id"))
      .join(e.withColumnRenamed("vec_id", "cand_id")
        .withColumnRenamed("embedding", "c_emb"), Seq("cand_id"))
      .select(col("q_id"), col("cand_id"),
        cosine_sim(col("q_emb"), col("c_emb")).as("sim"))
    graft.ops.TopK.rankByScore(
      sims.select(col("q_id"), col("cand_id"), col("sim")), k)
  }
}
