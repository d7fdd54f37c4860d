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
      .orderBy(col("vec_id"), col("dim_idx"))
}
