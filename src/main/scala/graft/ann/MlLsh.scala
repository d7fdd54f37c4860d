package graft.ann

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftFunctions
import graft.dedup.Dedup

/** MLlib-composed variants of the LSH operators — the "compose
  * existing ops" tier of the build preference order, sitting alongside
  * the custom-expression engine in graft.lsh:
  *
  *  - [[minhashNearDupPairs]]: `o.a.s.ml.feature.MinHashLSH` over
  *    hashed-shingle sparse vectors + `approxSimilarityJoin` (Jaccard
  *    distance), the library twin of Dedup.minhashLshPairs;
  *  - [[brpNearNeighborPairs]]: `BucketedRandomProjectionLSH`
  *    (Euclidean) similarity join over embeddings — note the reference
  *    engine's family is sign-random-projection/cosine, which MLlib
  *    does not ship; graft.lsh.LshIndex carries that exact semantics
  *    and MLlib provides the distance-based alternative;
  *  - [[kmeansCentroids]]: MLlib KMeans centroid table for Ivf (the
  *    production centroid source; the oracle-checked query keeps
  *    deterministic fixed centroids).
  *
  * All estimators are seeded → deterministic models; outputs are
  * rows-only for the oracle gate (MLlib's internal hash coefficients
  * are not reproducible in SQL) with recall specs vs the exact
  * baselines.
  */
object MlLsh {

  val ShingleSpace = 1 << 18

  /** Sparse-vector constructor as a single-column UDF: unlike a typed
    * `.as[...].map`, this converts only the slots column (no
    * whole-row DeserializeToObject/SerializeFromObject pass) and the
    * rest of the projection stays in codegen. A UDF is unavoidable at
    * the MLlib boundary — `array_to_vector` itself is one, and it has
    * no sparse counterpart.
    */
  private val sparseBinaryVec = udf((slots: Seq[Int]) =>
    Vectors.sparse(ShingleSpace, slots.sorted.toArray, Array.fill(slots.size)(1.0)))

  /** Sparse binary shingle vectors: (doc_id, features). */
  def shingleVectors(docs: DataFrame)(implicit spark: SparkSession): DataFrame =
    Dedup.shingleSet(docs)
      .withColumn("slot", pmod(GraftFunctions.hex64(col("s")), lit(ShingleSpace.toLong)).cast("int"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("slot")).as("slots"))
      .select(col("doc_id"), sparseBinaryVec(col("slots")).as("features"))

  /** Near-dup pairs via MLlib MinHashLSH approxSimilarityJoin,
    * thresholded on Jaccard distance. The shingle-vector frame feeds
    * fit() AND both join sides — cached once (returned frame is the
    * cache scope per the [[graft.ops.Caching.materialized]] contract).
    * 4 hash tables: a j=0.8 pair collides with P = 1-(1-j)^4 ≈ 0.998,
    * comfortably above the recall spec floor at half the join
    * explosion of the previous 8.
    */
  def minhashNearDupPairs(docs: DataFrame, maxJaccardDistance: Double = 0.5,
      numHashTables: Int = 4, seed: Long = 42L)(implicit spark: SparkSession): DataFrame = {
    val vecs = shingleVectors(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
      .fit(vecs)
    val out = model.approxSimilarityJoin(vecs, vecs, maxJaccardDistance, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("a"),
        col("datasetB.doc_id").as("b"),
        col("jaccard_dist"))
      .filter(col("a") < col("b"))
      .orderBy(col("a"), col("b"))
    graft.ops.Caching.materialized(out) { vecs.unpersist(false) }
  }

  private def toDense(emb: DataFrame)(implicit spark: SparkSession): DataFrame =
    emb.select(col("vec_id"),
      org.apache.spark.ml.functions.array_to_vector(col("embedding")).as("features"))

  /** Euclidean near-neighbor pairs via BucketedRandomProjectionLSH.
    * Same cache scope as [[minhashNearDupPairs]].
    */
  def brpNearNeighborPairs(emb: DataFrame, maxL2Distance: Double,
      bucketLength: Double = 0.5, numHashTables: Int = 2, seed: Long = 42L)
      (implicit spark: SparkSession): DataFrame = {
    val vecs = toDense(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
      .fit(vecs)
    val out = model.approxSimilarityJoin(vecs, vecs, maxL2Distance, "l2_dist")
      .select(
        col("datasetA.vec_id").as("a"),
        col("datasetB.vec_id").as("b"),
        col("l2_dist"))
      .filter(col("a") < col("b"))
      .orderBy(col("a"), col("b"))
    graft.ops.Caching.materialized(out) { vecs.unpersist(false) }
  }

  /** KMeans centroid table shaped for [[Ivf]]: (vec_id, embedding)
    * with centroid ids 0..k-1.
    */
  def kmeansCentroids(emb: DataFrame, k: Int, seed: Long = 42L)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val vecs = toDense(emb)
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features").fit(vecs)
    model.clusterCenters.zipWithIndex
      .map { case (c: Vector, i: Int) => (i.toLong, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("vec_id", "embedding")
  }
}
