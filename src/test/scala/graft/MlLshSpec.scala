package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.{Ivf, Knn, MlLsh}
import graft.dedup.Dedup

class MlLshSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import spark.implicits._

  lazy val docs = Tables.load(spark, sfDir, "documents")
  lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("MLlib MinHashLSH finds the exact-jaccard near-dup pairs (recall)") {
    val exact = Dedup.ngramJaccardPairs(docs, minJaccard = 0.8).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val ml = MlLsh.minhashNearDupPairs(docs, maxJaccardDistance = 0.5).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    if (exact.nonEmpty) {
      val recall = exact.intersect(ml).size.toDouble / exact.size
      assert(recall >= 0.8, s"MLlib minhash recall $recall; missed ${exact.diff(ml)}")
    }
    // jaccard distances reported are consistent with the threshold
    val dists = MlLsh.minhashNearDupPairs(docs, maxJaccardDistance = 0.5).collect()
      .map(_.getAs[Double]("jaccard_dist"))
    assert(dists.forall(d => d >= 0.0 && d <= 0.5 + 1e-9))
  }

  test("MLlib BRP-LSH similarity join agrees with exact L2 near pairs") {
    // exact L2 pairs under distance d on a small slice
    val sub = emb.filter(col("vec_id") < 200)
    val d = 1.2
    val vecs = sub.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    def l2(a: Array[Float], b: Array[Float]): Double =
      math.sqrt(a.indices.map(i => { val x = a(i) - b(i); x.toDouble * x }).sum)
    val exact = (for {
      (i, vi) <- vecs.toSeq; (j, vj) <- vecs.toSeq if i < j && l2(vi, vj) <= d
    } yield (i, j)).toSet
    val ml = MlLsh.brpNearNeighborPairs(sub, maxL2Distance = d).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    // approxSimilarityJoin post-filters exactly → no false positives
    assert(ml.subsetOf(exact))
    if (exact.nonEmpty) {
      val recall = exact.intersect(ml).size.toDouble / exact.size
      assert(recall >= 0.5, s"BRP recall $recall of ${exact.size} pairs")
    }
  }

  test("MLlib adapters stay columnar: no typed object ser/deser hop") {
    // round-1 verdict #8: the vector adapters must not plan a whole-row
    // DeserializeToObject/SerializeFromObject pass
    val brpPlan = MlLsh.brpNearNeighborPairs(emb, maxL2Distance = 1.15)
      .queryExecution.executedPlan.toString
    val mhPlan = MlLsh.shingleVectors(docs)
      .queryExecution.executedPlan.toString
    Seq(brpPlan, mhPlan).foreach { p =>
      assert(!p.contains("DeserializeToObject") && !p.contains("SerializeFromObject"),
        s"typed hop present:\n$p")
    }
  }

  test("KMeans centroids drive Ivf with better-than-random recall") {
    val centroids = MlLsh.kmeansCentroids(emb, k = 8)
    assert(centroids.count() === 8)
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Knn.cosineTopK(emb, queries, 3).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id"))).toSet
    val ivf = Ivf.probeTopK(emb, queries, centroids, nProbe = 3, k = 3).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id"))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    // probing 3/8 cells of a random-ish corpus: require clearly-better-
    // than-chance retrieval
    assert(recall >= 0.4, s"IVF-kmeans recall $recall")
  }
}
