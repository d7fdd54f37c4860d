package graft

import org.apache.spark.sql.functions._

import graft.ann.{Ivf, Knn}

/** Round-1 verdict item #3: the query/centroid sides of the exact-kNN
  * and IVF operators must not be unconditionally broadcast — a
  * corpus-sized table passed where a serving batch is expected has to
  * take the shuffle/cartesian plan instead of OOMing on the broadcast
  * build.
  */
class BroadcastGuardSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sfDir, "embeddings")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withThreshold(v: String)(f: => Unit): Unit = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, v)
    try f finally spark.conf.set(key, old)
  }

  test("cosineTopK falls back to a non-broadcast plan when queries exceed the threshold") {
    withThreshold("-1") {
      val plan = planOf(Knn.cosineTopK(emb, emb, 3))
      assert(!plan.contains("Broadcast"), s"guard failed to drop the hint:\n$plan")
    }
  }

  test("cosineTopK broadcasts a small serving batch (auto) and under force") {
    val batch = emb.limit(5)
    assert(planOf(Knn.cosineTopK(emb, batch, 3)).contains("Broadcast"))
    withThreshold("-1") {
      // forced broadcast overrides the guard for callers that know better
      assert(planOf(Knn.cosineTopK(emb, batch, 3, broadcastQueries = Some(true)))
        .contains("Broadcast"))
    }
  }

  test("Ivf probeTopK respects the guard on the query side") {
    val centroids = emb.orderBy("vec_id").limit(4)
    withThreshold("-1") {
      val plan = planOf(Ivf.probeTopK(emb, emb, centroids, nProbe = 2, k = 3))
      assert(!plan.contains("BroadcastExchange"), s"query join still broadcast:\n$plan")
    }
    // results identical whichever join strategy is planned
    val guarded = Ivf.probeTopK(emb, emb.limit(20), centroids, nProbe = 2, k = 3).collect()
    val forced = Ivf.probeTopK(emb, emb.limit(20), centroids, nProbe = 2, k = 3,
      broadcastQueries = Some(true)).collect()
    assert(guarded.toSeq === forced.toSeq)
  }
}
