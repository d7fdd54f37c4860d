package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftFunctions.{hex64, top_k_by_score}

/** Corpus topic discovery — cluster documents in hash-embedding space
  * and label each cluster with its most over-represented terms
  * (c-TF-IDF, the BERTopic recipe): the corpus-cartography pass a
  * training-data pipeline runs to know WHAT is in 100 TB before
  * deciding mixing weights or pruning quotas.
  *
  * Everything is integer arithmetic until two final divisions (sparse
  * cosine numerators are exact int64 sums; the term score is one
  * integer ratio), so the whole output is DuckDB-hash-exact — a topic
  * model with an oracle.
  *
  * Scale shape: the sparse doc×centroid cosine reuses the
  * [[TextAnalysis.hashEmbedTopK]] join (centroid side is O(nCentroids)
  * and BROADCAST; the dim-join fan-out is |corpus|·overlap/d);
  * assignment is the `max(struct)` map-side argmax; both count tables
  * are map-side-partial groupBys; per-cluster term ranking is a
  * bounded [[graft.expressions.TopKByScore]] aggregate over the
  * (clusters × vocab) count table with the ≤ nClusters·topTerms
  * winners joined back — no window over the vocabulary.
  */
object Topics {

  /** (cluster, term_rank, token, cluster_count, corpus_count, score):
    * the `topTerms` highest-scoring tokens per cluster, where
    * `score = cluster_count / corpus_count` (the share of a token's
    * corpus mass captured by the cluster — c-TF-IDF's
    * class-vs-corpus contrast in its integer-exact form). Centroids
    * are the hash-embeddings of the first `nCentroids` doc ids (the
    * `ann_ivf` deterministic-seed convention); docs sharing no
    * embedding dimension with any centroid are unassigned and drop
    * out. Tie-break inside a cluster: token hash ascending (mirrored
    * in the oracle).
    */
  def topics(docs: DataFrame, nCentroids: Int = 8, topTerms: Int = 5,
      d: Int = 64): DataFrame = {
    val w = TextAnalysis.hashEmbed(docs, d).select(col("doc_id"), col("dim"), col("w"))
    val norms = w.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("s2"))
    val cw = w.filter(col("doc_id") < nCentroids)
      .select(col("doc_id").as("c_id"), col("dim"), col("w").as("cw"))
    val num = w.join(broadcast(cw), Seq("dim"))
      .groupBy(col("doc_id"), col("c_id"))
      .agg(sum(col("w") * col("cw")).as("num"))
    val asg = num
      .join(norms.as("nd"), Seq("doc_id"))
      .join(broadcast(norms.as("nc")).withColumnRenamed("doc_id", "c_id")
        .withColumnRenamed("s2", "c_s2"), Seq("c_id"))
      .select(col("doc_id"), col("c_id"),
        (col("num") / (sqrt(col("s2")) * sqrt(col("c_s2")))).as("sim"))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("sim"), (-col("c_id")).as("neg"), col("c_id"))).as("m"))
      .select(col("doc_id"), col("m.c_id").as("cluster"))
    val toks = TextAnalysis.withToks(docs)
      .select(col("doc_id"), explode(col("toks")).as("t"))
    val corpusCnt = toks.groupBy(col("t")).agg(count(lit(1)).as("corpus_count"))
    val clusterCnt = toks.join(asg, Seq("doc_id"))
      .groupBy(col("cluster"), col("t")).agg(count(lit(1)).as("cluster_count"))
    val scored = clusterCnt.join(corpusCnt, Seq("t"))
      .select(col("cluster"), col("t"), col("cluster_count"), col("corpus_count"),
        (col("cluster_count").cast("double") / col("corpus_count").cast("double"))
          .as("score"), hex64(concat(lit("tp|"), col("t"))).as("th"))
    val top = scored.groupBy(col("cluster"))
      .agg(top_k_by_score(col("score"), col("th"), topTerms).as("topk"))
      .select(col("cluster"), posexplode(col("topk.id")).as(Seq("pos", "th")))
      .select(col("cluster"), (col("pos") + 1).cast("long").as("term_rank"), col("th"))
    scored.join(broadcast(top), Seq("cluster", "th"))
      .select(col("cluster"), col("term_rank"), col("t").as("token"),
        col("cluster_count"), col("corpus_count"), col("score"))
      .orderBy(col("cluster"), col("term_rank"))
  }
}
