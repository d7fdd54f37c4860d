package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-search index persisted AT REST — the postings twin of the LSH
  * bucket store ([[graft.lsh.LshIndex.saveBucketed]]; reference
  * analogue: `core/main.py:846 save_to_disk` / `:898 load_from_disk`
  * then `query`): "index once, serve many" with the corpus never
  * touched at serving time.
  *
  * Layout: the [[TextAnalysis.invertedIndex]] postings as a catalog
  * table bucketed + sorted by token (a query term's postings prune to
  * one file bucket); per-document lengths as a sibling
  * `<table>_doclen` table bucketed by doc_id (the candidate join reads
  * bucket-local); the corpus stats (n_docs, Σdl) — the only other
  * serving input — computed once at save time and stored in
  * TBLPROPERTIES, so [[searchTopK]] does not re-aggregate the corpus
  * per query (the round-3 gap: TextAnalysis.scala recomputed N and Σdl
  * on every search).
  */
object SearchIndex {

  /** A loaded index: everything [[searchTopK]] needs, corpus-free. */
  final case class TextIndex(postings: DataFrame, docLens: DataFrame,
      nDocs: Long, sumDl: Long, maxDf: Long)

  private def statsJson(nDocs: Long, sumDl: Long, maxDf: Long): String =
    s"""{"n_docs":$nDocs,"sum_dl":$sumDl,"max_df":$maxDf}"""

  /** Build and persist the index for `docs`: one corpus pass for the
    * postings (the invertedIndex build), one for doc lengths + stats.
    * `nBuckets` sizes the at-rest file buckets — pick so one token
    * bucket's postings fit an executor core at target scale.
    */
  def save(docs: DataFrame, table: String, nBuckets: Int = 32,
      maxDf: Long = TextAnalysis.DefaultMaxTokenDf,
      path: Option[String] = None): Unit = {
    val spark = docs.sparkSession
    // ONE cached tokenize pass feeds both tables (withToks trusts the
    // precomputed column), and the two independent writes run as
    // CONCURRENT jobs — the same submission pattern as Pq.train's
    // subspace fits
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val tokD = TextAnalysis.withToks(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // no separate warm-up count: the CacheManager's block-level locks
    // make the concurrent first readers build each cache partition
    // exactly once — a prior count() paid one full extra job. The
    // stats aggregate runs as a THIRD concurrent job over the same
    // cached pass (identical result to re-aggregating the written
    // doclen table — same rows — one table re-read cheaper; `add`
    // still re-derives from the table, where it is a correctness
    // property).
    // cluster by the bucket key before each bucketed write (the
    // Compaction.rewriteBucketed idiom, guide §6): without it every
    // input partition emits a file per bucket it touches — tasks ×
    // nBuckets small files — while the aligned repartition emits ONE
    // file per bucket and the exchange is the hash the bucket layout
    // uses anyway
    val fIdx = Future {
      val w = TextAnalysis.invertedIndex(tokD, maxDf)
        .repartition(nBuckets, col("token"))
        .write.mode("overwrite")
        .bucketBy(nBuckets, "token").sortBy("token").format("parquet")
      path.foreach(loc => w.option("path", loc))
      w.saveAsTable(table)
    }
    val fDl = Future {
      val wd = tokD.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
        .repartition(nBuckets, col("doc_id"))
        .write.mode("overwrite")
        .bucketBy(nBuckets, "doc_id").sortBy("doc_id").format("parquet")
      path.foreach(loc => wd.option("path", s"${loc}_doclen"))
      wd.saveAsTable(s"${table}_doclen")
    }
    val fStats = Future {
      tokD.agg(count(lit(1)).as("n"),
        sum(size(col("toks")).cast("long")).as("s")).head()
    }
    Await.result(fIdx, Duration.Inf); Await.result(fDl, Duration.Inf)
    val s = Await.result(fStats, Duration.Inf)
    tokD.unpersist(false)
    graft.ops.TableProps.set(spark, table, "graft.search.stats",
      statsJson(s.getLong(0), s.getLong(1), maxDf))
  }

  /** Restore a [[TextIndex]] from a [[save]]d table pair. Missing
    * tables or a missing stats property raise (the
    * tests/test_persistence_security.py posture: no silent serving
    * from a half-written index).
    */
  def load(spark: SparkSession, table: String): TextIndex = {
    val json = graft.ops.TableProps.get(spark, table, "graft.search.stats")
    import graft.ops.TableProps.longField
    TextIndex(spark.table(table), spark.table(s"${table}_doclen"),
      longField(json, "n_docs"), longField(json, "sum_dl"), longField(json, "max_df"))
  }

  /** BM25 top-k served ENTIRELY from the persisted index: postings of
    * the query terms → candidate pivot → bucket-local doc-length
    * fetch; the stored (n_docs, Σdl) ride in as a 1-row literal frame.
    * Identical scoring core as [[TextAnalysis.searchTopKOnIndex]]
    * ([[TextAnalysis.searchFromPostings]]) — the two plans agree
    * bitwise; the difference is purely what gets scanned: here, zero
    * corpus-side work (spec-asserted: no exchange above the doclen
    * scan, no `documents` scan anywhere in the plan). Segment rows
    * from [[add]] are merged on the way in — identity on a
    * freshly-[[save]]d index, and the merge groupBy reads the
    * bucketed-by-token table bucket-local.
    */
  def searchTopK(idx: TextIndex, terms: Seq[String] = TextAnalysis.Bm25Terms,
      k: Int = 20, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = idx.postings.sparkSession
    val stats = spark.range(1).select(
      lit(idx.nDocs).cast("long").as("n_docs"),
      lit(idx.sumDl).cast("long").as("sum_dl"))
    TextAnalysis.searchFromPostings(idx.docLens, stats,
      mergeSegments(idx.postings, idx.maxDf), terms, k, k1, b)
  }

  /** BATCH query serving — the production shape the reference's
    * `query()` takes on the vector side, for text: a frame of
    * `(query_id, token)` rows is served in ONE pass over the postings
    * instead of a plan per query. Plan shape: the distinct query-token
    * set broadcast-semi-joins the postings (index side touches only
    * Σ df(query tokens) entries regardless of corpus size), candidates
    * join doc lengths on the bucketed doc_id key, and the per-(query,
    * doc) BM25 sum folds the per-term scores IN TOKEN ORDER
    * (`aggregate` over `sort_array(collect_list(struct))` — a
    * groupBy-sum of doubles would be partition-order-dependent; the
    * [[TextAnalysis.ngramLmScore]] determinism discipline), so even
    * the batch ranker is cross-engine hash-exact. Per-query top-k via
    * the bounded TopKByScore aggregate.
    * Output: (query_id, rn, doc_id, score).
    */
  def searchTopKBatch(idx: TextIndex, queries: DataFrame, k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = idx.postings.sparkSession
    val stats = spark.range(1).select(
      lit(idx.nDocs).cast("long").as("n_docs"),
      lit(idx.sumDl).cast("long").as("sum_dl"))
    val q = queries.select(col("query_id"), col("token")).distinct()
    val qTokens = q.select(col("token")).distinct()
    val merged = mergeSegments(idx.postings, idx.maxDf)
      .join(broadcast(qTokens), Seq("token"), "left_semi")
    val posts = merged.select(col("token"), col("df"),
        explode(arrays_zip(col("doc_ids"), col("tfs"))).as("p"))
      .select(col("token"), col("df"),
        col("p.doc_ids").as("doc_id"), col("p.tfs").as("tf"))
    val withDl = posts
      .join(idx.docLens, Seq("doc_id"))
      .join(broadcast(q), Seq("token"))
      .crossJoin(broadcast(stats))
    val idf = graft.GraftFunctions.det_ln(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    // association order mirrors searchFromPostings term-for-term
    val termScore = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * (col("dl") / (col("sum_dl") / col("n_docs")))))
    val perDoc = withDl
      .select(col("query_id"), col("doc_id"), col("token"), termScore.as("s"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("token"), col("s")))),
        lit(0.0), (a, x) => a + x.getField("s")).as("score"))
    graft.ops.TopK.rankByScore(
        perDoc.select(col("query_id").as("q_id"), col("doc_id").as("cand_id"),
          col("score").as("sim")), k)
      .select(col("q_id").as("query_id"), col("rn"),
        col("cand_id").as("doc_id"), col("sim").as("score"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** Segment-merged postings of a loaded index — the serve-time view
    * every reader must use (see [[mergeSegments]]).
    */
  def mergedPostings(idx: TextIndex): DataFrame =
    mergeSegments(idx.postings, idx.maxDf)

  /** Fold segment rows (one per (token, append)) back to one row per
    * token: df/cf sum; the (doc_id, tf) pairs of all segments
    * re-sorted ascending by doc_id (appends carry NEW doc_ids, so the
    * merged array is exactly what a from-scratch build emits).
    * Identity on a single-segment index. Without this, BM25's
    * `max(df)` per term would read ONE segment's df — the exact bug
    * class the serve-time merge exists to prevent.
    */
  private def mergeSegments(postings: DataFrame, maxDf: Long): DataFrame =
    postings.groupBy(col("token"))
      .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"),
        sort_array(flatten(collect_list(arrays_zip(col("doc_ids"), col("tfs"))))).as("z"))
      .filter(col("df") <= maxDf)
      .select(col("token"), col("df"), col("cf"),
        expr("transform(z, s -> s.doc_ids)").as("doc_ids"),
        expr("transform(z, s -> s.tfs)").as("tfs"))

  /** Incrementally index a batch of NEW documents — the Lucene
    * segment model in DataFrame form: the batch's postings append as
    * segment rows bucket-aligned (bucket counts from the catalog),
    * doc lengths append, and the stored (n_docs, Σdl) stats advance.
    * Serving merges segments per queried token ([[searchTopK]]);
    * [[compact]] folds them physically. At 100 TB the add touches
    * only the new rows. Caveat (documented, not silent): the df cap
    * is enforced per segment at build and on the merged total at
    * serve — a token that exceeded the cap inside an earlier segment
    * alone stays dropped, exactly as a rebuild would drop it.
    *
    * Failure atomicity: the two appends are not transactional — a
    * crash between them can leave the batch's postings present with
    * its doc lengths missing (re-run the add for the batch, then
    * [[compact]], to converge). The stats, however, can never drift:
    * they are RE-DERIVED from the doclen table after the appends (not
    * advanced by a delta), so a retried or partially-failed add leaves
    * n_docs/Σdl exactly consistent with what the doclen table holds —
    * BM25's IDF/avgdl always describe the index as stored.
    */
  def add(batch: DataFrame, table: String): Unit = {
    val spark = batch.sparkSession
    def bucketsOf(t: String): Int =
      spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
        .bucketSpec.getOrElse(throw new IllegalArgumentException(
          s"table $t is not bucketed — not a SearchIndex table")).numBuckets
    val json = graft.ops.TableProps.get(spark, table, "graft.search.stats")
    import graft.ops.TableProps.longField
    val maxDf = longField(json, "max_df")
    val tokD = TextAnalysis.withToks(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tokD.count()
    TextAnalysis.invertedIndex(tokD, maxDf).write.mode("append")
      .bucketBy(bucketsOf(table), "token").sortBy("token").format("parquet")
      .saveAsTable(table)
    tokD.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
      .write.mode("append")
      .bucketBy(bucketsOf(s"${table}_doclen"), "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(s"${table}_doclen")
    tokD.unpersist(false)
    // stats LAST, re-derived from the appended doclen table (one
    // linear pass over a two-long-per-doc table — not the corpus):
    // a crash before this line leaves the PREVIOUS stats paired with
    // the previous serve set; a retry re-runs this aggregate and
    // lands on the stored truth either way — no compounding delta
    val s = spark.table(s"${table}_doclen")
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head()
    graft.ops.TableProps.set(spark, table, "graft.search.stats",
      statsJson(s.getLong(0), s.getLong(1), maxDf))
  }

  /** Physically fold the segments: rewrite the postings table with
    * [[mergeSegments]] applied (back to one row per token AND one
    * file per bucket) and the doclen table's append debris compacted.
    * Stats ride in TBLPROPERTIES and survive the swap.
    */
  def compact(spark: SparkSession, table: String): Unit = {
    val json = graft.ops.TableProps.get(spark, table, "graft.search.stats")
    val maxDf = graft.ops.TableProps.longField(json, "max_df")
    graft.ops.Compaction.rewriteBucketed(spark, table, p => mergeSegments(p, maxDf))
    graft.ops.Compaction.rewriteBucketed(spark, s"${table}_doclen")
  }
}
