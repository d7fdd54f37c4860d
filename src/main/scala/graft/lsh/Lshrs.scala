package graft.lsh

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Method-for-method facade over the engine mirroring the reference's
  * `LSHRS` class (lshrs/core/main.py:58) so a reference user can map
  * every call they make today:
  *
  * | reference (main.py) | here |
  * | --- | --- |
  * | `create_signatures(format=…)` (:315) | [[createSignatures]] |
  * | `ingest(index, vector)` (:386) | [[ingest]] |
  * | `index(indices, vectors)` (:442) | [[index]] |
  * | `query(v, top_k, top_p)` (:524) | [[query]] |
  * | `get_top_k` (:660) | [[getTopK]] |
  * | `get_above_p` (:695) | [[getAboveP]] |
  * | `delete` (:744) | [[delete]] |
  * | `clear` (:786) | [[clear]] |
  * | `stats` (:798) | [[stats]] |
  * | `save_to_disk` (:846) | [[saveToDisk]] |
  * | `load_from_disk` (:898) | [[Lshrs.loadFromDisk]] |
  * | `print_config_analysis` (utils/br.py:398) | [[configAnalysis]] |
  *
  * Differences are the Spark-native ones: vectors live in DataFrames
  * rather than numpy arrays (so "a vector" is a one-row table and a
  * query batch is just a bigger table), the Redis store is the
  * inverted-index DataFrame, flush/buffering disappears (immutable
  * lineage), and `vector_fetch_fn` is unnecessary — the corpus itself
  * is the system of record joined at rerank time.
  */
class Lshrs private (val params: LshParams, val corpus: DataFrame, val indexDf: DataFrame) {

  private def withCorpus(c: DataFrame): Lshrs = {
    val norm = c.select(col("vec_id"), col("embedding"))
    new Lshrs(params, norm, LshIndex.build(norm, params))
  }

  /** Bulk-load a vector table (reference create_signatures: the
    * format-specific loaders live in [[graft.sources.Sources]]).
    */
  def createSignatures(vectors: DataFrame): Lshrs = withCorpus(vectors)

  /** Add one vector (a one-row batch — the engine is set-oriented). */
  def ingest(vecId: Long, vector: Array[Float]): Lshrs = {
    val spark = corpus.sparkSession
    import spark.implicits._
    index(Seq(vecId -> vector).toDF("vec_id", "embedding"))
  }

  /** Add a batch of vectors. */
  def index(vectors: DataFrame): Lshrs = withCorpus(corpus.unionByName(vectors))

  /** Collision top-k (topP empty) or cosine-reranked top-p prefix
    * (reference query(): both modes, same limit arithmetic).
    */
  def query(queries: DataFrame, topK: Int = 10, topP: Option[Double] = None): DataFrame =
    topP match {
      case None => LshIndex.topK(corpus, queries, params, topK)
      case Some(p) => LshIndex.topPRerank(corpus, queries, params, p, topK)
    }

  def getTopK(queries: DataFrame, topK: Int = 10): DataFrame =
    query(queries, topK)

  def getAboveP(queries: DataFrame, p: Double = 0.95): DataFrame =
    LshIndex.topPRerank(corpus, queries, params, p)

  def delete(vecIds: Seq[Long]): Lshrs =
    withCorpus(corpus.filter(!col("vec_id").isin(vecIds.map(lit(_)): _*)))

  /** Drop all indexed state (reference clear() flushes the prefix). */
  def clear(): Lshrs = withCorpus(corpus.limit(0))

  def stats(): DataFrame = LshIndex.stats(indexDf, params)

  /** Inspect one bucket's members (reference storage/redis.py:187
    * bucket_key / :282 get_bucket).
    */
  def getBucket(band: Int, sig: Long): DataFrame =
    LshIndex.getBucket(indexDf, band, sig)

  /** Wide-index (r > 64) form: bucket key is the hex signature. */
  def getBucket(band: Int, sig: String): DataFrame =
    LshIndex.getBucket(indexDf, band, sig)

  def saveToDisk(path: String): Unit = LshIndex.save(indexDf, params, path)

  /** Human-readable configuration analysis of THIS instance's params
    * (reference utils/br.py:398 `print_config_analysis`): optimal
    * layout, actual threshold, FP/FN rates, S-curve steepness, and the
    * detection-probability curve — returned as the report string (the
    * Spark-side convention: the caller decides where it prints).
    */
  def configAnalysis(): String =
    graft.config.LshConfig.analysisReport(params.numPerm, params.similarityThreshold)
}

object Lshrs {
  /** Reference __init__: params only; vectors arrive via
    * createSignatures / ingest / index.
    */
  def apply(spark: SparkSession, params: LshParams): Lshrs = {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    new Lshrs(params, empty, LshIndex.build(empty, params))
  }

  /** Reconstruct hashing state + index from disk (reference
    * load_from_disk; the corpus table is re-attached by the caller —
    * the reference likewise re-binds vector_fetch_fn after load).
    */
  def loadFromDisk(spark: SparkSession, path: String, corpus: DataFrame): Lshrs = {
    val (idx, p) = LshIndex.load(spark, path)
    new Lshrs(p, corpus, idx)
  }
}
