package graft.text

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.BpeEncodeExpr

/** Byte-pair-encoding subword tokenizer learned FROM the corpus
  * (Sennrich et al. 2016 "Neural Machine Translation of Rare Words
  * with Subword Units") — real learned token counting for a training
  * pipeline, not a whitespace proxy: budget accounting, packing, and
  * cost estimates at 100 TB all key off subword counts under the
  * tokenizer that will actually be used.
  *
  * Scale shape: training runs on the WORD-FREQUENCY table, not the
  * corpus — one tokenize + `groupBy(word)` pass reduces 100 TB of text
  * to |vocab| rows (map-side-combined), and every merge iteration
  * touches only that table: a pair-count aggregate (weighted by word
  * frequency, partial-aggregated to one row per pair per partition)
  * feeds a 1-ROW argmax to the driver (the merge RULE is the scalar
  * decision — kilobytes, like the PQ codebook collect), and the merge
  * applies as a map-side array fold. Lineage is cut with an eager
  * `localCheckpoint` each round (the star-contraction discipline —
  * constant-depth plans over `numMerges` rounds, previous round's
  * blocks released). Serving is [[graft.expressions.BpeEncodeExpr]]:
  * the merge list rides the plan as a literal, one native call per row
  * inside whole-stage codegen.
  */
object Bpe {

  /** An ordered merge list; application order IS rank order. */
  case class BpeModel(merges: Seq[(String, String)])

  /** Characters of a word as an array<string> column. */
  private def charsOf(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** One greedy left-to-right merge of (a, b) → ab over a symbol
    * array — the list fold [[graft.expressions.BpeEncodeExpr]]
    * replicates natively at serving time.
    */
  private def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Deterministic word-frequency table (word, wc) from a documents
    * frame, optionally hash-sampled (the [[graft.ann.Pq.train]]
    * sampling practice — BPE statistics stabilize long before the full
    * corpus is seen; membership is a pure function of doc_id).
    */
  def wordCounts(docs: DataFrame, sampleFrac: Double = 1.0): DataFrame = {
    val base =
      if (sampleFrac >= 1.0) docs
      else graft.ops.Sampling.sampleByHash(docs, col("doc_id"), sampleFrac, "bpe")
    TextAnalysis.withToks(base)
      .select(explode(col("toks")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
  }

  /** Learn `numMerges` merge rules. Ties break lexicographically on
    * (a, b) — fully deterministic on any partitioning. Stops early
    * when the best pair's weighted count falls below `minCount`.
    */
  def train(docs: DataFrame, numMerges: Int = 64, sampleFrac: Double = 1.0,
      minCount: Long = 2L): BpeModel = {
    var words = wordCounts(docs, sampleFrac)
      .select(col("wc"), charsOf(col("word")).as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val best = words
        .filter(size(col("syms")) >= 2)
        .select(col("wc"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < minCount) done = true
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += ((a, b))
        val next = words
          .select(col("wc"), mergePair(col("syms"), a, b).as("syms"))
          .localCheckpoint(true)
        releaseCheckpoint(words)
        words = next
        m += 1
      }
    }
    releaseCheckpoint(words)
    BpeModel(merges.result())
  }

  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Subword segmentation of a token-array column under a model. */
  def encodeTokens(toks: Column, model: BpeModel): Column =
    GraftColumnBridge.column(
      BpeEncodeExpr(GraftColumnBridge.expression(toks), model.merges))

  /** Per-doc subword accounting under a learned model: (doc_id,
    * n_words, n_bpe_tokens, bpe_per_word) — the real token counts a
    * budget/packing pass would consume.
    */
  def tokenCounts(docs: DataFrame, model: BpeModel): DataFrame =
    TextAnalysis.withToks(docs)
      .select(col("doc_id"), col("toks"),
        encodeTokens(col("toks"), model).as("bpe"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_words"),
        size(col("bpe")).cast("long").as("n_bpe_tokens"))
      .withColumn("bpe_per_word",
        when(col("n_words") > 0,
          col("n_bpe_tokens").cast("double") / col("n_words").cast("double")))
      .orderBy(col("doc_id"))

  /** Persist a learned merge list as a (rank, a, b) table with the
    * merge count in TBLPROPERTIES — the model-at-rest layout shared
    * with [[QualityClassifier.saveModel]] / [[Dsir.saveLlr]].
    */
  def saveModel(model: BpeModel, spark: SparkSession, table: String,
      path: Option[String] = None): Unit = {
    import spark.implicits._
    val w = model.merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").format("parquet")
    path.foreach(loc => w.option("path", loc))
    w.saveAsTable(table)
    graft.ops.TableProps.set(spark, table, "graft.bpe.params",
      s"""{"n_merges":${model.merges.size}}""")
  }

  /** Restore a [[saveModel]]ed merge list in rank order (the collect
    * is the model itself — ≤ numMerges rows, kilobytes).
    */
  def loadModel(spark: SparkSession, table: String): BpeModel = {
    val json = graft.ops.TableProps.get(spark, table, "graft.bpe.params")
    val n = graft.ops.TableProps.longField(json, "n_merges").toInt
    val rows = spark.table(table).orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")))
    require(rows.length == n,
      s"table $table has ${rows.length} merges, expected $n")
    BpeModel(rows.toSeq)
  }

  /** The driver row: train (sampled) → [[saveModel]] → [[loadModel]]
    * → count subwords over the full corpus from the LOADED merges —
    * train-once/serve-many. Rows-only (the iterative merge training
    * has no SQL oracle); the encode ≡ training-fold invariant and a
    * reference-reimplementation parity are spec'd in BpeSpec.
    */
  def trainSaveCountQuery(docs: DataFrame, table: String,
      path: Option[String] = None, numMerges: Int = 48,
      sampleFrac: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    saveModel(train(docs, numMerges, sampleFrac), spark, table, path)
    tokenCounts(docs, loadModel(spark, table))
  }

  /** Sequence packing under the LEARNED tokenizer: [[tokenCounts]]
    * feeding [[graft.ops.Packing.packCounts]] — bins cut at the real
    * subword budget, which is what a training data loader actually
    * consumes (whitespace packing misestimates bins exactly where BPE
    * fragments: rare words, code, non-Latin text). Rows-only like
    * [[trainSaveCountQuery]]; the packing arithmetic itself is the
    * oracle-checked `seq_pack` prefix-sum, spec'd equal on shared
    * counts.
    */
  def packBpeQuery(docs: DataFrame, numMerges: Int = 48,
      sampleFrac: Double = 0.5, budget: Long = graft.ops.Packing.DefaultBudget)
      : DataFrame = {
    val model = train(docs, numMerges, sampleFrac)
    val counted = TextAnalysis.withToks(docs)
      .select(col("doc_id"), col("source"),
        size(encodeTokens(col("toks"), model)).cast("long").as("n_tokens"))
    graft.ops.Packing.packCounts(counted, budget)
  }
}
