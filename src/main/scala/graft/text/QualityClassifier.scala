package graft.text

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftFunctions

/** Learned quality filter — the fasttext-style classifier tier real
  * pipelines layer over rule batteries (GPT-3 §A trained LR against a
  * WebText-positive class; CCNet and LLaMA used fasttext the same
  * way). Features are the engine's own hashed bag-of-words embeddings
  * ([[TextAnalysis.hashEmbed]] — no external tokenizer or model), so
  * the whole loop is:
  *
  *   weak labels (Gopher rule battery) → MLlib LogisticRegression on
  *   hash-embed features → serve scores with a codegen dot product.
  *
  * Train/serve split mirrors the ANN family: TRAINING is an MLlib fit
  * (distributed L-BFGS treeAggregate — the one place a Vector UDF
  * conversion is unavoidable, same boundary as [[graft.ann.MlLsh]]);
  * SERVING is `sigmoid(w·x + b)` where w rides along as an array
  * literal in a native [[graft.expressions.DotProduct]] — broadcast
  * with the plan, no model object, no UDF, whole-stage codegen. At
  * 100 TB the scoring pass is a narrow map over the corpus: d float
  * multiplies per doc after the O(tokens) sparse feature build.
  */
object QualityClassifier {

  /** Serving-side model: d-dim weights + intercept. */
  case class QualityModel(weights: Array[Float], intercept: Double, d: Int)

  /** Weak labels from the Gopher rule battery: pass = positive. The
    * classifier generalizes the brittle rule edges into a smooth
    * score (a doc failing one rule by a hair scores near the
    * boundary, not at 0) — exactly why pipelines train a model on
    * rule-derived or domain-derived weak labels instead of shipping
    * the rules alone.
    */
  def weakLabels(docs: DataFrame): DataFrame =
    TextAnalysis.gopherQuality(docs)
      .select(col("doc_id"), col("gopher_pass").cast("int").as("label"))

  /** Fit LR on hash-embed features joined to `labels` (doc_id,
    * label∈{0,1}). Deterministic given the data (seeded by being
    * seedless: L-BFGS from a zero start; float-sum order across
    * partitions makes the last ulps run-dependent, which is why the
    * driver row is declared rows-only).
    */
  def train(docs: DataFrame, labels: DataFrame, d: Int = 256,
      maxIter: Int = 50, regParam: Double = 1e-3): QualityModel = {
    val feats = TextAnalysis.hashEmbedVectors(docs, d)
      .join(labels, Seq("doc_id"))
      .select(array_to_vector(col("embedding")).as("features"),
        col("label").cast("double").as("label"))
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(feats)
    QualityModel(m.coefficients.toArray.map(_.toFloat), m.intercept, d)
  }

  /** Score every doc: (doc_id, quality_prob, quality_pred). The
    * weights array is a plan literal — no UDF, no model broadcast
    * machinery, the dot product is the codegen kernel shared with the
    * ANN scan tiers.
    */
  def score(docs: DataFrame, model: QualityModel): DataFrame = {
    val z = GraftFunctions.dot_product(col("embedding"), typedlit(model.weights)) +
      lit(model.intercept)
    TextAnalysis.hashEmbedVectors(docs, model.d)
      .select(col("doc_id"),
        (lit(1.0) / (lit(1.0) + exp(-z))).as("quality_prob"))
      .withColumn("quality_pred", (col("quality_prob") >= 0.5).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** The driver row: weak-label → train → score the same corpus, with
    * the label joined back for inspection. Rows-only (see [[train]]).
    */
  def trainScoreQuery(docs: DataFrame, d: Int = 256): DataFrame = {
    val labels = weakLabels(docs)
    val model = train(docs, labels, d)
    score(docs, model).join(labels, Seq("doc_id"))
      .select(col("doc_id"), col("label"), col("quality_prob"), col("quality_pred"))
      .orderBy(col("doc_id"))
  }
}
