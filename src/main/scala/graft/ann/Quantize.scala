package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding compression for 100 TB-scale vector stores: per-vector
  * symmetric int8 scalar quantization — the standard 4× shrink
  * (float32 → int8 + one float scale) applied before ANN indexing or
  * shipping embeddings across stages.
  *
  * Quantized value: `floor(x · scale + 0.5)` with
  * `scale = 127 / max|x|` — pure double arithmetic on built-in
  * functions, so it stays in codegen AND is bit-reproducible across
  * engines (the oracle recomputes it in DuckDB exactly). A zero vector
  * gets scale 0 (all-zero codes) rather than a divide-by-zero NaN.
  */
object Quantize {

  /** Long-form quantized table: (vec_id, i, q, scale) — one row per
    * component, `q ∈ [-127, 127]`. Long form keeps the oracle
    * comparable (scalar columns) and is the join-friendly shape for
    * component-wise ops; pivot back with `collect_list` if an array
    * column is needed.
    */
  def int8(emb: DataFrame): DataFrame = {
    val maxAbs = array_max(transform(col("embedding"), e => abs(e.cast("double"))))
    emb
      .select(col("vec_id"), col("embedding"),
        when(maxAbs === 0.0, lit(0.0)).otherwise(lit(127.0) / maxAbs).as("scale"))
      .select(col("vec_id"), col("scale"),
        posexplode(col("embedding")).as(Seq("i", "e")))
      .select(col("vec_id"), col("i").cast("long").as("i"),
        floor(col("e").cast("double") * col("scale") + lit(0.5)).cast("long").as("q"),
        col("scale"))
      .orderBy(col("vec_id"), col("i"))
  }

  /** Reconstruct float vectors from [[int8]] output (q / scale), for
    * rerank-after-quantized-prefilter flows and for measuring the
    * quantization error. One groupBy shuffle; components reassembled
    * in index order.
    */
  def dequantize(quantized: DataFrame): DataFrame =
    quantized
      .groupBy(col("vec_id"), col("scale"))
      .agg(array_sort(collect_list(struct(col("i"), col("q")))).as("qs"))
      .select(col("vec_id"),
        transform(col("qs"), s =>
          when(col("scale") === 0.0, lit(0.0))
            .otherwise(s.getField("q").cast("double") / col("scale")))
          .as("embedding"))
}
