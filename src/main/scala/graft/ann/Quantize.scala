package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftFunctions.{cosine_sim, l2_normalize, top_k_by_score}

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
  }

  /** Array-form quantization of the L2-NORMALIZED vector:
    * (vec_id, qv array<tinyint>, scale) — the serving shape for
    * [[quantizedTopK]]. Normalizing first makes the integer dot product
    * a cosine approximation (scale-corrected), not a raw-dot one.
    * Codes are stored as tinyint so both the at-rest AND the in-memory
    * scan really carry 1 byte per component (an array<long> encoding
    * would silently spend 8 bytes/component in UnsafeArrayData — twice
    * the float32 it replaces).
    */
  def int8Unit(emb: DataFrame): DataFrame = {
    val unit = l2_normalize(col("embedding"))
    val maxAbs = array_max(transform(unit, e => abs(e)))
    emb
      .select(col("vec_id"), unit.as("nv"),
        when(maxAbs === 0.0, lit(0.0)).otherwise(lit(127.0) / maxAbs).as("scale"))
      .select(col("vec_id"), col("scale"),
        transform(col("nv"), e => floor(e * col("scale") + lit(0.5)).cast("byte")).as("qv"))
  }

  /** Exact integer dot product of two long arrays — associative integer
    * adds, bit-identical on any engine and any evaluation order. Native
    * codegen expression: the `zip_with`+`aggregate` HOF form measured
    * ~5× slower (per-element lambda evaluation).
    */
  private def dotInt(a: Column, b: Column): Column =
    graft.GraftFunctions.int_dot(a, b)

  /** Quantized-prefilter ANN serving: rank candidates by the int8
    * integer dot product of unit vectors (divided by the two scales →
    * a cosine approximation), keep the top `prefilterK` per query
    * map-side, then rerank ONLY the survivors with exact float cosine.
    * Output: (q_id, rn, cand_id, sim) — same shape as
    * [[Knn.cosineTopK]].
    *
    * The 100 TB win: the scan feeding the O(corpus × queries) scoring
    * pass reads 1 byte per component instead of 4 (plus one double
    * scale per vector), and the arithmetic is integer multiply-adds;
    * the full-precision embeddings are only fetched for the
    * prefilterK × queries survivors (reference rerank semantics:
    * lshrs/utils/similarity.py:93 rerank of bucket candidates).
    * Determinism: integer dot is exact; the scale correction is two
    * IEEE ops (one multiply, one divide) on oracle-exact scales; ties
    * break on candidate id — so the DuckDB oracle hash-matches.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      prefilterK: Int, broadcastQueries: Option[Boolean] = None): DataFrame = {
    val qc = int8Unit(queries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("scale").as("q_scale"))
    val cc = int8Unit(corpus)
      .select(col("vec_id").as("cand_id"), col("qv").as("c_qv"), col("scale").as("c_scale"))
    val ascore = when(col("q_scale") * col("c_scale") === 0.0, lit(0.0))
      .otherwise(dotInt(col("q_qv"), col("c_qv")).cast("double") /
        (col("q_scale") * col("c_scale")))
    val survivors = cc
      .crossJoin(graft.ops.Broadcasting.maybeBroadcast(qc, broadcastQueries))
      .filter(col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("cand_id"), ascore.as("ascore"))
      .groupBy(col("q_id"))
      .agg(top_k_by_score(col("ascore"), col("cand_id"), prefilterK).as("pre"))
      .select(col("q_id"), explode(col("pre.id")).as("cand_id"))
    graft.ops.TopK.cosineRerank(survivors, corpus, queries, k, broadcastQueries,
      prefilterK = Some(prefilterK.toLong))
  }

  /** 1-bit sign quantization: each dimension's SIGN packed into 32-bit
    * words (32 dims per word, 32× smaller than float32) — the extreme
    * end of the compression ladder (float32 → int8 → 1 bit), and the
    * standard Hamming-space prefilter for cosine search on roughly
    * isotropic embeddings (sign-random-projection with the identity
    * projection). 32-bit packing keeps every word positive in an int64
    * on ANY engine — a 64-dim single-word pack would put dimension 63
    * into the BIGINT sign bit and diverge engines on comparison order.
    * Output: (vec_id, code array<long>, ceil(d/32) words).
    */
  def binarySign(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("transform(sequence(0, (size(embedding)-1) div 32), w -> " +
        "aggregate(sequence(0, 31), 0L, (acc, j) -> " +
        "acc + CASE WHEN w*32 + j < size(embedding) AND embedding[w*32 + j] > 0 " +
        "THEN shiftleft(1L, j) ELSE 0L END))").as("code"))

  /** Hamming-prefilter ANN serving: rank candidates by the Hamming
    * distance between sign codes (integer `bit_count(xor)` per word —
    * exact on any engine), keep the `prefilterK` nearest per query
    * map-side ([[graft.expressions.TopKByScore]] on −hamming, ties →
    * smaller id), rerank ONLY the survivors with exact float cosine.
    * Output: (q_id, rn, cand_id, sim) — the [[Knn.cosineTopK]] shape.
    *
    * The 100 TB reading: the O(corpus × queries) scoring scan reads
    * d/8 BYTES per vector (vs 4d for float32 — a 32× shrink) and the
    * inner loop is XOR+popcount; full-precision embeddings are fetched
    * only for prefilterK × queries survivors. Fully SQL-oracle-exact,
    * unlike most binary-ANN implementations: integer distances, IEEE
    * cosine rerank, deterministic ties.
    */
  def binaryTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      prefilterK: Int, broadcastQueries: Option[Boolean] = None): DataFrame = {
    val qc = binarySign(queries)
      .select(col("vec_id").as("q_id"), col("code").as("q_code"))
    val cc = binarySign(corpus)
      .select(col("vec_id").as("cand_id"), col("code").as("c_code"))
    // native codegen kernel — the HOF form (aggregate(zip_with(...)))
    // measured ~0.95× brute at 500k×1000; the tight loop makes the
    // 32× byte shrink actually pay (same lesson as IntDotProduct)
    val ham = graft.GraftFunctions.hamming_distance(col("q_code"), col("c_code"))
    val survivors = cc
      .crossJoin(graft.ops.Broadcasting.maybeBroadcast(qc, broadcastQueries))
      .filter(col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("cand_id"), (-ham).cast("double").as("nham"))
      .groupBy(col("q_id"))
      .agg(top_k_by_score(col("nham"), col("cand_id"), prefilterK).as("pre"))
      .select(col("q_id"), explode(col("pre.id")).as("cand_id"))
    graft.ops.TopK.cosineRerank(survivors, corpus, queries, k, broadcastQueries,
      prefilterK = Some(prefilterK.toLong))
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
