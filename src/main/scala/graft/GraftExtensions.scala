package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.expressions.{AdcScore, CosineSimilarity, DotProduct, HammingDistance, IntDotProduct, L2Norm, L2Normalize}

/** Session-extension entry point: enables
  * `--conf spark.sql.extensions=graft.GraftExtensions` so every
  * session (including SQL-only clients) gets the engine's functions
  * without touching application code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - exact cosine similarity of two vectors"),
      (es: Seq[Expression]) => CosineSimilarity(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two vectors"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("l2_norm"),
      info("l2_norm", "l2_norm(v) - Euclidean norm"),
      (es: Seq[Expression]) => L2Norm(es.head)))
    ext.injectFunction((FunctionIdentifier("l2_normalize"),
      info("l2_normalize", "l2_normalize(v) - unit-length vector, NULL for zero vector"),
      (es: Seq[Expression]) => L2Normalize(es.head)))
    ext.injectFunction((FunctionIdentifier("int_dot_product"),
      info("int_dot_product", "int_dot_product(a, b) - exact int64 dot product of integer code vectors"),
      (es: Seq[Expression]) => IntDotProduct(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("hamming_distance"),
      info("hamming_distance", "hamming_distance(a, b) - popcount distance over packed bit-code arrays"),
      (es: Seq[Expression]) => HammingDistance(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("adc_score"),
      info("adc_score", "adc_score(codes, tab) - PQ asymmetric-distance score: sum of tab[s*k + codes[s]]"),
      (es: Seq[Expression]) => AdcScore(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("deflate_size"),
      info("deflate_size", "deflate_size(v) - raw DEFLATE compressed size of a string/binary value"),
      (es: Seq[Expression]) => graft.expressions.DeflateSize(es.head)))
    ext.injectFunction((FunctionIdentifier("char_entropy_stats"),
      info("char_entropy_stats", "char_entropy_stats(s) - (n_chars, n_distinct, entropy_bits) struct"),
      (es: Seq[Expression]) => graft.expressions.CharEntropyStats(es.head)))
    ext.injectFunction((FunctionIdentifier("det_ln"),
      info("det_ln", "det_ln(x) - deterministic series-defined natural log (NULL for x <= 0)"),
      (es: Seq[Expression]) => graft.expressions.DetLnExpr(es.head)))
    ext.injectFunction((FunctionIdentifier("gaussian_project"),
      info("gaussian_project", "gaussian_project(v, outDim, dim, seed) - seeded JL Gaussian projection"),
      (es: Seq[Expression]) => GraftFunctions.projectFromSql(es)))
    ext.injectFunction((FunctionIdentifier("jpeg_sof_offset"),
      info("jpeg_sof_offset", "jpeg_sof_offset(payload) - 1-based SOFn marker offset, NULL for non-JPEG"),
      (es: Seq[Expression]) => graft.expressions.JpegSofOffset(es.head)))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(s) - Unicode canonical composition (NFC)"),
      (es: Seq[Expression]) => graft.expressions.NfcNormalize(es.head)))
    ext.injectFunction((FunctionIdentifier("zlib_deflate"),
      info("zlib_deflate", "zlib_deflate(v) - deterministic zlib compression of a string/binary value"),
      (es: Seq[Expression]) => graft.expressions.ZlibDeflate(es.head)))
    ext.injectFunction((FunctionIdentifier("zlib_inflate"),
      info("zlib_inflate",
        "zlib_inflate(v, maxLen) - zlib decode, NULL on corrupt/truncated/over-budget input"),
      (es: Seq[Expression]) => graft.expressions.ZlibInflate(es.head,
        es(1) match {
          // typed literal match: a string/float literal must get the
          // clean expected-type error, not a NumberFormatException or
          // a silently-parsed numeric string (r11 ADVICE)
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long,
            org.apache.spark.sql.types.LongType)
            if v >= 0 && v <= Int.MaxValue => v.toInt
          case other => throw new IllegalArgumentException(
            s"zlib_inflate maxLen must be an integer literal, got $other")
        })))
  }
}
