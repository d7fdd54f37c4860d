package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PCM sample-statistics kernel — the codegen upgrade of the
  * array-HOF decode path in
  * [[graft.multimodal.Binary.Wav.sampleStats]]: one pass over the raw
  * data-chunk BYTES (no hex strings, no per-sample substring
  * allocation) accumulating exactly the integer stats the operator
  * publishes. ~10⁷ samples/s/core through the HOF chain becomes
  * memory-bandwidth-bound here — the difference between an audio
  * triage map and a bottleneck at 100 TB of WAV.
  */
object PcmKernel {
  /** (n_samples, sum, sum_sq, peak_abs, n_clipped) for 8-bit unsigned
    * (recentered at 0, clip at \|v\| ≥ 127) or 16-bit signed
    * little-endian (clip at \|v\| ≥ 32767) PCM. A trailing odd byte of
    * a 16-bit stream is ignored (div-floor sample count).
    */
  def stats(data: Array[Byte], bits: Long): ArrayData = {
    // only the two layouts this kernel decodes — a 24/32-bit header
    // must refuse, not silently mis-read as 16-bit
    if (bits != 8L && bits != 16L) return null
    var n = 0
    var sum = 0L
    var sumSq = 0L
    var peak = 0L
    var clipped = 0L
    if (bits == 8L) {
      n = data.length
      var i = 0
      while (i < n) {
        val v = (data(i) & 0xFF) - 128L
        sum += v
        sumSq += v * v
        val a = math.abs(v)
        if (a > peak) peak = a
        if (a >= 127L) clipped += 1
        i += 1
      }
    } else {
      n = data.length / 2
      var i = 0
      while (i < n) {
        val v = (((data(2 * i) & 0xFF) | (data(2 * i + 1) << 8)).toShort).toLong
        sum += v
        sumSq += v * v
        val a = math.abs(v)
        if (a > peak) peak = a
        if (a >= 32767L) clipped += 1
        i += 1
      }
    }
    new GenericArrayData(Array(n.toLong, sum, sumSq, peak, clipped))
  }
}

/** `pcm_sample_stats(data, bits) → array<long>` of (n_samples, sum,
  * sum_sq, peak_abs, n_clipped) — see [[PcmKernel.stats]].
  */
case class PcmSampleStats(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pcm_sample_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, integral) input, got $other")
    }

  override def nullSafeEval(d: Any, b: Any): Any =
    PcmKernel.stats(d.asInstanceOf[Array[Byte]],
      b match { case i: Int => i.toLong; case l: Long => l })

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, b) => s"""
      |${ev.value} = graft.expressions.PcmKernel.stats($d, (long) $b);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
