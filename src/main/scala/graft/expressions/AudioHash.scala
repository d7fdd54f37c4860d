package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Perceptual audio fingerprint (energy-gradient hash) — the audio
  * sibling of [[ImageHashKernel]]: decode the PCM stream, partition
  * it into 65 equal windows, take each window's integer mean
  * ABSOLUTE amplitude, and emit the 64 consecutive-window gradient
  * bits. Re-encodes and container-level rewrites of the same samples
  * collide exactly; loudness-envelope edits move few Hamming bits —
  * so the existing dedup/Hamming machinery applies to audio
  * unchanged.
  *
  * Same sample layouts as [[PcmKernel]]: 8-bit unsigned (recentered)
  * or 16-bit signed little-endian. Null for other widths, an empty
  * stream, or fewer samples than windows (too short to fingerprint).
  * Integer means (floor) + strict `>` keep the hash a pure function
  * of the samples on any engine.
  */
object AudioHashKernel {
  val Windows = 65

  def ahash(data: Array[Byte], bits: Long): java.lang.Long = {
    if (bits != 8L && bits != 16L) return null
    val n = if (bits == 8L) data.length else data.length / 2
    if (n < Windows) return null
    def sampleAbs(i: Int): Long =
      if (bits == 8L) math.abs((data(i) & 0xFF) - 128L)
      else math.abs(
        (((data(2 * i) & 0xFF) | (data(2 * i + 1) << 8)).toShort).toLong)
    val means = new Array[Long](Windows)
    var w = 0
    while (w < Windows) {
      val i0 = (w.toLong * n / Windows).toInt
      val i1 = ((w + 1).toLong * n / Windows).toInt
      var s = 0L
      var i = i0
      while (i < i1) { s += sampleAbs(i); i += 1 }
      means(w) = if (i1 > i0) s / (i1 - i0) else 0L
      w += 1
    }
    var bitsOut = 0L
    var b = 0
    while (b < 64) {
      if (means(b) > means(b + 1)) bitsOut |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(bitsOut)
  }
}

/** `audio_dhash(data, bits) → bigint` — 64-bit energy-gradient
  * fingerprint over a PCM stream; see [[AudioHashKernel.ahash]].
  */
case class AudioDhash(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_dhash"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, integral) input, got $other")
    }

  override def nullSafeEval(d: Any, b: Any): Any = {
    val v = AudioHashKernel.ahash(d.asInstanceOf[Array[Byte]],
      b match { case i: Int => i.toLong; case l: Long => l })
    if (v == null) null else v.longValue()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, b) => s"""
      |java.lang.Long gah = graft.expressions.AudioHashKernel.ahash($d, (long) $b);
      |if (gah == null) { ${ev.isNull} = true; } else { ${ev.value} = gah.longValue(); }
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
