package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native 3-channel pixel-statistics kernel — the codegen upgrade of
  * the array-HOF pixel walks in `Bmp.pixelStats` / `PngPixels
  * .pixelStats`: one pass over the raw raster BYTES accumulating
  * per-channel sums and the peak byte, parameterized by the row
  * geometry so ONE kernel serves both layouts —
  * BMP: data = payload, pixOff = 54, stride = 4-byte-aligned row, no
  * filter bytes; PNG: data = inflated raster, pixOff = 1,
  * stride = 3w+1, every row's leading byte verified to be filter 0.
  */
object PixelKernel {
  /** (n_pixels, sum_c0, sum_c1, sum_c2, peak_byte), or null when the
    * geometry exceeds the buffer or a checked filter byte is nonzero.
    */
  def stats(data: Array[Byte], geom: ArrayData, checkFilter: Boolean): ArrayData = {
    var i = 0
    while (i < 4) { if (geom.isNullAt(i)) return null; i += 1 }
    val w = geom.getLong(0)
    val h = geom.getLong(1)
    val stride = geom.getLong(2)
    val pixOff = geom.getLong(3)
    if (w <= 0 || h <= 0 || stride < 3 * w) return null
    if (pixOff + (h - 1) * stride + 3 * w > data.length) return null
    var s0 = 0L; var s1 = 0L; var s2 = 0L
    var peak = 0L
    var y = 0L
    while (y < h) {
      val rowBase = y * stride
      if (checkFilter && data(rowBase.toInt) != 0) return null
      var x = 0L
      while (x < w) {
        val base = (pixOff + rowBase + 3 * x).toInt
        val b0 = (data(base) & 0xFF).toLong
        val b1 = (data(base + 1) & 0xFF).toLong
        val b2 = (data(base + 2) & 0xFF).toLong
        s0 += b0; s1 += b1; s2 += b2
        if (b0 > peak) peak = b0
        if (b1 > peak) peak = b1
        if (b2 > peak) peak = b2
        x += 1
      }
      y += 1
    }
    new GenericArrayData(Array(w * h, s0, s1, s2, peak))
  }
}

/** `pixel_channel_stats(data, [w, h, stride, pixOff]) → array<long>`
  * of (n_pixels, sum_c0, sum_c1, sum_c2, peak_byte); `checkFilter` is
  * an operator-level constant. NULL (never an exception) on geometry
  * or filter violations — see [[PixelKernel.stats]].
  */
case class PixelChannelStats(left: Expression, right: Expression,
    checkFilter: Boolean) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pixel_channel_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, array<long> geometry), got $other")
    }

  override def nullSafeEval(d: Any, g: Any): Any =
    PixelKernel.stats(d.asInstanceOf[Array[Byte]],
      g.asInstanceOf[ArrayData], checkFilter)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, g) => s"""
      |${ev.value} = graft.expressions.PixelKernel.stats($d, $g, $checkFilter);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
