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
    // attacker-controlled header geometry: bound every term BEFORE the
    // bounds-check multiplication, or a huge h·stride could wrap Long
    // and sail past the length check into out-of-bounds reads
    if (w <= 0 || h <= 0 || stride < 3 * w || pixOff < 0 ||
      w > (1L << 20) || h > (1L << 20) || stride > (1L << 24) ||
      pixOff > (1L << 30)) return null
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

/** PNG scanline statistics with REAL adaptive-filter decode — the
  * [[PixelKernel]] sibling for filtered rasters: each scanline's
  * leading byte selects the PNG filter (0 None / 1 Sub / 2 Up /
  * 3 Average / 4 Paeth, spec §9), and reconstruction is the standard
  * sequential recurrence over the DECODED neighbor bytes — exactly
  * the part that cannot be a per-byte SQL expression and so lives in
  * a kernel. 8-bit RGB (bpp 3); stats accumulate on the reconstructed
  * bytes in the same pass.
  */
object PngFilterKernel {
  // Adam7 pass origins and steps (PNG spec §8.2): (x0, y0, dx, dy)
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Unfilter one sub-image of `ph` scanlines × `rowb` pixel bytes
    * starting at `off`, accumulating into `acc` = [s0, s1, s2, peak].
    * Returns the offset past the sub-image, or -1 on an unknown
    * filter type / overrun.
    */
  private def unfilterInto(raster: Array[Byte], off: Int, rowb: Int,
      ph: Int, acc: Array[Long]): Int = {
    if (off + ph.toLong * (rowb + 1) > raster.length) return -1
    val prev = new Array[Int](rowb)
    val cur = new Array[Int](rowb)
    java.util.Arrays.fill(prev, 0)
    var y = 0
    while (y < ph) {
      val base = off + y * (rowb + 1)
      val ft = raster(base) & 0xFF
      if (ft > 4) return -1
      var j = 0
      while (j < rowb) {
        val x = raster(base + 1 + j) & 0xFF
        val a = if (j >= 3) cur(j - 3) else 0
        val b = if (y > 0) prev(j) else 0
        val c = if (y > 0 && j >= 3) prev(j - 3) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        val v = (x + pred) & 0xFF
        cur(j) = v
        j % 3 match {
          case 0 => acc(0) += v
          case 1 => acc(1) += v
          case 2 => acc(2) += v
        }
        if (v > acc(3)) acc(3) = v
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowb)
      y += 1
    }
    off + ph * (rowb + 1)
  }

  /** (n_pixels, sum_r, sum_g, sum_b, peak_byte) over the unfiltered
    * raster, or null when the geometry is wrong or a scanline carries
    * an unknown filter type. `geom` = [w, h, interlace] (a 2-element
    * geom means non-interlaced — the pre-r13 call shape).
    *
    * Interlace 1 = Adam7 (r13): seven sub-images, each filtered
    * INDEPENDENTLY (a pass's scanlines predict only from that pass's
    * previous scanline — PNG spec §8.2); channel statistics are
    * placement-independent, so the walk unfilters pass-by-pass and
    * accumulates without materializing the de-interlaced raster.
    */
  def stats(raster: Array[Byte], geom: ArrayData): ArrayData = {
    var i = 0
    while (i < 2) { if (geom.isNullAt(i)) return null; i += 1 }
    // header dimensions are ATTACKER-CONTROLLED: bound them before any
    // narrowing or multiplication so a 2³²+5 width cannot truncate to
    // a "valid" 5 or wrap the length check (2²⁰ px/side is far beyond
    // any raster the inflate budget admits anyway)
    val wL = geom.getLong(0)
    val hL = geom.getLong(1)
    if (wL <= 0 || hL <= 0 || wL > (1L << 20) || hL > (1L << 20)) return null
    val interlace =
      if (geom.numElements() > 2 && !geom.isNullAt(2)) geom.getLong(2) else 0L
    val w = wL.toInt
    val h = hL.toInt
    val acc = Array(0L, 0L, 0L, 0L)
    if (interlace == 0L) {
      val rowb = 3 * w
      if (raster.length.toLong != (rowb + 1L) * h) return null
      if (unfilterInto(raster, 0, rowb, h, acc) < 0) return null
    } else if (interlace == 1L) {
      var off = 0
      var p = 0
      while (p < 7) {
        val (x0, y0, dx, dy) = Adam7(p)
        val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
        val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
        if (pw > 0 && ph > 0) {
          off = unfilterInto(raster, off, 3 * pw, ph, acc)
          if (off < 0) return null
        }
        p += 1
      }
      if (off != raster.length) return null // trailing garbage
    } else return null
    new GenericArrayData(Array(w.toLong * h, acc(0), acc(1), acc(2), acc(3)))
  }
}

/** PNG FORWARD adaptive filtering — the synthesis inverse of
  * [[PngFilterKernel]], and the codegen upgrade of the 7-pass HOF
  * expression tree that used to build the gate corpus's filtered
  * rasters in `PngPixels.synthFromDocs` (interpreted, and past the
  * codegen size limit on the Adam7 lane). Filtering predicts each
  * byte from its RAW neighbors (PNG spec §9 — encoders filter against
  * decoded values), so the whole raster is one linear pass over the
  * pixel array; the per-row filter type is `(t0 + y) % 5` (sequential
  * layout) or `(t0 + pass + y) % 5` (Adam7), the synthesis corpus's
  * deterministic all-five-filters schedule.
  */
object PngForwardKernel {
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Forward-filter one sub-image (`pw`×`ph` pixels sampled from the
    * full `w`-wide raster at origin (`x0`,`y0`) step (`dx`,`dy`)) into
    * `out` at `outOff`; row `y`'s filter type is `(tBase + y) mod 5`.
    * Returns the offset past the written bytes.
    */
  private def filterInto(pix: Array[Byte], out: Array[Byte], outOff: Int,
      tBase: Long, w: Int, x0: Int, y0: Int, dx: Int, dy: Int,
      pw: Int, ph: Int): Int = {
    val rowb = 3 * pw
    var off = outOff
    var yp = 0
    while (yp < ph) {
      val ft = java.lang.Math.floorMod(tBase + yp, 5L).toInt
      out(off) = ft.toByte
      val rowBase = (y0 + yp * dy) * w
      val prevBase = (y0 + (yp - 1) * dy) * w
      var j = 0
      while (j < rowb) {
        val xp = j / 3
        val ch = j % 3
        val xFull = x0 + xp * dx
        val raw = pix((rowBase + xFull) * 3 + ch) & 0xFF
        val a = if (j >= 3) pix((rowBase + xFull - dx) * 3 + ch) & 0xFF else 0
        val b = if (yp >= 1) pix((prevBase + xFull) * 3 + ch) & 0xFF else 0
        val c = if (yp >= 1 && j >= 3)
          pix((prevBase + xFull - dx) * 3 + ch) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ =>
            val p = a + b - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        out(off + 1 + j) = ((raw - pred) & 0xFF).toByte
        j += 1
      }
      off += 1 + rowb
      yp += 1
    }
    off
  }

  /** Filtered raster bytes for a 3·w·h RGB8 pixel array under
    * `geom` = [w, h, t0, interlace] (interlace 0 = sequential
    * scanlines, 1 = Adam7's seven independently-filtered passes), or
    * null on any geometry violation — same never-throw contract as
    * every other byte-walk kernel here.
    */
  def forward(pix: Array[Byte], geom: ArrayData): Array[Byte] = {
    var i = 0
    while (i < 4) { if (geom.isNullAt(i)) return null; i += 1 }
    val wL = geom.getLong(0)
    val hL = geom.getLong(1)
    val t0 = geom.getLong(2)
    val interlace = geom.getLong(3)
    if (wL <= 0 || hL <= 0 || wL > (1L << 20) || hL > (1L << 20)) return null
    if (3L * wL * hL != pix.length) return null
    val w = wL.toInt
    val h = hL.toInt
    if (interlace == 0L) {
      val out = new Array[Byte]((3 * w + 1) * h)
      filterInto(pix, out, 0, t0, w, 0, 0, 1, 1, w, h)
      out
    } else if (interlace == 1L) {
      var outLen = 0
      var p = 0
      while (p < 7) {
        val (x0, y0, dx, dy) = Adam7(p)
        val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
        val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
        if (pw > 0 && ph > 0) outLen += (3 * pw + 1) * ph
        p += 1
      }
      val out = new Array[Byte](outLen)
      var off = 0
      p = 0
      while (p < 7) {
        val (x0, y0, dx, dy) = Adam7(p)
        val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
        val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
        if (pw > 0 && ph > 0)
          off = filterInto(pix, out, off, t0 + p, w, x0, y0, dx, dy, pw, ph)
        p += 1
      }
      out
    } else null
  }
}

/** `png_forward_filter(pixels, [w, h, t0, interlace]) → binary`
  * filtered raster — see [[PngForwardKernel.forward]].
  */
case class PngForwardFilter(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "png_forward_filter"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, array<long> geometry), got $other")
    }

  override def nullSafeEval(d: Any, g: Any): Any =
    PngForwardKernel.forward(d.asInstanceOf[Array[Byte]],
      g.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, g) => s"""
      |${ev.value} = graft.expressions.PngForwardKernel.forward($d, $g);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** `png_filtered_stats(raster, [w, h]) → array<long>` of (n_pixels,
  * sum_r, sum_g, sum_b, peak_byte) with full adaptive-filter
  * reconstruction — see [[PngFilterKernel.stats]].
  */
case class PngFilteredStats(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "png_filtered_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, array<long> geometry), got $other")
    }

  override def nullSafeEval(d: Any, g: Any): Any =
    PngFilterKernel.stats(d.asInstanceOf[Array[Byte]], g.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, g) => s"""
      |${ev.value} = graft.expressions.PngFilterKernel.stats($d, $g);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
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
