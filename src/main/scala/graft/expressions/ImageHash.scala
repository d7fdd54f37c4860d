package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Perceptual image hash (dHash) — the operator that connects the
  * codec kernels to the dedup family: training-data image curation
  * dedups on CONTENT, not bytes (the same photo re-encoded, resized,
  * or metadata-stripped must collide), and difference hashing is the
  * standard cheap fingerprint: decode → luma → average-pool onto a
  * 9×8 grid → 64 horizontal gradient bits. Near-dup images differ in
  * a few bits (Hamming), exact re-encodes collide exactly — so the
  * whole existing dedup/Hamming toolchain applies unchanged
  * downstream.
  *
  * Routes by magic bytes: baseline/progressive JPEG (through the full
  * [[JpegDecodeKernel]] entropy decode), uncompressed 24-bit BMP
  * (stride walk, bottom-up or top-down), and — r15 — lossless WebP
  * (through the full [[Vp8lKernel]] VP8L decode) and baseline-profile
  * TIFF (through the full [[TiffPixelKernel]] strip/tile decode, in
  * the upright tag-274 frame), so a photo re-encoded across the codec
  * divide still collides. Null (never a throw) for anything else —
  * the triage signal for "fingerprint elsewhere".
  *
  * Determinism: integer luma (ITU-R 601 weights, /1000 floor),
  * integer cell means (floor), strict `>` gradient — a pure function
  * of the decoded raster, identical on every engine that decodes the
  * same pixels.
  */
object ImageHashKernel {

  /** Average-pool `gray` (w×h, row-major) onto a 9×8 grid and emit
    * the 64 gradient bits; bit (cy·8 + cx) = cell(cx,cy) > cell(cx+1,cy).
    */
  private def dhashOfGray(gray: Array[Int], w: Int, h: Int): Long = {
    val cells = new Array[Long](72) // 9 cols × 8 rows: integer means
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
      var cx = 0
      while (cx < 9) {
        val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
        var s = 0L
        var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += gray(y * w + x); n += 1; x += 1 }
          y += 1
        }
        cells(cy * 9 + cx) = if (n == 0) 0L else s / n
        cx += 1
      }
      cy += 1
    }
    var bits = 0L
    var b = 0
    while (b < 64) {
      val cyi = b >> 3; val cxi = b & 7
      if (cells(cyi * 9 + cxi) > cells(cyi * 9 + cxi + 1)) bits |= 1L << b
      b += 1
    }
    bits
  }

  private def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  private def u32le(p: Array[Byte], off: Int): Long =
    (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)

  /** 24-bit uncompressed BMP raster → gray, or null. */
  private def bmpGray(p: Array[Byte]): (Array[Int], Int, Int) = {
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return null
    val dataOff = u32le(p, 10)
    val w = u32le(p, 18).toInt
    val hRaw = u32le(p, 22).toInt
    val bpp = ((p(28) & 0xFF) | ((p(29) & 0xFF) << 8))
    val comp = u32le(p, 30)
    if (bpp != 24 || comp != 0L || w <= 0 || hRaw == 0) return null
    val h = math.abs(hRaw)
    if (w.toLong * h > JpegDecodeKernel.MaxPixels) return null
    val stride = (w * 3 + 3) / 4 * 4
    if (dataOff + stride.toLong * h > p.length) return null
    val gray = new Array[Int](w * h)
    var row = 0
    while (row < h) {
      // bottom-up unless height is negative (top-down)
      val srcRow = if (hRaw > 0) h - 1 - row else row
      val base = dataOff.toInt + srcRow * stride
      var x = 0
      while (x < w) {
        val b = p(base + 3 * x) & 0xFF
        val g = p(base + 3 * x + 1) & 0xFF
        val r = p(base + 3 * x + 2) & 0xFF
        gray(row * w + x) = luma(r, g, b)
        x += 1
      }
      row += 1
    }
    (gray, w, h)
  }

  private def grayOf(w: Int, h: Int, px: Array[Int]): Array[Int] = {
    val gray = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      gray(i) = luma((px(i) >> 16) & 0xFF, (px(i) >> 8) & 0xFF, px(i) & 0xFF)
      i += 1
    }
    gray
  }

  /** Apply an EXIF orientation (1-8) to a decoded raster: returns the
    * UPRIGHT gray array and its dims, so mirrored/rotated re-posts of
    * the same photo hash identically (r15). The eight dihedral
    * inverse maps follow the public EXIF definitions (value = the
    * transform that makes the stored image upright); 5-8 swap dims.
    */
  private def orientedGray(w: Int, h: Int, px: Array[Int],
      o: Int): (Array[Int], Int, Int) = {
    if (o <= 1 || o > 8) return (grayOf(w, h, px), w, h)
    val swap = o >= 5
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    val gray = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val src = o match {
          case 2 => y * w + (w - 1 - x)
          case 3 => (h - 1 - y) * w + (w - 1 - x)
          case 4 => (h - 1 - y) * w + x
          case 5 => x * w + y
          case 6 => (h - 1 - x) * w + y
          case 7 => (h - 1 - x) * w + (w - 1 - y)
          case _ => x * w + (w - 1 - y) // 8
        }
        val v = px(src)
        gray(y * ow + x) = luma((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)
        x += 1
      }
      y += 1
    }
    (gray, ow, oh)
  }

  /** dHash of a JPEG, 24-bit BMP, or lossless-WebP payload, or null.
    * JPEGs are hashed in their UPRIGHT (EXIF-oriented) frame.
    */
  def dhash(p: Array[Byte]): java.lang.Long = {
    if (p.length >= 3 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8 &&
        (p(2) & 0xFF) == 0xFF) {
      val d = JpegDecodeKernel.decodePixels(p)
      if (d == null) return null
      val (w, h, px) = d
      val (gray, ow, oh) = orientedGray(w, h, px,
        JpegExifKernel.orientationOf(p))
      java.lang.Long.valueOf(dhashOfGray(gray, ow, oh))
    } else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'E' && p(10) == 'B' &&
        p(11) == 'P') {
      val d = Vp8lKernel.decodePixels(p)
      if (d == null) return null
      val (w, h, px) = d
      java.lang.Long.valueOf(dhashOfGray(grayOf(w, h, px), w, h))
    } else if (TiffMetaKernel.isTiff(p)) {
      // r15: baseline-profile TIFF through the full strip/tile decode
      // (LZW/PackBits/Deflate/predictor), hashed in the UPRIGHT frame
      // (tag 274 — TIFF carries the same orientation field EXIF does)
      val d = TiffPixelKernel.decodePixels(p)
      if (d == null) return null
      val (w, h, px) = d
      val (gray, ow, oh) = orientedGray(w, h, px,
        TiffPixelKernel.orientationOf(p))
      java.lang.Long.valueOf(dhashOfGray(gray, ow, oh))
    } else {
      val bg = bmpGray(p)
      if (bg == null) null
      else java.lang.Long.valueOf(dhashOfGray(bg._1, bg._2, bg._3))
    }
  }
}

/** `image_dhash(payload) → bigint` — 64-bit perceptual difference
  * hash over the DECODED raster (JPEG / 24-bit BMP); see
  * [[ImageHashKernel.dhash]].
  */
case class ImageDhash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_dhash"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any = {
    val v = ImageHashKernel.dhash(d.asInstanceOf[Array[Byte]])
    if (v == null) null else v.longValue()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |java.lang.Long gdh = graft.expressions.ImageHashKernel.dhash($d);
      |if (gdh == null) { ${ev.isNull} = true; } else { ${ev.value} = gdh.longValue(); }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
