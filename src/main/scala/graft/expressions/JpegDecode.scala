package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Baseline-JPEG pixel-statistics kernel — the FOURTH real
  * compressed-stream decode in the engine (zlib/DEFLATE for PNG, PCM
  * for WAV, LZW for GIF, Huffman-coded DCT here): walks the marker
  * stream (DQT/DHT/DRI/SOF0/SOS), entropy-decodes every MCU (canonical
  * Huffman over the stuffed bitstream, DC prediction, AC
  * run-length/EOB, restart markers), dequantizes, runs the full 8×8
  * integer inverse DCT, and converts YCbCr→RGB — accumulating channel
  * sums and the peak byte per MCU region, so the raster is never
  * materialized beyond one ≤16×16 MCU tile.
  *
  * The arithmetic deliberately follows the public libjpeg conventions
  * bit for bit — the Loeffler "islow" integer IDCT (CONST_BITS 13 /
  * PASS1_BITS 2 descaling) and the SCALEBITS-16 fixed-point YCbCr→RGB
  * tables — so decoded samples are byte-identical to what libjpeg
  * (and therefore `javax.imageio`) produces — for 1×1-sampled scans
  * AND, since r14, for subsampled ones: chroma reconstruction is
  * libjpeg's "fancy" triangular filter (jdsample.c h2v1/h2v2
  * arithmetic bit for bit, edge replication included), so 4:2:0 and
  * 4:2:2 decodes are sample-exact on gradients, not just flat tiles;
  * CodecConformanceSpec pins the equivalence against real ImageIO
  * encodes per-pixel. Subsampled scans collect downsampled component
  * planes for the upsample pass (≤ 2·w·h bytes, bomb-guard-bounded);
  * 1×1 scans keep the per-MCU streaming emit.
  *
  * Supported: 8-bit precision, SOF0/SOF1 single-scan sequential,
  * grayscale or 3-component YCbCr, component sampling factors in
  * {1,2}, restart intervals, multi-table DQT/DHT segments. Null
  * (never an exception, never unbounded memory) on anything else:
  * progressive (SOF2+), arithmetic coding, 12-bit, CMYK, truncated or
  * corrupt streams, or an image area beyond the bomb guard.
  */
object JpegDecodeKernel {
  val MaxPixels: Long = 1L << 22

  // natural-order index for each zigzag position
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // islow IDCT constants: FIX(x) at CONST_BITS = 13
  private final val CB = 13 // CONST_BITS
  private final val PB = 2 // PASS1_BITS
  private final val F_0_298631336 = 2446
  private final val F_0_390180644 = 3196
  private final val F_0_541196100 = 4433
  private final val F_0_765366865 = 6270
  private final val F_0_899976223 = 7373
  private final val F_1_175875602 = 9633
  private final val F_1_501321110 = 12299
  private final val F_1_847759065 = 15137
  private final val F_1_961570560 = 16069
  private final val F_2_053119869 = 16819
  private final val F_2_562915447 = 20995
  private final val F_3_072711026 = 25172

  // YCbCr→RGB fixed point: FIX(x) at SCALEBITS = 16
  private final val FIX_1_40200 = 91881
  private final val FIX_0_34414 = 22554
  private final val FIX_0_71414 = 46802
  private final val FIX_1_77200 = 116130

  private def descale(x: Long, n: Int): Int = ((x + (1L << (n - 1))) >> n).toInt

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Fancy (triangular) upsample + YCbCr→RGB emit over full
    * DOWNSAMPLED component sample planes — the r14 replacement for
    * sample replication on subsampled scans, following the public
    * libjpeg jdsample.c arithmetic bit for bit so 4:2:0/4:2:2 decodes
    * are libjpeg-exact on gradients, not just flat tiles:
    *
    *  - 2h×1v (4:2:2): `h2v1_fancy_upsample` — 3/4·nearer + 1/4
    *    ·further per output column, edge columns copied, the +1/+2
    *    alternating rounding exactly as jdsample.c writes it;
    *  - 2h×2v (4:2:0): `h2v2_fancy_upsample` — vertical 3:1 column
    *    sums against the nearer neighbor row (above for even output
    *    rows, below for odd; edge rows duplicated), then the same
    *    3:1 horizontal pass over the sums with +8/+7 rounding;
    *  - 1h×2v: `int_upsample` replication (libjpeg applies no fancy
    *    filter to this shape either);
    *  - 1h×1v: direct.
    *
    * `samp(c)` holds component `c`'s downsampled samples row-major at
    * `cW(c)`×`cH(c)` (REAL dims — block padding already clipped, so
    * edge replication sees the true boundary sample, as libjpeg's
    * downsampled_width does). Accumulates channel sums + peak into
    * `acc` = [sr, sg, sb, peak] and fills `fill` when its length is
    * exactly w·h.
    */
  private def emitUpsampled(samp: Array[Array[Byte]], cW: Array[Int],
      cH: Array[Int], he: Array[Int], ve: Array[Int], w: Int, h: Int,
      fill: Array[Int], acc: Array[Long]): Unit = {
    val rowBuf = Array.tabulate(3)(c => new Array[Int](2 * cW(c) + 2))
    val colsum = new Array[Int](
      math.max(cW(0), math.max(cW(1), cW(2))) + 1)
    val doFill = fill != null && fill.length == w * h
    var sr = 0L; var sg = 0L; var sb = 0L
    var peak = acc(3)
    var y = 0
    while (y < h) {
      var c = 0
      while (c < 3) {
        val cw = cW(c); val chh = cH(c)
        val plane = samp(c)
        val buf = rowBuf(c)
        if (he(c) == 1) {
          // full horizontal resolution: direct row (vertical 2× is
          // libjpeg int_upsample = replication)
          val iy = if (ve(c) == 1) y else y >> 1
          val base = math.min(iy, chh - 1) * cw
          var k = 0
          while (k < cw) { buf(k) = plane(base + k) & 0xFF; k += 1 }
        } else if (ve(c) == 1) {
          // h2v1: libjpeg selects the fancy upsampler only when
          // downsampled_width > 2 (jdsample start_pass) and falls
          // back to plain replication for narrower planes — pinned
          // sample-exact against the JDK's own libjpeg on tiny
          // widths in CodecConformanceSpec (r15)
          val base = math.min(y, chh - 1) * cw
          if (cw <= 2) {
            var k = 0
            while (k < cw) {
              val s = plane(base + k) & 0xFF
              buf(2 * k) = s; buf(2 * k + 1) = s
              k += 1
            }
          } else {
            var k = 0
            while (k < cw) {
              val s = plane(base + k) & 0xFF
              buf(2 * k) =
                if (k == 0) s
                else (3 * s + (plane(base + k - 1) & 0xFF) + 1) >> 2
              buf(2 * k + 1) =
                if (k == cw - 1) s
                else (3 * s + (plane(base + k + 1) & 0xFF) + 2) >> 2
              k += 1
            }
          }
        } else if (cw <= 2) {
          // h2v2 on a ≤2-wide chroma plane: libjpeg's same
          // downsampled_width > 2 guard selects h2v2_upsample —
          // replication in BOTH directions (no vertical blend)
          val base = math.min(y >> 1, chh - 1) * cw
          var k = 0
          while (k < cw) {
            val s = plane(base + k) & 0xFF
            buf(2 * k) = s; buf(2 * k + 1) = s
            k += 1
          }
        } else {
          // h2v2 fancy
          val cyN = math.min(y >> 1, chh - 1)
          var cyF = if ((y & 1) == 0) cyN - 1 else cyN + 1
          if (cyF < 0) cyF = 0
          if (cyF > chh - 1) cyF = chh - 1
          val bN = cyN * cw; val bF = cyF * cw
          var k = 0
          while (k < cw) {
            colsum(k) = 3 * (plane(bN + k) & 0xFF) + (plane(bF + k) & 0xFF)
            k += 1
          }
          buf(0) = (colsum(0) * 4 + 8) >> 4
          buf(1) = (colsum(0) * 3 + colsum(1) + 7) >> 4
          k = 1
          while (k < cw - 1) {
            buf(2 * k) = (colsum(k) * 3 + colsum(k - 1) + 8) >> 4
            buf(2 * k + 1) = (colsum(k) * 3 + colsum(k + 1) + 7) >> 4
            k += 1
          }
          buf(2 * (cw - 1)) = (colsum(cw - 1) * 3 + colsum(cw - 2) + 8) >> 4
          buf(2 * (cw - 1) + 1) = (colsum(cw - 1) * 4 + 7) >> 4
        }
        c += 1
      }
      val ry = rowBuf(0); val rcb = rowBuf(1); val rcr = rowBuf(2)
      var x = 0
      while (x < w) {
        val ys = ry(x)
        val cb = rcb(x) - 128
        val cr = rcr(x) - 128
        val r = clamp255(ys + ((FIX_1_40200 * cr + 32768) >> 16))
        val g = clamp255(ys + ((-FIX_0_34414 * cb - FIX_0_71414 * cr + 32768) >> 16))
        val bl = clamp255(ys + ((FIX_1_77200 * cb + 32768) >> 16))
        sr += r; sg += g; sb += bl
        if (r > peak) peak = r
        if (g > peak) peak = g
        if (bl > peak) peak = bl
        if (doFill) fill(y * w + x) = (r << 16) | (g << 8) | bl
        x += 1
      }
      y += 1
    }
    acc(0) += sr; acc(1) += sg; acc(2) += sb; acc(3) = peak
  }

  /** Copy one IDCT'd block's in-bounds samples into a downsampled
    * component plane (block grid may be MCU-padded past the real
    * component dims — padding is clipped, never stored).
    */
  private def storeBlock(block: Array[Int], plane: Array[Byte],
      bx: Int, by: Int, cw: Int, chh: Int): Unit = {
    val x0 = bx * 8; val y0 = by * 8
    var r = 0
    while (r < 8 && y0 + r < chh) {
      val rowBase = (y0 + r) * cw
      var cc = 0
      while (cc < 8 && x0 + cc < cw) {
        plane(rowBase + x0 + cc) = block(r * 8 + cc).toByte
        cc += 1
      }
      r += 1
    }
  }

  /** Full 2-D islow inverse DCT of one block. `coef` natural order,
    * already dequantized; `out` receives 64 samples in [0,255]
    * (+128 level un-shift and range limit applied).
    */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val ws = new Array[Int](64)
    // pass 1: columns
    var c = 0
    while (c < 8) {
      if (coef(8 + c) == 0 && coef(16 + c) == 0 && coef(24 + c) == 0 &&
          coef(32 + c) == 0 && coef(40 + c) == 0 && coef(48 + c) == 0 &&
          coef(56 + c) == 0) {
        val dc = coef(c) << PB
        var r = 0
        while (r < 8) { ws(8 * r + c) = dc; r += 1 }
      } else {
        var z2 = coef(16 + c).toLong
        var z3 = coef(48 + c).toLong
        var z1 = (z2 + z3) * F_0_541196100
        val t2 = z1 + z3 * (-F_1_847759065)
        val t3 = z1 + z2 * F_0_765366865
        z2 = coef(c).toLong
        z3 = coef(32 + c).toLong
        val t0 = (z2 + z3) << CB
        val t1 = (z2 - z3) << CB
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = coef(56 + c).toLong
        var o1 = coef(40 + c).toLong
        var o2 = coef(24 + c).toLong
        var o3 = coef(8 + c).toLong
        z1 = o0 + o3; z2 = o1 + o2
        z3 = o0 + o2; var z4 = o1 + o3
        val z5 = (z3 + z4) * F_1_175875602
        o0 *= F_0_298631336; o1 *= F_2_053119869
        o2 *= F_3_072711026; o3 *= F_1_501321110
        z1 *= -F_0_899976223; z2 *= -F_2_562915447
        z3 = z3 * (-F_1_961570560) + z5
        z4 = z4 * (-F_0_390180644) + z5
        o0 += z1 + z3; o1 += z2 + z4; o2 += z2 + z3; o3 += z1 + z4
        ws(c) = descale(t10 + o3, CB - PB)
        ws(56 + c) = descale(t10 - o3, CB - PB)
        ws(8 + c) = descale(t11 + o2, CB - PB)
        ws(48 + c) = descale(t11 - o2, CB - PB)
        ws(16 + c) = descale(t12 + o1, CB - PB)
        ws(40 + c) = descale(t12 - o1, CB - PB)
        ws(24 + c) = descale(t13 + o0, CB - PB)
        ws(32 + c) = descale(t13 - o0, CB - PB)
      }
      c += 1
    }
    // pass 2: rows
    var r = 0
    while (r < 8) {
      val b = 8 * r
      var z2 = ws(b + 2).toLong
      var z3 = ws(b + 6).toLong
      var z1 = (z2 + z3) * F_0_541196100
      val t2 = z1 + z3 * (-F_1_847759065)
      val t3 = z1 + z2 * F_0_765366865
      val t0 = (ws(b).toLong + ws(b + 4)) << CB
      val t1 = (ws(b).toLong - ws(b + 4)) << CB
      val t10 = t0 + t3; val t13 = t0 - t3
      val t11 = t1 + t2; val t12 = t1 - t2
      var o0 = ws(b + 7).toLong
      var o1 = ws(b + 5).toLong
      var o2 = ws(b + 3).toLong
      var o3 = ws(b + 1).toLong
      z1 = o0 + o3; z2 = o1 + o2
      z3 = o0 + o2; var z4 = o1 + o3
      val z5 = (z3 + z4) * F_1_175875602
      o0 *= F_0_298631336; o1 *= F_2_053119869
      o2 *= F_3_072711026; o3 *= F_1_501321110
      z1 *= -F_0_899976223; z2 *= -F_2_562915447
      z3 = z3 * (-F_1_961570560) + z5
      z4 = z4 * (-F_0_390180644) + z5
      o0 += z1 + z3; o1 += z2 + z4; o2 += z2 + z3; o3 += z1 + z4
      out(b) = clamp255(descale(t10 + o3, CB + PB + 3) + 128)
      out(b + 7) = clamp255(descale(t10 - o3, CB + PB + 3) + 128)
      out(b + 1) = clamp255(descale(t11 + o2, CB + PB + 3) + 128)
      out(b + 6) = clamp255(descale(t11 - o2, CB + PB + 3) + 128)
      out(b + 2) = clamp255(descale(t12 + o1, CB + PB + 3) + 128)
      out(b + 5) = clamp255(descale(t12 - o1, CB + PB + 3) + 128)
      out(b + 3) = clamp255(descale(t13 + o0, CB + PB + 3) + 128)
      out(b + 4) = clamp255(descale(t13 - o0, CB + PB + 3) + 128)
      r += 1
    }
  }

  /** Canonical Huffman table in the JPEG F.2.2.3 decode form. */
  private final class Huff(bits: Array[Int], val vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = code - 1
        if (bits(l) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  /** Decoder state over the entropy-coded segment: an MSB-first bit
    * reader with 0xFF00 unstuffing; a pending non-stuffing marker
    * stops the stream (restart handling consumes RSTn explicitly).
    */
  private final class Bits(p: Array[Byte], var pos: Int) {
    var buf: Long = 0L
    var cnt: Int = 0
    var bad: Boolean = false

    def need(n: Int): Boolean = {
      while (cnt < n) {
        if (pos >= p.length) { bad = true; return false }
        val b = p(pos) & 0xFF
        if (b == 0xFF) {
          if (pos + 1 >= p.length) { bad = true; return false }
          val m = p(pos + 1) & 0xFF
          if (m == 0x00) {
            buf = (buf << 8) | 0xFF; cnt += 8; pos += 2
          } else { bad = true; return false } // marker mid-scan
        } else {
          buf = (buf << 8) | b; cnt += 8; pos += 1
        }
      }
      true
    }

    def take(n: Int): Int = {
      if (n == 0) return 0
      if (!need(n)) return -1
      cnt -= n
      ((buf >>> cnt) & ((1L << n) - 1)).toInt
    }

    def decode(h: Huff): Int = {
      if (!need(1)) return -1
      var code = take(1)
      var l = 1
      while (code > h.maxCode(l)) {
        val b = take(1)
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
        if (l > 16) { bad = true; return -1 }
      }
      h.vals(h.valPtr(l) + code - h.minCode(l)) & 0xFF
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(n: Int): Boolean = {
      cnt = 0; buf = 0L
      if (pos + 1 >= p.length) return false
      if ((p(pos) & 0xFF) != 0xFF || (p(pos + 1) & 0xFF) != (0xD0 + n)) return false
      pos += 2
      true
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def u16(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xFF) << 8) | (p(off + 1) & 0xFF)

  /** Core decode: accumulates channel sums and the peak inline (no
    * per-pixel indirection), optionally filling `fill` (length w·h,
    * packed 0xRRGGBB, row-major) when non-null and correctly sized.
    * Returns (w, h, sum_r, sum_g, sum_b, peak) or null.
    */
  private def decode(p: Array[Byte], fill: Array[Int]): Array[Long] = {
    if (p.length < 4) return null
    if ((p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) return null
    var pos = 2
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var ri = 0
    var w = 0; var h = 0; var ncomp = 0
    // per component: sampling h, v, quant id; then SOS: dc id, ac id
    val ch = new Array[Int](4); val cv = new Array[Int](4); val cq = new Array[Int](4)
    val cdc = new Array[Int](4); val cac = new Array[Int](4)
    var haveSof = false
    var sosAt = -1

    while (sosAt < 0) {
      if (pos + 1 >= p.length) return null
      if ((p(pos) & 0xFF) != 0xFF) return null
      var marker = p(pos + 1) & 0xFF
      pos += 2
      while (marker == 0xFF) { // fill bytes before a marker are legal
        if (pos >= p.length) return null
        marker = p(pos) & 0xFF
        pos += 1
      }
      marker match {
        case 0xD8 => // stray SOI
        case 0xD9 => return null // EOI before any scan
        case 0xC0 | 0xC1 => // baseline / extended sequential Huffman
          if (pos + 1 >= p.length) return null
          val len = u16(p, pos)
          if (pos + len > p.length || len < 8) return null
          val prec = p(pos + 2) & 0xFF
          h = u16(p, pos + 3)
          w = u16(p, pos + 5)
          ncomp = p(pos + 7) & 0xFF
          if (prec != 8 || w <= 0 || h <= 0) return null
          if (ncomp != 1 && ncomp != 3) return null
          if (w.toLong * h > MaxPixels) return null
          if (len != 8 + 3 * ncomp) return null
          var i = 0
          while (i < ncomp) {
            val sf = p(pos + 9 + 3 * i) & 0xFF
            ch(i) = sf >> 4; cv(i) = sf & 0x0F
            cq(i) = p(pos + 10 + 3 * i) & 0xFF
            if (ch(i) < 1 || ch(i) > 2 || cv(i) < 1 || cv(i) > 2 || cq(i) > 3)
              return null
            i += 1
          }
          haveSof = true
          pos += len
        case m if (m >= 0xC2 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) =>
          return null // progressive / arithmetic / lossless
        case 0xC4 => // DHT: one or more tables
          if (pos + 1 >= p.length) return null
          val len = u16(p, pos)
          if (pos + len > p.length) return null
          var q = pos + 2
          val end = pos + len
          while (q < end) {
            if (q + 17 > end) return null
            val tc = (p(q) & 0xF0) >> 4
            val th = p(q) & 0x0F
            if (tc > 1 || th > 3) return null
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = p(q + l) & 0xFF; total += bits(l); l += 1 }
            if (total > 256 || q + 17 + total > end) return null
            val vals = new Array[Byte](total)
            System.arraycopy(p, q + 17, vals, 0, total)
            val tab = new Huff(bits, vals)
            if (tc == 0) dcT(th) = tab else acT(th) = tab
            q += 17 + total
          }
          pos += len
        case 0xDB => // DQT: one or more tables
          if (pos + 1 >= p.length) return null
          val len = u16(p, pos)
          if (pos + len > p.length) return null
          var q = pos + 2
          val end = pos + len
          while (q < end) {
            val pq = (p(q) & 0xF0) >> 4
            val tq = p(q) & 0x0F
            if (pq > 1 || tq > 3) return null
            val n = if (pq == 0) 64 else 128
            if (q + 1 + n > end) return null
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) {
              val v = if (pq == 0) p(q + 1 + k) & 0xFF
                else u16(p, q + 1 + 2 * k)
              t(Zigzag(k)) = v
              k += 1
            }
            qt(tq) = t
            q += 1 + n
          }
          pos += len
        case 0xDD => // DRI
          if (pos + 3 >= p.length) return null
          if (u16(p, pos) != 4) return null
          ri = u16(p, pos + 2)
          pos += 4
        case 0xDA => // SOS
          if (!haveSof) return null
          if (pos + 1 >= p.length) return null
          val len = u16(p, pos)
          if (pos + len > p.length) return null
          val ns = p(pos + 2) & 0xFF
          if (ns != ncomp) return null // multi-scan sequential unsupported
          if (len != 6 + 2 * ns) return null
          var i = 0
          while (i < ns) {
            // components must appear in frame order (our corpus and
            // every JFIF writer does this; reordering → null)
            val tabs = p(pos + 4 + 2 * i) & 0xFF
            cdc(i) = tabs >> 4; cac(i) = tabs & 0x0F
            if (cdc(i) > 3 || cac(i) > 3) return null
            i += 1
          }
          sosAt = pos + len
        case m if m >= 0xD0 && m <= 0xD7 => return null // RST outside scan
        case _ => // APPn / COM / others: length-skipped
          if (pos + 1 >= p.length) return null
          val len = u16(p, pos)
          if (len < 2 || pos + len > p.length) return null
          pos += len
      }
    }

    // validate tables referenced by the scan
    var i = 0
    while (i < ncomp) {
      if (qt(cq(i)) == null || dcT(cdc(i)) == null || acT(cac(i)) == null)
        return null
      i += 1
    }
    var hmax = 1; var vmax = 1
    i = 0
    while (i < ncomp) {
      if (ch(i) > hmax) hmax = ch(i)
      if (cv(i) > vmax) vmax = cv(i)
      i += 1
    }
    if (ncomp == 1) { hmax = 1; vmax = 1; ch(0) = 1; cv(0) = 1 }
    val mcuW = 8 * hmax; val mcuH = 8 * vmax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    // subsampled scans collect DOWNSAMPLED planes for the fancy
    // upsample pass (≤ 2·w·h bytes at 4:2:2, bomb-guard-bounded —
    // the price of libjpeg-exact gradients, r14); 1×1 scans keep the
    // per-MCU streaming emit
    val he = new Array[Int](3); val ve = new Array[Int](3)
    var needUp = false
    i = 0
    while (i < ncomp) {
      he(i) = hmax / ch(i); ve(i) = vmax / cv(i)
      if (he(i) != 1 || ve(i) != 1) needUp = true
      i += 1
    }
    val cWd = new Array[Int](3); val cHd = new Array[Int](3)
    val samp = new Array[Array[Byte]](3)
    if (needUp) {
      i = 0
      while (i < ncomp) {
        cWd(i) = (w * ch(i) + hmax - 1) / hmax
        cHd(i) = (h * cv(i) + vmax - 1) / vmax
        samp(i) = new Array[Byte](cWd(i) * cHd(i))
        i += 1
      }
    }

    val bits = new Bits(p, sosAt)
    val pred = new Array[Int](4)
    val coef = new Array[Int](64)
    // per component, per block-in-MCU sample planes
    val planes = Array.tabulate(ncomp)(c => Array.fill(ch(c) * cv(c))(new Array[Int](64)))
    var rstCount = 0
    var rstIdx = 0
    var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0L
    val doFill = fill != null && fill.length == w * h

    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (ri > 0 && rstCount == ri) {
          if (!bits.restart(rstIdx)) return null
          rstIdx = (rstIdx + 1) & 7
          rstCount = 0
          java.util.Arrays.fill(pred, 0)
        }
        var c = 0
        while (c < ncomp) {
          val q = qt(cq(c))
          var b = 0
          while (b < ch(c) * cv(c)) {
            java.util.Arrays.fill(coef, 0)
            val s = bits.decode(dcT(cdc(c)))
            if (s < 0 || s > 15) return null
            val diffBits = bits.take(s)
            if (diffBits < 0 && s > 0) return null
            pred(c) += extend(diffBits, s)
            coef(0) = pred(c) * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = bits.decode(acT(cac(c)))
              if (rs < 0) return null
              val r = rs >> 4; val sz = rs & 0x0F
              if (sz == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                if (k > 63) return null
                val v = bits.take(sz)
                if (v < 0) return null
                coef(Zigzag(k)) = extend(v, sz) * q(Zigzag(k))
                k += 1
              }
            }
            idct(coef, planes(c)(b))
            if (needUp)
              storeBlock(planes(c)(b), samp(c),
                mx * ch(c) + b % ch(c), my * cv(c) + b / ch(c),
                cWd(c), cHd(c))
            b += 1
          }
          c += 1
        }
        rstCount += 1
        if (!needUp) {
          // emit the MCU's in-bounds pixels
          val x0 = mx * mcuW; val y0 = my * mcuH
          val xMax = math.min(mcuW, w - x0)
          val yMax = math.min(mcuH, h - y0)
          var py = 0
          while (py < yMax) {
            var px = 0
            while (px < xMax) {
              var r = 0; var g = 0; var bl = 0
              if (ncomp == 1) {
                val v = planes(0)(0)((py & 7) * 8 + (px & 7)) // hmax=vmax=1
                r = v; g = v; bl = v
              } else {
                // all factors equal here (needUp covers every he/ve≠1)
                val y = planes(0)((py >> 3) * ch(0) + (px >> 3))((py & 7) * 8 + (px & 7))
                val cb = planes(1)((py >> 3) * ch(1) + (px >> 3))((py & 7) * 8 + (px & 7)) - 128
                val cr = planes(2)((py >> 3) * ch(2) + (px >> 3))((py & 7) * 8 + (px & 7)) - 128
                r = clamp255(y + ((FIX_1_40200 * cr + 32768) >> 16))
                g = clamp255(y + ((-FIX_0_34414 * cb - FIX_0_71414 * cr + 32768) >> 16))
                bl = clamp255(y + ((FIX_1_77200 * cb + 32768) >> 16))
              }
              sr += r; sg += g; sb += bl
              if (r > peak) peak = r
              if (g > peak) peak = g
              if (bl > peak) peak = bl
              if (doFill) fill((y0 + py) * w + (x0 + px)) = (r << 16) | (g << 8) | bl
              px += 1
            }
            py += 1
          }
        }
        mx += 1
      }
      my += 1
    }
    if (needUp) {
      val acc = Array(0L, 0L, 0L, 0L)
      emitUpsampled(samp, cWd, cHd, he, ve, w, h, fill, acc)
      sr = acc(0); sg = acc(1); sb = acc(2); peak = acc(3)
    }
    Array(w.toLong, h.toLong, sr, sg, sb, peak)
  }

  // ------------------------------------------------------------------
  // Progressive (SOF2) decode — r13. A progressive stream carries the
  // SAME DCT coefficients as its baseline re-encode, split across
  // scans: DC and AC bands arrive separately (spectral selection) and
  // each band may arrive high-bits-first (successive approximation,
  // ITU-T T.81 §G; the refinement algorithms below follow the public
  // libjpeg jdphuff.c decode_mcu_DC/AC_first/refine semantics). The
  // decoder accumulates full coefficient planes across scans and runs
  // the SAME dequantize → islow IDCT → YCbCr→RGB pipeline at EOI — so
  // a progressive re-encode of an image decodes to byte-identical
  // samples, which is exactly what lets perceptual dedup collide
  // baseline/progressive pairs (a real corpus is ~10-20% progressive;
  // pre-r13 these nulled and dedup was blind there).

  /** Pixel bomb guard for progressive streams — tighter than the
    * baseline cap because coefficient planes for the WHOLE image must
    * persist across scans (≤ 3·4·w·h bytes at 4:4:4): 2M pixels
    * bounds the transient at ~24 MB per image.
    */
  val MaxProgressivePixels: Long = 1L << 21

  /** The stream's SOF marker (0xC0 baseline … 0xC2 progressive …), or
    * -1 — a cheap marker-walk probe used to dispatch decoders.
    */
  def sofMarker(p: Array[Byte]): Int = {
    if (p.length < 4) return -1
    if ((p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) return -1
    var pos = 2
    while (pos + 1 < p.length) {
      if ((p(pos) & 0xFF) != 0xFF) return -1
      var m = p(pos + 1) & 0xFF
      pos += 2
      while (m == 0xFF) {
        if (pos >= p.length) return -1
        m = p(pos) & 0xFF
        pos += 1
      }
      if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC)
        return m
      m match {
        case 0xD8 => // stray SOI
        case 0xD9 | 0xDA => return -1 // EOI / scan before any SOF
        case x if x >= 0xD0 && x <= 0xD7 => // RST: no length
        case _ =>
          if (pos + 1 >= p.length) return -1
          val len = u16(p, pos)
          if (len < 2 || pos + len > p.length) return -1
          pos += len
      }
    }
    -1
  }

  private def decodeProgressive(p: Array[Byte], fill: Array[Int]): Array[Long] = {
    if (p.length < 4) return null
    if ((p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) return null
    var pos = 2
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var ri = 0
    var w = 0; var h = 0; var ncomp = 0
    val cid = new Array[Int](4)
    val ch = new Array[Int](4); val cv = new Array[Int](4); val cq = new Array[Int](4)
    var hmax = 1; var vmax = 1
    var mcusX = 0; var mcusY = 0
    // per component: padded block grid (MCU-aligned) and REAL block
    // dims (non-interleaved scans iterate only real blocks)
    val bwPad = new Array[Int](4); val bhPad = new Array[Int](4)
    val bwReal = new Array[Int](4); val bhReal = new Array[Int](4)
    var coefs: Array[Array[Int]] = null // natural order, 64 per block
    var nScans = 0
    var eoi = false

    while (!eoi) {
      if (pos + 1 >= p.length) return null
      if ((p(pos) & 0xFF) != 0xFF) return null
      var marker = p(pos + 1) & 0xFF
      pos += 2
      while (marker == 0xFF) {
        if (pos >= p.length) return null
        marker = p(pos) & 0xFF
        pos += 1
      }
      marker match {
        case 0xD8 => // stray SOI
        case 0xD9 => eoi = true
        case 0xC2 => // SOF2: progressive Huffman
          if (coefs != null) return null // second frame
          if (pos + 1 >= p.length) return null
          val len = u16(p, pos)
          if (pos + len > p.length || len < 8) return null
          val prec = p(pos + 2) & 0xFF
          h = u16(p, pos + 3)
          w = u16(p, pos + 5)
          ncomp = p(pos + 7) & 0xFF
          if (prec != 8 || w <= 0 || h <= 0) return null
          if (ncomp != 1 && ncomp != 3) return null
          if (w.toLong * h > MaxProgressivePixels) return null
          if (len != 8 + 3 * ncomp) return null
          var i = 0
          while (i < ncomp) {
            cid(i) = p(pos + 8 + 3 * i) & 0xFF
            val sf = p(pos + 9 + 3 * i) & 0xFF
            ch(i) = sf >> 4; cv(i) = sf & 0x0F
            cq(i) = p(pos + 10 + 3 * i) & 0xFF
            if (ch(i) < 1 || ch(i) > 2 || cv(i) < 1 || cv(i) > 2 || cq(i) > 3)
              return null
            i += 1
          }
          if (ncomp == 1) { ch(0) = 1; cv(0) = 1 }
          hmax = 1; vmax = 1
          i = 0
          while (i < ncomp) {
            if (ch(i) > hmax) hmax = ch(i)
            if (cv(i) > vmax) vmax = cv(i)
            i += 1
          }
          mcusX = (w + 8 * hmax - 1) / (8 * hmax)
          mcusY = (h + 8 * vmax - 1) / (8 * vmax)
          coefs = new Array[Array[Int]](ncomp)
          i = 0
          while (i < ncomp) {
            bwPad(i) = mcusX * ch(i); bhPad(i) = mcusY * cv(i)
            val compW = (w * ch(i) + hmax - 1) / hmax
            val compH = (h * cv(i) + vmax - 1) / vmax
            bwReal(i) = (compW + 7) / 8; bhReal(i) = (compH + 7) / 8
            coefs(i) = new Array[Int](bwPad(i) * bhPad(i) * 64)
            i += 1
          }
          pos += len
        case m if (m >= 0xC0 && m <= 0xCF && m != 0xC2 && m != 0xC4 &&
            m != 0xC8 && m != 0xCC) =>
          return null // any non-progressive frame here → wrong decoder
        case 0xC4 => // DHT (identical to the baseline walk)
          if (pos + 1 >= p.length) return null
          val len = u16(p, pos)
          if (pos + len > p.length) return null
          var q = pos + 2
          val end = pos + len
          while (q < end) {
            if (q + 17 > end) return null
            val tc = (p(q) & 0xF0) >> 4
            val th = p(q) & 0x0F
            if (tc > 1 || th > 3) return null
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = p(q + l) & 0xFF; total += bits(l); l += 1 }
            if (total > 256 || q + 17 + total > end) return null
            val vals = new Array[Byte](total)
            System.arraycopy(p, q + 17, vals, 0, total)
            val tab = new Huff(bits, vals)
            if (tc == 0) dcT(th) = tab else acT(th) = tab
            q += 17 + total
          }
          pos += len
        case 0xDB => // DQT (identical to the baseline walk)
          if (pos + 1 >= p.length) return null
          val len = u16(p, pos)
          if (pos + len > p.length) return null
          var q = pos + 2
          val end = pos + len
          while (q < end) {
            val pq = (p(q) & 0xF0) >> 4
            val tq = p(q) & 0x0F
            if (pq > 1 || tq > 3) return null
            val n = if (pq == 0) 64 else 128
            if (q + 1 + n > end) return null
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) {
              val v = if (pq == 0) p(q + 1 + k) & 0xFF
                else u16(p, q + 1 + 2 * k)
              t(Zigzag(k)) = v
              k += 1
            }
            qt(tq) = t
            q += 1 + n
          }
          pos += len
        case 0xDD => // DRI (may change between scans)
          if (pos + 3 >= p.length) return null
          if (u16(p, pos) != 4) return null
          ri = u16(p, pos + 2)
          pos += 4
        case 0xDA => // SOS: one scan of the progression
          if (coefs == null) return null
          if (pos + 1 >= p.length) return null
          val len = u16(p, pos)
          if (pos + len > p.length) return null
          val ns = p(pos + 2) & 0xFF
          if (ns < 1 || ns > ncomp || len != 6 + 2 * ns) return null
          val scanComp = new Array[Int](ns)
          val scanDc = new Array[Int](ns)
          val scanAc = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val sel = p(pos + 3 + 2 * i) & 0xFF
            var c = -1
            var j = 0
            while (j < ncomp) { if (cid(j) == sel) c = j; j += 1 }
            if (c < 0) return null
            scanComp(i) = c
            val tabs = p(pos + 4 + 2 * i) & 0xFF
            scanDc(i) = tabs >> 4; scanAc(i) = tabs & 0x0F
            if (scanDc(i) > 3 || scanAc(i) > 3) return null
            i += 1
          }
          val ss = p(pos + 3 + 2 * ns) & 0xFF
          val se = p(pos + 4 + 2 * ns) & 0xFF
          val aa = p(pos + 5 + 2 * ns) & 0xFF
          val ah = aa >> 4; val al = aa & 0x0F
          if (ss > 63 || se > 63 || se < ss || al > 13 || ah > 14) return null
          if (ss == 0 && se != 0) return null // DC scan is exactly band 0
          if (ss > 0 && ns != 1) return null // AC scans are single-component
          if (ah != 0 && ah != al + 1) return null // successive approx steps by 1
          val after = decodeScanProgressive(p, pos + len, scanComp, scanDc,
            scanAc, ns, ss, se, ah, al, ri, coefs, dcT, acT,
            ch, cv, bwPad, bwReal, bhReal, mcusX, mcusY)
          if (after < 0) return null
          nScans += 1
          pos = after
        case m if m >= 0xD0 && m <= 0xD7 => return null // RST outside scan
        case _ => // APPn / COM: length-skipped
          if (pos + 1 >= p.length) return null
          val len = u16(p, pos)
          if (len < 2 || pos + len > p.length) return null
          pos += len
      }
    }
    if (coefs == null || nScans == 0) return null
    var i = 0
    while (i < ncomp) {
      if (qt(cq(i)) == null) return null
      i += 1
    }

    // output pass: dequantize + IDCT per MCU, then the SAME emit
    // arithmetic as the baseline path (incl. the r14 fancy-upsample
    // plane pass for subsampled scans — a progressive 4:2:0 re-encode
    // still decodes byte-identical to its baseline twin)
    val coefBuf = new Array[Int](64)
    val planes = Array.tabulate(ncomp)(c =>
      Array.fill(ch(c) * cv(c))(new Array[Int](64)))
    var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0L
    val doFill = fill != null && fill.length == w * h
    val mcuW = 8 * hmax; val mcuH = 8 * vmax
    val he = new Array[Int](3); val ve = new Array[Int](3)
    var needUp = false
    i = 0
    while (i < ncomp) {
      he(i) = hmax / ch(i); ve(i) = vmax / cv(i)
      if (he(i) != 1 || ve(i) != 1) needUp = true
      i += 1
    }
    val cWd = new Array[Int](3); val cHd = new Array[Int](3)
    val samp = new Array[Array[Byte]](3)
    if (needUp) {
      i = 0
      while (i < ncomp) {
        cWd(i) = (w * ch(i) + hmax - 1) / hmax
        cHd(i) = (h * cv(i) + vmax - 1) / vmax
        samp(i) = new Array[Byte](cWd(i) * cHd(i))
        i += 1
      }
    }
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var c = 0
        while (c < ncomp) {
          val q = qt(cq(c))
          var v = 0
          while (v < cv(c)) {
            var u = 0
            while (u < ch(c)) {
              val bi = ((my * cv(c) + v) * bwPad(c) + (mx * ch(c) + u)) * 64
              var k = 0
              while (k < 64) { coefBuf(k) = coefs(c)(bi + k) * q(k); k += 1 }
              idct(coefBuf, planes(c)(v * ch(c) + u))
              if (needUp)
                storeBlock(planes(c)(v * ch(c) + u), samp(c),
                  mx * ch(c) + u, my * cv(c) + v, cWd(c), cHd(c))
              u += 1
            }
            v += 1
          }
          c += 1
        }
        if (!needUp) {
          val x0 = mx * mcuW; val y0 = my * mcuH
          val xMax = math.min(mcuW, w - x0)
          val yMax = math.min(mcuH, h - y0)
          var py = 0
          while (py < yMax) {
            var px = 0
            while (px < xMax) {
              var r = 0; var g = 0; var bl = 0
              if (ncomp == 1) {
                val v = planes(0)(0)((py & 7) * 8 + (px & 7))
                r = v; g = v; bl = v
              } else {
                // all factors equal here (needUp covers every he/ve≠1)
                val y = planes(0)((py >> 3) * ch(0) + (px >> 3))((py & 7) * 8 + (px & 7))
                val cb = planes(1)((py >> 3) * ch(1) + (px >> 3))((py & 7) * 8 + (px & 7)) - 128
                val cr = planes(2)((py >> 3) * ch(2) + (px >> 3))((py & 7) * 8 + (px & 7)) - 128
                r = clamp255(y + ((FIX_1_40200 * cr + 32768) >> 16))
                g = clamp255(y + ((-FIX_0_34414 * cb - FIX_0_71414 * cr + 32768) >> 16))
                bl = clamp255(y + ((FIX_1_77200 * cb + 32768) >> 16))
              }
              sr += r; sg += g; sb += bl
              if (r > peak) peak = r
              if (g > peak) peak = g
              if (bl > peak) peak = bl
              if (doFill) fill((y0 + py) * w + (x0 + px)) = (r << 16) | (g << 8) | bl
              px += 1
            }
            py += 1
          }
        }
        mx += 1
      }
      my += 1
    }
    if (needUp) {
      val acc = Array(0L, 0L, 0L, 0L)
      emitUpsampled(samp, cWd, cHd, he, ve, w, h, fill, acc)
      sr = acc(0); sg = acc(1); sb = acc(2); peak = acc(3)
    }
    Array(w.toLong, h.toLong, sr, sg, sb, peak)
  }

  /** Decode one progressive scan's entropy segment into the
    * coefficient planes. Returns the byte position of the next marker
    * after the scan, or -1 on corrupt data. The four scan kinds
    * (DC/AC × first/refine) follow T.81 §G.2 exactly.
    */
  private def decodeScanProgressive(p: Array[Byte], dataStart: Int,
      scanComp: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
      ns: Int, ss: Int, se: Int, ah: Int, al: Int, ri: Int,
      coefs: Array[Array[Int]], dcT: Array[Huff], acT: Array[Huff],
      ch: Array[Int], cv: Array[Int], bwPad: Array[Int],
      bwReal: Array[Int], bhReal: Array[Int],
      mcusX: Int, mcusY: Int): Int = {
    val bits = new Bits(p, dataStart)
    val p1 = 1 << al
    val m1 = -1 << al
    var eobrun = 0
    var rstCount = 0
    var rstIdx = 0
    val pred = new Array[Int](4)

    def restartIfDue(): Boolean = {
      if (ri > 0 && rstCount == ri) {
        if (!bits.restart(rstIdx)) return false
        rstIdx = (rstIdx + 1) & 7
        rstCount = 0
        eobrun = 0
        java.util.Arrays.fill(pred, 0)
      }
      true
    }

    def dcFirst(c: Int, scanIdx: Int, bi: Int): Boolean = {
      val t = dcT(scanDc(scanIdx))
      if (t == null) return false
      val s = bits.decode(t)
      if (s < 0 || s > 15) return false
      val db = bits.take(s)
      if (db < 0 && s > 0) return false
      pred(c) += extend(db, s)
      coefs(c)(bi) = pred(c) << al
      true
    }

    def dcRefine(c: Int, bi: Int): Boolean = {
      val b = bits.take(1)
      if (b < 0) return false
      if (b != 0) coefs(c)(bi) |= p1
      true
    }

    def acFirst(c: Int, scanIdx: Int, bi: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      val t = acT(scanAc(scanIdx))
      if (t == null) return false
      var k = ss
      while (k <= se) {
        val rs = bits.decode(t)
        if (rs < 0) return false
        val r = rs >> 4; val sz = rs & 0x0F
        if (sz == 0) {
          if (r == 15) k += 16
          else {
            eobrun = (1 << r) - 1
            if (r > 0) {
              val eb = bits.take(r)
              if (eb < 0) return false
              eobrun += eb
            }
            return true
          }
        } else {
          k += r
          if (k > se) return false
          val v = bits.take(sz)
          if (v < 0) return false
          coefs(c)(bi + Zigzag(k)) = extend(v, sz) << al
          k += 1
        }
      }
      true
    }

    def refineBit(c: Int, z: Int): Boolean = {
      val b = bits.take(1)
      if (b < 0) return false
      if (b != 0 && (coefs(c)(z) & p1) == 0)
        coefs(c)(z) += (if (coefs(c)(z) >= 0) p1 else m1)
      true
    }

    def acRefine(c: Int, scanIdx: Int, bi: Int): Boolean = {
      val t = acT(scanAc(scanIdx))
      if (t == null) return false
      var k = ss
      if (eobrun == 0) {
        var ended = false
        while (k <= se && !ended) {
          val rs = bits.decode(t)
          if (rs < 0) return false
          var r = rs >> 4; val sz = rs & 0x0F
          var sval = 0
          if (sz == 0) {
            if (r < 15) {
              // EOB run INCLUDES this block (decremented in the tail
              // after its remaining correction bits — jdphuff.c)
              eobrun = 1 << r
              if (r > 0) {
                val eb = bits.take(r)
                if (eb < 0) return false
                eobrun += eb
              }
              ended = true
            }
            // r == 15: ZRL — skip 16 zero-history positions below
          } else {
            if (sz != 1) return false
            val b = bits.take(1)
            if (b < 0) return false
            sval = if (b != 0) p1 else m1
          }
          if (!ended) {
            var placed = false
            while (k <= se && !placed) {
              val z = bi + Zigzag(k)
              if (coefs(c)(z) != 0) {
                if (!refineBit(c, z)) return false
              } else if (r == 0) {
                if (sval != 0) coefs(c)(z) = sval
                placed = true
              } else r -= 1
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          val z = bi + Zigzag(k)
          if (coefs(c)(z) != 0) {
            if (!refineBit(c, z)) return false
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    var ok = true
    if (ss == 0 && ns > 1) {
      // interleaved DC scan: MCU order, every listed component's
      // ch×cv block cluster per MCU (padded grid)
      var my = 0
      while (my < mcusY && ok) {
        var mx = 0
        while (mx < mcusX && ok) {
          if (!restartIfDue()) return -1
          var i = 0
          while (i < ns && ok) {
            val c = scanComp(i)
            var v = 0
            while (v < cv(c) && ok) {
              var u = 0
              while (u < ch(c) && ok) {
                val bi = ((my * cv(c) + v) * bwPad(c) + (mx * ch(c) + u)) * 64
                ok = if (ah == 0) dcFirst(c, i, bi) else dcRefine(c, bi)
                u += 1
              }
              v += 1
            }
            i += 1
          }
          rstCount += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // non-interleaved: the single component's REAL blocks in raster
      // order (T.81 §G.2: one block per "MCU")
      val c = scanComp(0)
      var by = 0
      while (by < bhReal(c) && ok) {
        var bx = 0
        while (bx < bwReal(c) && ok) {
          if (!restartIfDue()) return -1
          val bi = (by * bwPad(c) + bx) * 64
          ok =
            if (ss == 0) { if (ah == 0) dcFirst(c, 0, bi) else dcRefine(c, bi) }
            else { if (ah == 0) acFirst(c, 0, bi) else acRefine(c, 0, bi) }
          rstCount += 1
          bx += 1
        }
        by += 1
      }
    }
    if (!ok || bits.bad) return -1

    // locate the next marker: skip any stuffed/restart bytes the
    // entropy reader left unconsumed
    var q = bits.pos
    while (q + 1 < p.length) {
      if ((p(q) & 0xFF) == 0xFF) {
        val m = p(q + 1) & 0xFF
        if (m == 0x00 || (m >= 0xD0 && m <= 0xD7)) q += 2
        else return q
      } else q += 1
    }
    -1
  }

  /** (n_pixels, sum_r, sum_g, sum_b, peak_byte) over a baseline OR
    * progressive JPEG payload, or null. The SOF marker routes the
    * decoder (one cheap header probe).
    */
  def stats(p: Array[Byte]): ArrayData = {
    val d = if (sofMarker(p) == 0xC2) decodeProgressive(p, null)
            else decode(p, null)
    if (d == null) null
    else new GenericArrayData(Array(d(0) * d(1), d(2), d(3), d(4), d(5)))
  }

  /** (w, h, row-major packed 0xRRGGBB pixels) — spec-level
    * conformance API (pixel-by-pixel comparison against ImageIO) and
    * the dHash feeder. Two passes: a probe for dimensions, then the
    * fill. Routes baseline/progressive by the SOF marker.
    */
  def decodePixels(p: Array[Byte]): (Int, Int, Array[Int]) = {
    val prog = sofMarker(p) == 0xC2
    val probe = if (prog) decodeProgressive(p, null) else decode(p, null)
    if (probe == null) return null
    val w = probe(0).toInt; val h = probe(1).toInt
    val arr = new Array[Int](w * h)
    val second = if (prog) decodeProgressive(p, arr) else decode(p, arr)
    if (second == null) null else (w, h, arr)
  }
}

/** `jpeg_pixel_stats(payload) → array<long>` of (n_pixels, sum_r,
  * sum_g, sum_b, peak_byte) via a full baseline decode — see
  * [[JpegDecodeKernel.stats]].
  */
case class JpegPixelStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_pixel_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    JpegDecodeKernel.stats(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.JpegDecodeKernel.stats($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Flat-tile baseline-JPEG encoder — the synthesis-side inverse of
  * [[JpegDecodeKernel]] (the `ZlibDeflate`/`GifLzwEncoder` convention: test
  * corpora carry REAL compressed payloads): each 8×8 (16×16 for
  * 4:2:0) tile is one flat color given in the YCbCr domain, so every
  * block is DC-only — DC = 8·(v−128) with all-ones quant tables
  * round-trips EXACTLY through any conforming IDCT, which is what
  * lets a SQL oracle recompute the decoded channel sums closed-form.
  * The entropy stream is real Huffman: canonical DC codes (category +
  * magnitude bits, DC prediction), a 1-code AC table holding only
  * EOB, 0xFF byte stuffing, and optional restart markers. The
  * general AC/dictionary path of the DECODER is exercised by the
  * independent encoder in CodecConformanceSpec (ImageIO's writer).
  */
object JpegEncoder {
  // Annex K table K.3 (luminance DC): lengths histogram + 12 categories
  private val DcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity)

  private def canonical(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    // vals(i) → (code, length)
    val out = new Array[(Int, Int)](vals.length)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        out(k) = (code, l)
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    out
  }

  private val DcCodes = canonical(DcBits, DcVals) // index = category
  // AC table: single symbol 0x00 (EOB) with code '0' (1 bit)
  private val AcBits = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  private final class BitSink {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      n += len
      while (n >= 8) {
        val b = ((acc >>> (n - 8)) & 0xFF).toInt
        out.write(b)
        if (b == 0xFF) out.write(0x00) // stuffing
        n -= 8
      }
    }
    def pad(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode a grid of flat tiles. `tiles`: per tile, 1 value (mode 0,
    * grayscale Y) or 3 values y,cb,cr (modes 1=4:4:4, 2=4:2:0), tile
    * raster order. Tile size is 8 px (16 for mode 2); image is
    * exactly `tw`×`th` tiles. `ri` > 0 inserts a DRI segment and a
    * restart marker every `ri` MCUs.
    *
    * `progressive = true` (r13) emits the SAME coefficients as an
    * SOF2 progression — DC first scan at point transform Al=1, a DC
    * refinement scan (Ah=1→Al=0), then one spectral-selection AC scan
    * per component (all-zero here, one EOB code per block) — so the
    * decoded image is BIT-identical to the baseline lane and a
    * closed-form oracle needs no layout awareness at all. Restarts
    * are a baseline-lane feature (`ri` must be 0 when progressive).
    */
  def encodeFlatTiles(tiles: Array[Int], tw: Int, th: Int, mode: Int,
      ri: Int, progressive: Boolean = false, orientation: Int = 0): Array[Byte] = {
    require(mode >= 0 && mode <= 2, s"mode $mode")
    require(!progressive || ri == 0,
      "the progressive synth lane does not emit restart markers")
    require(orientation >= 0 && orientation <= 8, s"orientation $orientation")
    val vals = if (mode == 0) 1 else 3
    require(tiles.length == tw * th * vals,
      s"tiles ${tiles.length} != $tw*$th*$vals")
    val side = if (mode == 2) 16 else 8
    val w = tw * side; val h = th * side
    val ncomp = if (mode == 0) 1 else 3
    val out = new java.io.ByteArrayOutputStream(256 + tiles.length * 4)
    def b(v: Int): Unit = out.write(v & 0xFF)
    def b16(v: Int): Unit = { b(v >> 8); b(v) }
    // SOI, APP0/JFIF
    b(0xFF); b(0xD8)
    b(0xFF); b(0xE0); b16(16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    if (orientation > 0) {
      // APP1 Exif: minimal little-endian TIFF, one IFD0 entry
      // (0x0112 SHORT orientation) — the rotated-re-post lane (r15)
      b(0xFF); b(0xE1); b16(2 + 6 + 26)
      out.write(Array[Byte]('E', 'x', 'i', 'f', 0, 0))
      out.write(Array[Byte]('I', 'I', 42, 0))
      out.write(Array[Byte](8, 0, 0, 0)) // IFD0 at 8
      out.write(Array[Byte](1, 0)) // one entry
      out.write(Array[Byte](0x12, 0x01, 3, 0, 1, 0, 0, 0,
        orientation.toByte, 0, 0, 0))
      out.write(Array[Byte](0, 0, 0, 0)) // next IFD
    }
    // DQT: two all-ones tables in ONE segment (multi-table parse path)
    b(0xFF); b(0xDB); b16(2 + 65 * 2)
    b(0x00); (0 until 64).foreach(_ => b(1))
    b(0x01); (0 until 64).foreach(_ => b(1))
    // DHT: DC0, AC0, DC1, AC1 in one segment
    b(0xFF); b(0xC4)
    val dcLen = 17 + 12; val acLen = 17 + 1
    b16(2 + 2 * dcLen + 2 * acLen)
    def writeDc(id: Int): Unit = {
      b(id); (1 to 16).foreach(l => b(DcBits(l))); DcVals.foreach(b)
    }
    def writeAc(id: Int): Unit = {
      b(0x10 | id); (1 to 16).foreach(l => b(AcBits(l))); b(0x00)
    }
    writeDc(0); writeAc(0); writeDc(1); writeAc(1)
    if (ri > 0) { b(0xFF); b(0xDD); b16(4); b16(ri) }
    // SOF0 (baseline) or SOF2 (progressive) — same component layout
    b(0xFF); b(if (progressive) 0xC2 else 0xC0)
    b16(8 + 3 * ncomp); b(8); b16(h); b16(w); b(ncomp)
    if (mode == 0) { b(1); b(0x11); b(0) }
    else {
      b(1); b(if (mode == 2) 0x22 else 0x11); b(0)
      b(2); b(0x11); b(1)
      b(3); b(0x11); b(1)
    }
    def dcOf(level: Int): Int = 8 * (level - 128)
    // tile DC for component comp (mode 2: chroma tile = image tile)
    def tileVal(t: Int, comp: Int): Int =
      if (mode == 0) tiles(t) else tiles(3 * t + comp)
    def sosHeader(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      b(0xFF); b(0xDA); b16(6 + 2 * comps.length); b(comps.length)
      comps.foreach { c =>
        b(c + 1) // component id as in SOF
        b(if (c == 0) 0x00 else 0x11)
      }
      b(ss); b(se); b((ah << 4) | al)
    }
    def putCategory(sink: BitSink, diff: Int): Unit = {
      val s = category(diff)
      val (code, len) = DcCodes(s)
      sink.put(code, len)
      if (s > 0) {
        val m = if (diff < 0) diff + (1 << s) - 1 else diff
        sink.put(m, s)
      }
    }

    if (!progressive) {
      sosHeader(0 until ncomp, 0, 63, 0, 0)
      // entropy scan: MCU per tile
      val sink = new BitSink
      val pred = new Array[Int](3)
      var rstIdx = 0
      var sinceRst = 0
      def putDc(comp: Int, level: Int): Unit = {
        val dc = dcOf(level)
        val diff = dc - pred(comp)
        pred(comp) = dc
        putCategory(sink, diff)
        sink.put(0, 1) // EOB (AC table code '0')
      }
      var t = 0
      while (t < tw * th) {
        if (ri > 0 && sinceRst == ri) {
          sink.pad()
          sink.out.write(0xFF); sink.out.write(0xD0 + rstIdx)
          rstIdx = (rstIdx + 1) & 7
          sinceRst = 0
          java.util.Arrays.fill(pred, 0)
        }
        if (mode == 0) putDc(0, tiles(t))
        else {
          if (mode == 2) {
            putDc(0, tileVal(t, 0)); putDc(0, tileVal(t, 0))
            putDc(0, tileVal(t, 0)); putDc(0, tileVal(t, 0))
          } else putDc(0, tileVal(t, 0))
          putDc(1, tileVal(t, 1))
          putDc(2, tileVal(t, 2))
        }
        sinceRst += 1
        t += 1
      }
      sink.pad()
      out.write(sink.out.toByteArray)
    } else {
      val yBlocksPerMcu = if (mode == 2) 4 else 1
      // scan 1: DC first, interleaved, point transform Al=1 — codes
      // diffs of (DC >> 1) per T.81 G.1.2.1
      sosHeader(0 until ncomp, 0, 0, 0, 1)
      locally {
        val sink = new BitSink
        val pred = new Array[Int](3)
        var t = 0
        while (t < tw * th) {
          var c = 0
          while (c < ncomp) {
            val shifted = dcOf(tileVal(t, c)) >> 1
            val n = if (c == 0) yBlocksPerMcu else 1
            var i = 0
            while (i < n) {
              putCategory(sink, shifted - pred(c))
              pred(c) = shifted
              i += 1
            }
            c += 1
          }
          t += 1
        }
        sink.pad()
        out.write(sink.out.toByteArray)
      }
      // scan 2: DC refinement (Ah=1 → Al=0) — bit 0 of each DC
      sosHeader(0 until ncomp, 0, 0, 1, 0)
      locally {
        val sink = new BitSink
        var t = 0
        while (t < tw * th) {
          var c = 0
          while (c < ncomp) {
            val bit = dcOf(tileVal(t, c)) & 1
            val n = if (c == 0) yBlocksPerMcu else 1
            var i = 0
            while (i < n) { sink.put(bit, 1); i += 1 }
            c += 1
          }
          t += 1
        }
        sink.pad()
        out.write(sink.out.toByteArray)
      }
      // scans 3..: one spectral-selection AC scan per component —
      // every block is all-zero AC, one EOB code (1 bit) per REAL
      // block in raster order
      var c = 0
      while (c < ncomp) {
        sosHeader(Seq(c), 1, 63, 0, 0)
        val sink = new BitSink
        val nBlocks =
          if (c == 0 && mode == 2) (tw * 2) * (th * 2) else tw * th
        var i = 0
        while (i < nBlocks) { sink.put(0, 1); i += 1 }
        sink.pad()
        out.write(sink.out.toByteArray)
        c += 1
      }
    }
    b(0xFF); b(0xD9)
    out.toByteArray
  }
}

/** `jpeg_synth_encode(array<int> tiles, array<int> params) → binary`
  * where params = [twTiles, thTiles, mode, restartInterval] with an
  * optional 5th element (1 → the SOF2 progressive lane) and an
  * optional 6th (1-8 → an APP1 Exif orientation tag); see
  * [[JpegEncoder.encodeFlatTiles]].
  */
case class JpegSynthEncode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_synth_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<int>), got $other")
    }

  override def nullSafeEval(tiles: Any, params: Any): Any = {
    val t = tiles.asInstanceOf[ArrayData].toIntArray()
    val pr = params.asInstanceOf[ArrayData].toIntArray()
    JpegEncoder.encodeFlatTiles(t, pr(0), pr(1), pr(2), pr(3),
      pr.length > 4 && pr(4) == 1, if (pr.length > 5) pr(5) else 0)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, pr) => s"""
      |int[] gp = $pr.toIntArray();
      |${ev.value} = graft.expressions.JpegEncoder.encodeFlatTiles(
      |  $t.toIntArray(), gp[0], gp[1], gp[2], gp[3],
      |  gp.length > 4 && gp[4] == 1, gp.length > 5 ? gp[5] : 0);
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
