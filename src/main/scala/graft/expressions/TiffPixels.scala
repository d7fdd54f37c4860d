package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** TIFF-variant LZW codec (TIFF 6.0 §13) — the SECOND LZW in the
  * engine, deliberately separate from [[GifLzwKernel]] because the
  * two formats genuinely differ at the bit level: TIFF packs codes
  * MSB-first (GIF: LSB-first), fixes the literal alphabet at 256
  * bytes (GIF: the palette's power-of-two), and switches code width
  * one code EARLY — width grows when the next free slot reaches
  * `(1<<width)-1`, not `1<<width` ("early change"; libtiff's
  * historical off-by-one that the spec canonized).
  *
  * The encoder is a REAL dictionary-growing compressor (not the
  * literal-mode trick the GIF synth uses): table reset at 4094
  * entries via an explicit CLEAR, mirroring libtiff, so the gate
  * corpus exercises chain growth, KwKwK, and width bumps on every
  * lane.
  */
object TiffLzw {
  private val Clear = 256
  private val Eoi = 257
  private val FirstFree = 258
  private val TableLimit = 4094 // libtiff resets here (early change)

  /** Compress `data` as a TIFF LZW strip stream. Deterministic (pure
    * function of the bytes).
    */
  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
    var buf = 0L
    var cnt = 0
    var width = 9
    def put(code: Int): Unit = {
      buf = (buf << width) | code
      cnt += width
      while (cnt >= 8) {
        out.write(((buf >>> (cnt - 8)) & 0xFF).toInt)
        cnt -= 8
      }
    }
    val map = new java.util.HashMap[Integer, Integer](1024)
    var next = FirstFree
    put(Clear)
    if (data.nonEmpty) {
      var prev = data(0) & 0xFF
      var i = 1
      while (i < data.length) {
        val b = data(i) & 0xFF
        val key = (prev << 8) | b
        val hit = map.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          map.put(key, next)
          next += 1
          // the encoder's table is ONE entry ahead of the decoder's
          // at the same stream position, so its early-change trigger
          // is (1<<w) where the decoder's is (1<<w)-1 — libtiff
          // encodes maxcode=MAXCODE(n) vs the decoder's MAXCODE(n)-1
          if (next == (1 << width) && width < 12) width += 1
          if (next >= TableLimit) {
            put(Clear)
            map.clear()
            next = FirstFree
            width = 9
          }
          prev = b
        }
        i += 1
      }
      put(prev)
    }
    put(Eoi)
    if (cnt > 0) out.write(((buf << (8 - cnt)) & 0xFF).toInt)
    out.toByteArray
  }

  /** Decode a TIFF LZW strip stream into exactly `expected` bytes, or
    * null on any structural violation (bad first code, code beyond
    * the table, output over/underflow, truncation). Never throws.
    */
  def decode(p: Array[Byte], off: Int, len: Int, expected: Int): Array[Byte] = {
    if (off < 0 || len < 0 || off + len > p.length || expected < 0) return null
    val out = new Array[Byte](expected)
    var produced = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val chainLen = new Array[Int](4096)
    var next = FirstFree
    var width = 9
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    var pos = off
    val end = off + len

    def lenOf(c: Int): Int = if (c < 256) 1 else chainLen(c)
    /** Write code `c`'s chain at `produced`; returns its first byte
      * or -1 on overflow/corruption.
      */
    def emit(c0: Int): Int = {
      val l = lenOf(c0)
      if (produced + l > expected) return -1
      var i = produced + l
      var c = c0
      while (c >= FirstFree) {
        i -= 1
        out(i) = suffix(c)
        c = prefix(c)
      }
      i -= 1
      out(i) = c.toByte
      produced += l
      c
    }

    var done = false
    while (!done) {
      if (produced == expected) { done = true }
      else {
        while (bitCnt < width && pos < end) {
          bitBuf = (bitBuf << 8) | (p(pos) & 0xFF)
          pos += 1
          bitCnt += 8
        }
        if (bitCnt < width) return null // truncated mid-code
        val code = ((bitBuf >>> (bitCnt - width)) & ((1L << width) - 1)).toInt
        bitCnt -= width
        if (code == Clear) {
          next = FirstFree
          width = 9
          prev = -1
        } else if (code == Eoi) {
          done = true
        } else if (prev < 0) {
          if (code >= 256) return null // first code after clear: literal
          if (emit(code) < 0) return null
          prev = code
        } else {
          if (code > next) return null
          val first =
            if (code == next) { // KwKwK
              val f = emit(prev)
              if (f < 0) return null
              if (produced >= expected) return null
              out(produced) = f.toByte
              produced += 1
              f
            } else {
              val f = emit(code)
              if (f < 0) return null
              f
            }
          if (next < 4096) {
            prefix(next) = prev
            suffix(next) = first.toByte
            chainLen(next) = lenOf(prev) + 1
            next += 1
            if (next == (1 << width) - 1 && width < 12) width += 1
          }
          prev = code
        }
      }
    }
    if (produced != expected) null else out
  }
}

/** PackBits (TIFF 6.0 §9 / classic Mac RLE): n in 0..127 ⇒ copy n+1
  * literals; n in -127..-1 ⇒ repeat next byte 1-n times; -128 ⇒ noop.
  */
object PackBits {
  /** Run-detecting encoder (runs ≥ 3 become repeat ops, the rest
    * literal chunks ≤ 128). Deterministic.
    */
  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + data.length / 128 + 1)
    var i = 0
    val n = data.length
    while (i < n) {
      // run length at i
      var run = 1
      while (i + run < n && run < 128 && data(i + run) == data(i)) run += 1
      if (run >= 3) {
        out.write(1 - run) // -(run-1)
        out.write(data(i))
        i += run
      } else {
        // literal chunk: until the next ≥3 run or 128 bytes
        val start = i
        var j = i
        var stop = false
        while (j < n && j - start < 128 && !stop) {
          var r = 1
          while (j + r < n && r < 3 && data(j + r) == data(j)) r += 1
          if (r >= 3) stop = true else j += 1
        }
        if (j == start) j = start + 1 // a run starts here but chunk is empty
        out.write(j - start - 1)
        out.write(data, start, j - start)
        i = j
      }
    }
    out.toByteArray
  }

  /** Decode at least `expected` bytes from `p[off, off+len)`; returns
    * exactly `expected` bytes (input may round up past the target —
    * per-row restarts are allowed to pad) or null. Never throws.
    */
  def decode(p: Array[Byte], off: Int, len: Int, expected: Int): Array[Byte] = {
    if (off < 0 || len < 0 || off + len > p.length || expected < 0) return null
    val out = new Array[Byte](expected)
    var produced = 0
    var pos = off
    val end = off + len
    while (produced < expected && pos < end) {
      val n = p(pos).toInt
      pos += 1
      if (n >= 0) {
        val cnt = n + 1
        if (pos + cnt > end || produced + cnt > expected) return null
        System.arraycopy(p, pos, out, produced, cnt)
        pos += cnt
        produced += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        if (pos >= end || produced + cnt > expected) return null
        val b = p(pos)
        pos += 1
        var k = 0
        while (k < cnt) { out(produced + k) = b; k += 1 }
        produced += cnt
      }
    }
    if (produced != expected) null else out
  }
}

/** TIFF pixel statistics through a REAL strip/tile decode — the
  * decode tier over the triage layout [[TiffMetaKernel]] parses:
  * scanned-document corpora are TIFF-heavy, and until this kernel a
  * `.tif` payload's pixels were invisible to the stats/dedup stack.
  * Supports the baseline-TIFF profile a document corpus actually
  * contains: 8-bit samples, grayscale (spp 1, photometric 0/1) and
  * RGB (spp 3, photometric 2), chunky planar layout, STRIP and TILE
  * organizations, compressions 1 (none), 5 (LZW — the TIFF variant:
  * MSB-first, early change), 8/32946 (Deflate/zlib), 32773
  * (PackBits), and horizontal-differencing predictor 2. Anything
  * outside the profile (palette, planar, fill-order 2, 16-bit, JPEG-
  * in-TIFF, …) returns null — triaged by the meta row, honestly
  * undecoded here.
  *
  * One kernel pass per payload: each strip/tile is decompressed into
  * a buffer bounded by its own geometry (never the whole raster),
  * un-predicted in place, and accumulated — channel sums + peak, with
  * edge tiles clipped to the image bounds (tile padding never
  * contributes). Bomb-guarded ([[MaxPixels]]); never throws.
  */
object TiffPixelKernel {
  val MaxPixels: Long = 1L << 22

  private def u16(p: Array[Byte], off: Int, le: Boolean): Int =
    if (le) (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    else ((p(off) & 0xFF) << 8) | (p(off + 1) & 0xFF)

  private def u32(p: Array[Byte], off: Int, le: Boolean): Long =
    if (le) (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)
    else ((p(off) & 0xFFL) << 24) | ((p(off + 1) & 0xFFL) << 16) |
      ((p(off + 2) & 0xFFL) << 8) | (p(off + 3) & 0xFFL)

  /** SHORT(3)/LONG(4) scalar with count 1, or -1. */
  private def scalar(p: Array[Byte], typ: Int, cnt: Long, vOff: Int,
      le: Boolean): Long = {
    if (cnt != 1L) return -1L
    if (typ == 3) u16(p, vOff, le).toLong
    else if (typ == 4) u32(p, vOff, le)
    else -1L
  }

  /** Materialize a count-n SHORT/LONG array (inline or out-of-line),
    * or null on bounds/type violations.
    */
  private def longArray(p: Array[Byte], typ: Int, cnt: Long, vOff: Int,
      le: Boolean): Array[Long] = {
    if (cnt < 1 || cnt > (1 << 16)) return null
    val width = if (typ == 3) 2 else if (typ == 4) 4 else return null
    val n = cnt.toInt
    val base =
      if (cnt * width <= 4) vOff
      else {
        val off = u32(p, vOff, le)
        if (off < 0 || off + cnt * width > p.length) return null
        off.toInt
      }
    if (base + n.toLong * width > p.length) return null
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (width == 2) u16(p, base + 2 * i, le).toLong
        else u32(p, base + 4 * i, le)
      i += 1
    }
    out
  }

  /** Decompress one strip/tile to exactly `expected` bytes, or null. */
  private def unit(p: Array[Byte], offL: Long, cntL: Long, comp: Long,
      expected: Int): Array[Byte] = {
    if (offL < 0 || cntL < 0 || offL + cntL > p.length) return null
    val off = offL.toInt
    val cnt = cntL.toInt
    comp match {
      case 1L =>
        if (cnt < expected) return null
        java.util.Arrays.copyOfRange(p, off, off + expected)
      case 5L => TiffLzw.decode(p, off, cnt, expected)
      case 8L | 32946L =>
        ZlibKernel.inflate(java.util.Arrays.copyOfRange(p, off, off + cnt),
          expected)
      case 32773L => PackBits.decode(p, off, cnt, expected)
      case _ => null
    }
  }

  /** Undo horizontal differencing in place over `rows` rows of
    * `rowW` pixels × `spp` samples.
    */
  private def unpredict(buf: Array[Byte], rows: Int, rowW: Int, spp: Int): Unit = {
    var r = 0
    while (r < rows) {
      val base = r * rowW * spp
      var j = spp
      val rowLen = rowW * spp
      while (j < rowLen) {
        buf(base + j) = (buf(base + j) + buf(base + j - spp)).toByte
        j += 1
      }
      r += 1
    }
  }

  /** The decoded-profile view of a payload's IFD0: everything the
    * unit walk needs, already profile-gated. Null when the payload is
    * not a decodable baseline TIFF.
    */
  private[expressions] final case class Layout(
      w: Int, h: Int, spp: Int, comp: Long, predictor: Long,
      orientation: Int, tileW: Int, tileH: Int,
      stripOffs: Array[Long], stripCnts: Array[Long],
      tileOffs: Array[Long], tileCnts: Array[Long], rps: Long)

  private def layout(p: Array[Byte]): Layout = {
    if (!TiffMetaKernel.isTiff(p)) return null
    val le = p(0) == 'I'
    val ifd0Off = u32(p, 4, le)
    if (ifd0Off < 8 || ifd0Off + 2 > p.length) return null
    val ifd0 = ifd0Off.toInt
    val n = u16(p, ifd0, le)
    if (n > 512 || ifd0 + 2 + 12L * n + 4 > p.length) return null

    var width = -1L
    var height = -1L
    var bitsOk = true
    var spp = 1L
    var comp = 1L
    var photometric = -1L
    var predictor = 1L
    var planar = 1L
    var fillOrder = 1L
    var orientation = 1L
    var sampleFmtOk = true
    var rps = -1L
    var tileW = -1L
    var tileH = -1L
    var stripOffs: Array[Long] = null
    var stripCnts: Array[Long] = null
    var tileOffs: Array[Long] = null
    var tileCnts: Array[Long] = null

    var i = 0
    while (i < n) {
      val e = ifd0 + 2 + 12 * i
      val tag = u16(p, e, le)
      val typ = u16(p, e + 2, le)
      val cnt = u32(p, e + 4, le)
      val vOff = e + 8
      tag match {
        case 0x0100 => width = scalar(p, typ, cnt, vOff, le)
        case 0x0101 => height = scalar(p, typ, cnt, vOff, le)
        case 0x0102 => // every sample must be 8-bit
          val arr = longArray(p, typ, cnt, vOff, le)
          bitsOk = arr != null && arr.forall(_ == 8L)
        case 0x0103 => comp = scalar(p, typ, cnt, vOff, le)
        case 0x0106 => photometric = scalar(p, typ, cnt, vOff, le)
        case 0x010A => fillOrder = scalar(p, typ, cnt, vOff, le)
        case 0x0111 => stripOffs = longArray(p, typ, cnt, vOff, le)
        case 0x0112 => orientation = scalar(p, typ, cnt, vOff, le)
        case 0x0115 => spp = scalar(p, typ, cnt, vOff, le)
        case 0x0116 => rps = scalar(p, typ, cnt, vOff, le)
        case 0x0117 => stripCnts = longArray(p, typ, cnt, vOff, le)
        case 0x011C => planar = scalar(p, typ, cnt, vOff, le)
        case 0x013D => predictor = scalar(p, typ, cnt, vOff, le)
        case 0x0142 => tileW = scalar(p, typ, cnt, vOff, le)
        case 0x0143 => tileH = scalar(p, typ, cnt, vOff, le)
        case 0x0144 => tileOffs = longArray(p, typ, cnt, vOff, le)
        case 0x0145 => tileCnts = longArray(p, typ, cnt, vOff, le)
        case 0x0153 => // SampleFormat: unsigned integer only
          val arr = longArray(p, typ, cnt, vOff, le)
          sampleFmtOk = arr != null && arr.forall(_ == 1L)
        case _ =>
      }
      i += 1
    }

    // profile gate
    if (width <= 0 || height <= 0 || width * height > MaxPixels) return null
    if (!bitsOk || !sampleFmtOk) return null
    if (spp != 1L && spp != 3L) return null
    if (photometric < 0 || photometric > 2) return null
    if (spp == 3L && photometric != 2L) return null
    if (planar != 1L || fillOrder != 1L) return null
    if (predictor != 1L && predictor != 2L) return null
    if (comp != 1L && comp != 5L && comp != 8L && comp != 32946L &&
      comp != 32773L) return null
    val w = width.toInt
    val h = height.toInt
    if (tileOffs != null) {
      if (tileW <= 0 || tileH <= 0 || tileCnts == null) return null
      if (tileW * tileH > MaxPixels) return null
      val across = (w + tileW.toInt - 1) / tileW.toInt
      val down = (h + tileH.toInt - 1) / tileH.toInt
      if (tileOffs.length != across * down ||
        tileCnts.length != across * down) return null
    } else {
      if (stripOffs == null || stripCnts == null) return null
      val rows0 = if (rps <= 0 || rps > h) h.toLong else rps
      val nStrips = ((h + rows0 - 1) / rows0).toInt
      if (stripOffs.length != nStrips || stripCnts.length != nStrips)
        return null
    }
    Layout(w, h, spp.toInt, comp, predictor,
      if (orientation >= 1 && orientation <= 8) orientation.toInt else 1,
      tileW.toInt, tileH.toInt, stripOffs, stripCnts, tileOffs, tileCnts,
      rps)
  }

  /** EXIF/TIFF orientation of IFD0 (tag 274), default 1; reads only
    * decodable payloads (anything else reports 1 — upright).
    */
  def orientationOf(p: Array[Byte]): Int = {
    val L = layout(p)
    if (L == null) 1 else L.orientation
  }

  /** (n_pixels, sum_r, sum_g, sum_b, peak_byte) over the first IFD's
    * raster, or null when the payload is not a decodable baseline
    * TIFF. Grayscale accumulates the sample into all three channel
    * sums (the BMP/GIF gray convention). Strip/tile buffers are
    * geometry-bounded — the whole raster is never materialized.
    */
  def stats(p: Array[Byte]): ArrayData = {
    val L = layout(p)
    if (L == null) return null
    val w = L.w
    val h = L.h
    val nspp = L.spp
    var sR = 0L
    var sG = 0L
    var sB = 0L
    var peak = 0L

    def accumulate(buf: Array[Byte], rows: Int, rowW: Int, clipW: Int): Unit = {
      var r = 0
      while (r < rows) {
        var x = 0
        while (x < clipW) {
          val base = (r * rowW + x) * nspp
          if (nspp == 3) {
            val cr = (buf(base) & 0xFF).toLong
            val cg = (buf(base + 1) & 0xFF).toLong
            val cb = (buf(base + 2) & 0xFF).toLong
            sR += cr; sG += cg; sB += cb
            if (cr > peak) peak = cr
            if (cg > peak) peak = cg
            if (cb > peak) peak = cb
          } else {
            val v = (buf(base) & 0xFF).toLong
            sR += v; sG += v; sB += v
            if (v > peak) peak = v
          }
          x += 1
        }
        r += 1
      }
    }

    if (L.tileOffs != null) { // tile layout
      val tw = L.tileW
      val th = L.tileH
      val across = (w + tw - 1) / tw
      val expected = tw * th * nspp
      var t = 0
      while (t < L.tileOffs.length) {
        val buf = unit(p, L.tileOffs(t), L.tileCnts(t), L.comp, expected)
        if (buf == null) return null
        if (L.predictor == 2L) unpredict(buf, th, tw, nspp)
        val tx = t % across
        val ty = t / across
        val clipW = math.min(tw, w - tx * tw)
        val clipH = math.min(th, h - ty * th)
        // accumulate the clipped window only (pad bytes never count)
        var r = 0
        while (r < clipH) {
          accumulate(java.util.Arrays.copyOfRange(
            buf, r * tw * nspp, (r * tw + clipW) * nspp), 1, clipW, clipW)
          r += 1
        }
        t += 1
      }
    } else { // strip layout
      val rows0 = if (L.rps <= 0 || L.rps > h) h.toLong else L.rps
      val nStrips = L.stripOffs.length
      var s = 0
      while (s < nStrips) {
        val rows = math.min(rows0, h - s * rows0).toInt
        val expected = rows * w * nspp
        val buf = unit(p, L.stripOffs(s), L.stripCnts(s), L.comp, expected)
        if (buf == null) return null
        if (L.predictor == 2L) unpredict(buf, rows, w, nspp)
        accumulate(buf, rows, w, w)
        s += 1
      }
    }
    new GenericArrayData(Array(w.toLong * h, sR, sG, sB, peak))
  }

  /** Full-raster decode to packed 0xRRGGBB ints (gray replicated to
    * all three channels), or null — the perceptual-hash route, where
    * the raster genuinely must exist (the JPEG/VP8L routes have the
    * same budget); bounded by [[MaxPixels]].
    */
  def decodePixels(p: Array[Byte]): (Int, Int, Array[Int]) = {
    val L = layout(p)
    if (L == null) return null
    val w = L.w
    val h = L.h
    val nspp = L.spp
    val px = new Array[Int](w * h)

    def place(buf: Array[Byte], rows: Int, rowW: Int,
        gx0: Int, gy0: Int, clipW: Int, clipH: Int): Unit = {
      var r = 0
      while (r < clipH) {
        var x = 0
        while (x < clipW) {
          val base = (r * rowW + x) * nspp
          val v =
            if (nspp == 3)
              ((buf(base) & 0xFF) << 16) | ((buf(base + 1) & 0xFF) << 8) |
                (buf(base + 2) & 0xFF)
            else {
              val g = buf(base) & 0xFF
              (g << 16) | (g << 8) | g
            }
          px((gy0 + r) * w + (gx0 + x)) = v
          x += 1
        }
        r += 1
      }
    }

    if (L.tileOffs != null) {
      val tw = L.tileW
      val th = L.tileH
      val across = (w + tw - 1) / tw
      val expected = tw * th * nspp
      var t = 0
      while (t < L.tileOffs.length) {
        val buf = unit(p, L.tileOffs(t), L.tileCnts(t), L.comp, expected)
        if (buf == null) return null
        if (L.predictor == 2L) unpredict(buf, th, tw, nspp)
        val tx = t % across
        val ty = t / across
        place(buf, th, tw, tx * tw, ty * th,
          math.min(tw, w - tx * tw), math.min(th, h - ty * th))
        t += 1
      }
    } else {
      val rows0 = if (L.rps <= 0 || L.rps > h) h.toLong else L.rps
      var s = 0
      while (s < L.stripOffs.length) {
        val rows = math.min(rows0, h - s * rows0).toInt
        val expected = rows * w * nspp
        val buf = unit(p, L.stripOffs(s), L.stripCnts(s), L.comp, expected)
        if (buf == null) return null
        if (L.predictor == 2L) unpredict(buf, rows, w, nspp)
        place(buf, rows, w, 0, (s * rows0).toInt, w, rows)
        s += 1
      }
    }
    (w, h, px)
  }
}

/** Deterministic baseline-TIFF synthesis with REAL pixel data — the
  * synthesis-side inverse of [[TiffPixelKernel]] in the
  * `JpegEncoder`/[[Vp8lEncoder]] convention: raster byte `j` is the
  * closed form `(7·doc_id + 13·j) mod 256` (row-major, chunky), so
  * the oracle recomputes channel sums per channel offset while Spark
  * must reach the same numbers by decompressing the actual LZW /
  * PackBits / Deflate streams. Lanes rotate per doc: byte order
  * (d%2), compression 1/5/32773/8 ((d/2)%4), grayscale vs RGB (d%3),
  * strip count 1–3 (d%3), TILE layout every d%5==2 (16×16 tiles
  * over dims grown past one tile,
  * zero-padded edges the decoder must clip), and horizontal
  * predictor 2 on LZW/Deflate docs with d%7==3 (differenced bytes on
  * the wire — the decoder's un-predict must restore the closed form).
  */
object TiffPixelSynthKernel {
  def synth(d: Long): Array[Byte] = {
    val le = d % 2 == 0
    val tiles = d % 5 == 2
    // tile-lane images grow past one tile: TIFF 6.0 requires tile
    // dims to be multiples of 16, so multi-tile geometry (and edge
    // clipping) needs w,h beyond 16
    val w = (5 + d % 12 + (if (tiles) 16 else 0)).toInt
    val h = (4 + d % 9 + (if (tiles) 16 else 0)).toInt
    val spp = if (d % 3 == 0) 3 else 1
    val comp = Array(1L, 5L, 32773L, 8L)(((d / 2) % 4).toInt)
    val predictor =
      if ((comp == 5L || comp == 8L) && d % 7 == 3) 2 else 1
    val pm = if (spp == 3) 2L else 1L

    // raster bytes, row-major chunky
    val raster = new Array[Byte](w * h * spp)
    var j = 0
    while (j < raster.length) {
      raster(j) = ((7 * d + 13 * j) % 256).toByte
      j += 1
    }

    def compress(unitBytes: Array[Byte], rows: Int, rowW: Int): Array[Byte] = {
      val src =
        if (predictor == 2) {
          val diff = unitBytes.clone()
          var r = 0
          while (r < rows) {
            val base = r * rowW * spp
            var k = rowW * spp - 1
            while (k >= spp) {
              diff(base + k) = (diff(base + k) - diff(base + k - spp)).toByte
              k -= 1
            }
            r += 1
          }
          diff
        } else unitBytes
      comp match {
        case 1L => src
        case 5L => TiffLzw.encode(src)
        case 8L => ZlibKernel.deflate(src)
        case 32773L => PackBits.encode(src)
      }
    }

    // units
    val units: Array[Array[Byte]] =
      if (tiles) {
        val tw = 16; val th = 16
        val across = (w + tw - 1) / tw
        val down = (h + th - 1) / th
        val out = new Array[Array[Byte]](across * down)
        var t = 0
        while (t < out.length) {
          val tx = t % across
          val ty = t / across
          val buf = new Array[Byte](tw * th * spp) // zero-padded edges
          var r = 0
          while (r < th) {
            val gy = ty * th + r
            if (gy < h) {
              var x = 0
              while (x < tw) {
                val gx = tx * tw + x
                if (gx < w) {
                  var c = 0
                  while (c < spp) {
                    buf((r * tw + x) * spp + c) = raster((gy * w + gx) * spp + c)
                    c += 1
                  }
                }
                x += 1
              }
            }
            r += 1
          }
          out(t) = compress(buf, th, tw)
          t += 1
        }
        out
      } else {
        val ns = (1 + d % 3).toInt
        val rps = (h + ns - 1) / ns
        val out = new Array[Array[Byte]]((h + rps - 1) / rps)
        var s = 0
        while (s < out.length) {
          val rows = math.min(rps, h - s * rps)
          val buf = java.util.Arrays.copyOfRange(
            raster, s * rps * w * spp, (s * rps + rows) * w * spp)
          out(s) = compress(buf, rows, w)
          s += 1
        }
        out
      }
    val nUnits = units.length
    val rps = if (tiles) -1 else (h + (1 + d % 3).toInt - 1) / (1 + d % 3).toInt

    // entry count (ascending tag order)
    // strips: w,h,bits,comp,pm,stripOffs,spp,rps,stripCnts[,pred]
    // tiles:  w,h,bits,comp,pm,spp[,pred],tw,th,tileOffs,tileCnts
    val nE = (if (tiles) 10 else 9) + (if (predictor == 2) 1 else 0)

    val out = new java.io.ByteArrayOutputStream(256)
    def w16(v: Long): Unit = {
      val x = (v & 0xFFFF).toInt
      if (le) { out.write(x & 0xFF); out.write(x >> 8) }
      else { out.write(x >> 8); out.write(x & 0xFF) }
    }
    def w32(v: Long): Unit = {
      val x = v & 0xFFFFFFFFL
      if (le) {
        out.write((x & 0xFF).toInt); out.write(((x >> 8) & 0xFF).toInt)
        out.write(((x >> 16) & 0xFF).toInt); out.write(((x >> 24) & 0xFF).toInt)
      } else {
        out.write(((x >> 24) & 0xFF).toInt); out.write(((x >> 16) & 0xFF).toInt)
        out.write(((x >> 8) & 0xFF).toInt); out.write((x & 0xFF).toInt)
      }
    }
    if (le) { out.write('I'); out.write('I'); out.write(42); out.write(0) }
    else { out.write('M'); out.write('M'); out.write(0); out.write(42) }
    w32(8)

    // out-of-line layout
    val ifd0End = 8 + 2 + nE * 12 + 4
    val bpsOff = ifd0End
    val bpsLen = if (spp == 3) 6 else 0
    val unitsOutOfLine = nUnits > 1
    val offArrOff = bpsOff + bpsLen
    val offArrLen = if (unitsOutOfLine) 4 * nUnits else 0
    val cntArrOff = offArrOff + offArrLen
    val cntArrLen = offArrLen
    var dataOff = cntArrOff + cntArrLen
    val unitOffs = new Array[Long](nUnits)
    var u = 0
    while (u < nUnits) {
      unitOffs(u) = dataOff
      dataOff += units(u).length
      u += 1
    }

    def entry(tag: Int, typ: Int, cnt: Long)(value: => Unit): Unit = {
      w16(tag); w16(typ); w32(cnt)
      val before = out.size()
      value
      var pad = 4 - (out.size() - before)
      while (pad > 0) { out.write(0); pad -= 1 }
    }
    def shortEntry(tag: Int, v: Long): Unit = entry(tag, 3, 1L) { w16(v) }
    def longEntry(tag: Int, v: Long): Unit = entry(tag, 4, 1L) { w32(v) }

    w16(nE)
    shortEntry(0x0100, w)
    shortEntry(0x0101, h)
    if (spp == 3) entry(0x0102, 3, 3L) { w32(bpsOff) }
    else shortEntry(0x0102, 8)
    shortEntry(0x0103, comp)
    shortEntry(0x0106, pm)
    if (!tiles) {
      if (unitsOutOfLine) entry(0x0111, 4, nUnits) { w32(offArrOff) }
      else longEntry(0x0111, unitOffs(0))
      shortEntry(0x0115, spp)
      longEntry(0x0116, rps)
      if (unitsOutOfLine) entry(0x0117, 4, nUnits) { w32(cntArrOff) }
      else longEntry(0x0117, units(0).length)
      if (predictor == 2) shortEntry(0x013D, 2)
    } else {
      shortEntry(0x0115, spp)
      if (predictor == 2) shortEntry(0x013D, 2)
      shortEntry(0x0142, 16)
      shortEntry(0x0143, 16)
      if (unitsOutOfLine) entry(0x0144, 4, nUnits) { w32(offArrOff) }
      else longEntry(0x0144, unitOffs(0))
      if (unitsOutOfLine) entry(0x0145, 4, nUnits) { w32(cntArrOff) }
      else longEntry(0x0145, units(0).length)
    }
    w32(0)
    if (spp == 3) { w16(8); w16(8); w16(8) }
    if (unitsOutOfLine) {
      var i = 0
      while (i < nUnits) { w32(unitOffs(i)); i += 1 }
      i = 0
      while (i < nUnits) { w32(units(i).length); i += 1 }
    }
    u = 0
    while (u < nUnits) { out.write(units(u)); u += 1 }
    out.toByteArray
  }
}

/** `tiff_pixel_stats(payload) → array<bigint>`; see
  * [[TiffPixelKernel.stats]].
  */
case class TiffPixelStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "tiff_pixel_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    TiffPixelKernel.stats(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.TiffPixelKernel.stats($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `tiff_pixel_synth(doc_id) → binary`; see
  * [[TiffPixelSynthKernel.synth]].
  */
case class TiffPixelSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "tiff_pixel_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    TiffPixelSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.TiffPixelSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Minimal arbitrary-raster TIFF encode — the gate-corpus face for
  * rasters that are NOT the doc_id closed form (the image-dedup
  * corpus shares one tile raster across codecs): little-endian,
  * grayscale 8-bit, photometric 1, ONE real dictionary-growing LZW
  * strip. The flat-tile rasters it carries are exactly where LZW runs
  * and KwKwK shapes live, so the dedup gate decodes genuine
  * compressed streams.
  */
object TiffGrayEncodeKernel {
  def encode(px: Array[Int], w: Int): Array[Byte] = {
    if (w <= 0 || px.length == 0 || px.length % w != 0) return null
    val h = px.length / w
    val raster = new Array[Byte](px.length)
    var i = 0
    while (i < px.length) { raster(i) = (px(i) & 0xFF).toByte; i += 1 }
    val strip = TiffLzw.encode(raster)
    val nE = 9
    val dataOff = 8 + 2 + nE * 12 + 4
    val out = new java.io.ByteArrayOutputStream(dataOff + strip.length)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    out.write('I'); out.write('I'); out.write(42); out.write(0)
    w32(8)
    def shortEntry(tag: Int, v: Int): Unit = {
      w16(tag); w16(3); w32(1); w16(v); w16(0)
    }
    def longEntry(tag: Int, v: Int): Unit = { w16(tag); w16(4); w32(1); w32(v) }
    w16(nE)
    shortEntry(0x0100, w)
    shortEntry(0x0101, h)
    shortEntry(0x0102, 8)
    shortEntry(0x0103, 5) // LZW
    shortEntry(0x0106, 1) // BlackIsZero
    longEntry(0x0111, dataOff)
    shortEntry(0x0115, 1)
    longEntry(0x0116, h)
    longEntry(0x0117, strip.length)
    w32(0)
    out.write(strip)
    out.toByteArray
  }
}

/** `tiff_gray_encode(array<int> gray, int width) → binary`; see
  * [[TiffGrayEncodeKernel.encode]].
  */
case class TiffGrayEncode(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "tiff_gray_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, int), got $other")
    }

  override def nullSafeEval(px: Any, w: Any): Any =
    TiffGrayEncodeKernel.encode(
      px.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray(),
      w.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, w) => s"""
      |${ev.value} = graft.expressions.TiffGrayEncodeKernel.encode(
      |  $px.toIntArray(), $w);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(l, r)
}
