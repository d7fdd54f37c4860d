package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** GIF LZW pixel-statistics kernel — the third REAL compressed-stream
  * decode in the engine (zlib/DEFLATE for PNG, PCM for WAV, LZW
  * here): walks the GIF block structure (extensions skipped, first
  * image descriptor taken), decodes the variable-width LSB-first LZW
  * code stream with full dictionary growth (clear / EOI / KwKwK /
  * 12-bit cap), maps every decoded index through the active color
  * table, and accumulates channel sums + peak in the SAME pass.
  *
  * Channel statistics are pixel-ORDER-invariant, so interlaced images
  * (row reordering) decode through the identical path — the kernel
  * never materializes the raster at all: a decoded LZW code's output
  * sequence is accumulated by walking the dictionary chain backward,
  * O(1) extra memory beyond the fixed 4096-entry tables.
  *
  * Null (never an exception) on any structural violation: bad magic,
  * missing color table, index beyond the palette, truncated or
  * over-long code stream, pixel count ≠ descriptor area, or an area
  * beyond the bomb guard.
  */
object GifLzwKernel {
  val MaxPixels: Long = 1L << 22

  private def u16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)

  /** (n_pixels, sum_r, sum_g, sum_b, peak_byte) over the first image
    * of a GIF payload, or null.
    */
  def stats(p: Array[Byte]): ArrayData = {
    if (p.length < 14) return null
    if (!(p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
        (p(4) == '7' || p(4) == '9') && p(5) == 'a')) return null
    val packed = p(10) & 0xFF
    var pos = 13
    var tabOff = -1
    var tabEntries = 0
    if ((packed & 0x80) != 0) {
      tabOff = pos
      tabEntries = 1 << ((packed & 0x07) + 1)
      pos += 3 * tabEntries
      if (pos > p.length) return null
    }
    // block walk: skip extensions, stop at the first image descriptor
    var found = false
    while (!found) {
      if (pos >= p.length) return null
      val sep = p(pos) & 0xFF
      pos += 1
      sep match {
        case 0x21 => // extension: label + sub-blocks
          pos += 1 // label
          var n = -1
          while (n != 0) {
            if (pos >= p.length) return null
            n = p(pos) & 0xFF
            pos += 1 + n
          }
        case 0x2C => found = true
        case 0x3B => return null // trailer before any image
        case _ => return null
      }
    }
    if (pos + 9 > p.length) return null
    val iw = u16(p, pos + 4)
    val ih = u16(p, pos + 6)
    val ipacked = p(pos + 8) & 0xFF
    pos += 9
    if ((ipacked & 0x80) != 0) { // local color table overrides
      tabOff = pos
      tabEntries = 1 << ((ipacked & 0x07) + 1)
      pos += 3 * tabEntries
    }
    if (tabOff < 0 || tabOff + 3 * tabEntries > p.length) return null
    val area = iw.toLong * ih
    if (area <= 0 || area > MaxPixels) return null
    val st = decodeImage(p, pos, tabOff, tabEntries, area)
    if (st == null) return null
    new GenericArrayData(Array(area, st(1), st(2), st(3), st(4)))
  }

  /** Decode ONE image's LZW code stream starting at `pos0` (the LZW
    * minimum-code-size byte), accumulating channel sums against the
    * active color table. Returns [endPos, sum_r, sum_g, sum_b, peak]
    * — endPos is the offset just past the image's block terminator —
    * or null on any structural violation. Shared by the
    * first-image stats path and the [[GifFramesKernel]] walk.
    */
  private[expressions] def decodeImage(p: Array[Byte], pos0: Int,
      tabOff: Int, tabEntries: Int, area: Long): Array[Long] = {
    var pos = pos0
    if (pos >= p.length) return null
    val minCode = p(pos) & 0xFF
    pos += 1
    if (minCode < 2 || minCode > 8) return null

    // LZW state: dictionary chains (prefix link + suffix byte)
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = eoi + 1
    var codeSize = minCode + 1
    var prev = -1
    var s0 = 0L; var s1 = 0L; var s2 = 0L
    var peak = 0L
    var emitted = 0L

    // accumulate one dictionary chain; returns its FIRST index
    def emitChain(code: Int): Int = {
      var c = code
      var first = c
      var n = 0L
      while (c >= 0) {
        val idx = if (c < clear) c else suffix(c)
        val leaf = if (c < clear) c else -1
        val cur = if (leaf >= 0) leaf else idx
        if (cur >= tabEntries) return -1
        val base = tabOff + 3 * cur
        val r = (p(base) & 0xFF).toLong
        val g = (p(base + 1) & 0xFF).toLong
        val b = (p(base + 2) & 0xFF).toLong
        s0 += r; s1 += g; s2 += b
        if (r > peak) peak = r
        if (g > peak) peak = g
        if (b > peak) peak = b
        n += 1
        first = cur
        c = if (leaf >= 0) -1 else prefix(c)
        if (n > area) return -1 // chain longer than the whole image
      }
      emitted += n
      first
    }

    // bit reader over the concatenated sub-block bytes, LSB-first
    var bitBuf = 0L
    var bitCnt = 0
    var blockLeft = 0
    var done = false
    var sawTerm = false
    while (!done) {
      // refill
      while (bitCnt < codeSize) {
        if (blockLeft == 0) {
          if (pos >= p.length) return null
          blockLeft = p(pos) & 0xFF
          pos += 1
          if (blockLeft == 0) {
            // block terminator before EOI: tolerate only if the image
            // is already complete (some encoders omit the EOI code)
            done = true
            sawTerm = true
            bitCnt = codeSize // break refill
          }
        }
        if (!done) {
          if (pos >= p.length) return null
          bitBuf |= (p(pos) & 0xFF).toLong << bitCnt
          bitCnt += 8
          pos += 1
          blockLeft -= 1
        }
      }
      if (!done) {
        val code = (bitBuf & ((1L << codeSize) - 1)).toInt
        bitBuf >>>= codeSize
        bitCnt -= codeSize
        if (code == clear) {
          next = eoi + 1
          codeSize = minCode + 1
          prev = -1
        } else if (code == eoi) {
          done = true
        } else if (prev < 0) {
          if (code >= clear) return null // first code must be literal
          if (emitChain(code) < 0) return null
          prev = code
        } else {
          // valid: a literal, or a dictionary code ≤ next (== next is
          // the KwKwK case); clear/eoi were matched above, and the
          // (clear, eoi) gap is empty by construction
          if (code > next) return null
          val toEmit = if (code == next) prev else code
          val first =
            if (code == next) { // KwKwK: prev + first(prev)
              val f = emitChain(prev)
              if (f < 0) return null
              val base = tabOff + 3 * f
              val r = (p(base) & 0xFF).toLong
              val g = (p(base + 1) & 0xFF).toLong
              val b = (p(base + 2) & 0xFF).toLong
              s0 += r; s1 += g; s2 += b
              if (r > peak) peak = r
              if (g > peak) peak = g
              if (b > peak) peak = b
              emitted += 1
              f
            } else {
              val f = emitChain(toEmit)
              if (f < 0) return null
              f
            }
          if (next < 4096) {
            prefix(next) = prev
            suffix(next) = first
            next += 1
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        }
        if (emitted > area) return null
        if (emitted == area && !done) {
          // image complete; consume the EOI/terminator leniently
          done = true
        }
      }
    }
    if (emitted != area) return null
    if (!sawTerm) {
      // consume to (and through) the block terminator so callers can
      // keep walking the stream — post-EOI padding bytes are skipped
      pos += blockLeft
      var n = -1
      while (n != 0) {
        if (pos >= p.length) return null
        n = p(pos) & 0xFF
        pos += 1 + n
      }
    }
    Array(pos.toLong, s0, s1, s2, peak)
  }
}

/** Literal-mode GIF-LZW encoder — the synthesis-side inverse of
  * [[GifLzwKernel]] (the `ZlibDeflate` convention: test corpora carry
  * REAL compressed payloads): emits CLEAR before every literal so the
  * code width stays fixed at minCode+1 and the dictionary never grows
  * — a valid (if unompressed) stream every conforming decoder
  * accepts. The general-dictionary decode path is exercised by the
  * INDEPENDENT encoder in CodecConformanceSpec (ImageIO's GIF writer,
  * which does grow the dictionary).
  */
object GifLzwEncoder {
  /** LSB-first bit-packed [CLEAR idx]* EOI stream chopped into ≤255-
    * byte sub-blocks with the 0x00 terminator appended.
    */
  def encodeLiterals(indices: Array[Int], minCode: Int): Array[Byte] = {
    require(minCode >= 2 && minCode <= 8, s"minCode $minCode out of range")
    val clear = 1 << minCode
    val eoi = clear + 1
    val cs = minCode + 1
    val bits = new java.io.ByteArrayOutputStream()
    var buf = 0L
    var cnt = 0
    def put(code: Int): Unit = {
      buf |= code.toLong << cnt
      cnt += cs
      while (cnt >= 8) {
        bits.write((buf & 0xFF).toInt)
        buf >>>= 8
        cnt -= 8
      }
    }
    var i = 0
    while (i < indices.length) {
      require(indices(i) >= 0 && indices(i) < clear,
        s"index ${indices(i)} exceeds the $clear-entry literal range")
      put(clear)
      put(indices(i))
      i += 1
    }
    put(eoi)
    if (cnt > 0) bits.write((buf & 0xFF).toInt)
    val raw = bits.toByteArray
    val out = new java.io.ByteArrayOutputStream(raw.length + raw.length / 255 + 2)
    var off = 0
    while (off < raw.length) {
      val n = math.min(255, raw.length - off)
      out.write(n)
      out.write(raw, off, n)
      off += n
    }
    out.write(0)
    out.toByteArray
  }
}

/** `gif_lzw_encode(array<int> indices) → binary` — see
  * [[GifLzwEncoder.encodeLiterals]]; `minCode` is an operator-level
  * constant.
  */
case class GifLzwEncode(child: Expression, minCode: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gif_lzw_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int> indices, got $other")
    }

  override def nullSafeEval(d: Any): Any = {
    val arr = d.asInstanceOf[ArrayData]
    GifLzwEncoder.encodeLiterals(arr.toIntArray(), minCode)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.GifLzwEncoder.encodeLiterals(
      |  $d.toIntArray(), $minCode);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `gif_pixel_stats(payload) → array<long>` of (n_pixels, sum_r,
  * sum_g, sum_b, peak_byte) via a full LZW decode of the first image
  * — see [[GifLzwKernel.stats]].
  */
case class GifPixelStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gif_pixel_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    GifLzwKernel.stats(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.GifLzwKernel.stats($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
