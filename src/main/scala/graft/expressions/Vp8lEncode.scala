package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** VP8L (WebP lossless) encoder — the synthesis-side inverse of
  * [[Vp8lKernel]] in the [[GifLzwEncoder]]/`JpegEncoder` convention:
  * test corpora carry REAL compressed payloads so the gate proves an
  * actual bitstream decode, not a header parse. Four coding lanes
  * exercise each decode path independently:
  *
  *  - lane 0: SIMPLE (1/2-symbol) prefix codes, literals only
  *  - lane 1: code-length-coded canonical prefix codes (with 16/17/18
  *    run codes and the max-symbol early stop), literals only
  *  - lane 2: lane 1 + LZ77 backward references (greedy search; the
  *    scan-line code space AND the 2D map entries for dist==1/dist==w)
  *  - lane 3: lane 2 + a color cache (caller-chosen bits)
  *
  * `subtractGreen` orthogonally applies (and announces) the
  * subtract-green transform. Each prefix code independently falls
  * back to the simple form when ≤2 byte-ranged symbols are used, so
  * every lane still exercises degenerate (single-symbol, 0-bit)
  * trees on its flat channels.
  */
object Vp8lEncoder {

  /** LSB-first bit writer. */
  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0L
    private var cnt = 0
    def put(v: Int, n: Int): Unit = {
      require(n >= 0 && n <= 24 && (v >> n) == 0 || n == 0 && v == 0,
        s"value $v does not fit $n bits")
      cur |= (v.toLong & ((1L << n) - 1)) << cnt
      cnt += n
      while (cnt >= 8) {
        out.write((cur & 0xFF).toInt)
        cur >>>= 8
        cnt -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (cnt > 0) { out.write((cur & 0xFF).toInt); cur = 0; cnt = 0 }
      out.toByteArray
    }
  }

  /** Length-limited canonical code lengths (zlib gen_bitlen-style
    * overflow repair), most-frequent symbol shortest; single-used
    * symbol marked length 1 per the spec convention.
    */
  private[expressions] def codeLengths(freq: Array[Int], maxLen: Int): Array[Int] = {
    val n = freq.length
    val lengths = new Array[Int](n)
    val used = (0 until n).filter(freq(_) > 0)
    if (used.isEmpty) return lengths
    if (used.size == 1) { lengths(used.head) = 1; return lengths }
    // plain Huffman depths via two sorted queues
    case class Node(w: Long, depth: Int, syms: List[Int])
    var q = used.map(s => Node(freq(s), 0, List(s))).sortBy(_.w).toList
    val depths = new Array[Int](n)
    def merge(a: Node, b: Node): Node =
      Node(a.w + b.w, math.max(a.depth, b.depth) + 1, a.syms ++ b.syms)
    while (q.size > 1) {
      val sorted = q.sortBy(nd => (nd.w, nd.depth))
      val m = merge(sorted.head, sorted.tail.head)
      m.syms.foreach(s => depths(s) += 1)
      q = m :: sorted.drop(2)
    }
    used.foreach(s => lengths(s) = depths(s))
    // limit to maxLen: clamp, then repair the Kraft sum
    val cnt = new Array[Int](maxLen + 1)
    used.foreach { s =>
      if (lengths(s) > maxLen) lengths(s) = maxLen
      cnt(lengths(s)) += 1
    }
    var kraft = 0L
    (1 to maxLen).foreach(l => kraft += cnt(l).toLong << (maxLen - l))
    while (kraft > (1L << maxLen)) {
      // split one leaf above max depth into an internal node adopting
      // one max-depth leaf (zlib gen_bitlen trick): Kraft drops by 1
      var bits = maxLen - 1
      while (cnt(bits) == 0) bits -= 1
      cnt(bits) -= 1
      cnt(bits + 1) += 2
      cnt(maxLen) -= 1
      kraft -= 1
    }
    // under-full is possible after clamping? Huffman is complete and the
    // repair preserves completeness, so kraft == 1<<maxLen here.
    // reassign: most frequent → shortest (ties by symbol for determinism)
    val bySym = used.sortBy(s => (-freq(s), s))
    val lens = (1 to maxLen).flatMap(l => Seq.fill(cnt(l))(l)).sorted
    val outL = new Array[Int](n)
    bySym.zip(lens).foreach { case (s, l) => outL(s) = l }
    outL
  }

  /** Canonical code values (MSB-first semantics) for given lengths. */
  private[expressions] def canonCodes(lengths: Array[Int], maxLen: Int): Array[Int] = {
    val cnt = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) cnt(l) += 1)
    val next = new Array[Int](maxLen + 2)
    var code = 0
    for (l <- 1 to maxLen) {
      code = (code + cnt(l - 1)) << 1
      next(l) = code
    }
    val codes = new Array[Int](lengths.length)
    for (s <- lengths.indices if lengths(s) > 0) {
      codes(s) = next(lengths(s))
      next(lengths(s)) += 1
    }
    codes
  }

  private def revBits(v: Int, n: Int): Int = {
    var r = 0
    var i = 0
    while (i < n) { r = (r << 1) | ((v >> i) & 1); i += 1 }
    r
  }

  /** Emit one canonical code (MSB-first) into the LSB-first stream. */
  private def putCode(bw: Bw, code: Int, len: Int): Unit =
    bw.put(revBits(code, len), len)

  private val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Write one prefix code; returns (lengths, codes) for the symbol
    * emission pass.
    */
  private def writeCode(bw: Bw, freq: Array[Int]): (Array[Int], Array[Int]) = {
    val used = (0 until freq.length).filter(freq(_) > 0)
    if (used.size <= 2 && (used.isEmpty || used.max <= 255)) {
      // simple code (unused tree → the spec-conventional 1-symbol 0)
      val syms = if (used.isEmpty) Seq(0) else used.sorted
      bw.put(1, 1)
      bw.put(if (syms.size == 2) 1 else 0, 1)
      val first8 = if (syms.head > 1) 1 else 0
      bw.put(first8, 1)
      bw.put(syms.head, if (first8 == 1) 8 else 1)
      if (syms.size == 2) bw.put(syms(1), 8)
      val lengths = new Array[Int](freq.length)
      syms.foreach(lengths(_) = 1)
      if (syms.size == 1) (lengths, canonCodes(lengths, 15))
      else (lengths, canonCodes(lengths, 15))
    } else {
      bw.put(0, 1)
      val lengths = codeLengths(freq, 15)
      // RLE-tokenize the length sequence (16: repeat prev nonzero 3-6,
      // 17: 3-10 zeros, 18: 11-138 zeros), trimming trailing zeros via
      // the max-symbol path
      var lastUsed = lengths.length - 1
      while (lastUsed >= 0 && lengths(lastUsed) == 0) lastUsed -= 1
      val tokens = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
      var i = 0
      var prev = 8
      while (i <= lastUsed) {
        val v = lengths(i)
        var run = 1
        while (i + run <= lastUsed && lengths(i + run) == v) run += 1
        if (v == 0) {
          var left = run
          while (left >= 3) {
            if (left >= 11) {
              val take = math.min(left, 138)
              tokens += ((18, take - 11, 7)); left -= take
            } else {
              val take = math.min(left, 10)
              tokens += ((17, take - 3, 3)); left -= take
            }
          }
          while (left > 0) { tokens += ((0, -1, 0)); left -= 1 }
        } else {
          tokens += ((v, -1, 0))
          prev = v
          var left = run - 1
          while (left >= 3) {
            val take = math.min(left, 6)
            tokens += ((16, take - 3, 2)); left -= take
          }
          while (left > 0) { tokens += ((v, -1, 0)); left -= 1 }
        }
        i += run
      }
      // code-length code
      val clFreq = new Array[Int](19)
      tokens.foreach(t => clFreq(t._1) += 1)
      val clLen = codeLengths(clFreq, 7)
      val clCodes = canonCodes(clLen, 7)
      var numCodes = 19
      while (numCodes > 4 && clLen(ClOrder(numCodes - 1)) == 0) numCodes -= 1
      bw.put(numCodes - 4, 4)
      (0 until numCodes).foreach(k => bw.put(clLen(ClOrder(k)), 3))
      // max-symbol: number of symbol READS (trims trailing zeros)
      if (lastUsed < lengths.length - 1) {
        bw.put(1, 1)
        val reads = tokens.size
        var nb = 2
        while ((1 << nb) <= reads - 2 && nb < 16) nb += 2
        bw.put((nb - 2) / 2, 3)
        bw.put(reads - 2, nb)
      } else bw.put(0, 1)
      tokens.foreach { case (sym, extraV, extraB) =>
        putCode(bw, clCodes(sym), clLen(sym))
        if (extraB > 0) bw.put(extraV, extraB)
      }
      (lengths, canonCodes(lengths, 15))
    }
  }

  /** LZ77 prefix-value split: (symbol, extraValue, extraBits). */
  private def prefixSplit(v: Int): (Int, Int, Int) = {
    require(v >= 1)
    if (v <= 4) (v - 1, 0, 0)
    else {
      var c = 4
      while (true) {
        val extra = (c - 2) >> 1
        val lo = ((2 + (c & 1)) << extra) + 1
        val hi = lo + (1 << extra) - 1
        if (v >= lo && v <= hi) return (c, v - lo, extra)
        c += 1
      }
      throw new IllegalStateException("unreachable")
    }
  }

  private def distToCode(dist: Int, w: Int): Int =
    if (dist == 1) 2 // 2D map entry (1, 0)
    else if (dist == w) 1 // 2D map entry (0, 1)
    else dist + 120

  // token kinds for the pixel stream
  private final val TLit = 0
  private final val TCopy = 1
  private final val TCache = 2
  private final case class Tok(kind: Int, a: Int, b: Int)

  /** Encode `argb` (row-major, length divisible by `w`) as a full
    * WebP container with a single VP8L chunk.
    */
  def encode(argb: Array[Int], w: Int, lane: Int, subtractGreen: Boolean,
      cacheBits: Int): Array[Byte] = {
    require(w > 0 && argb.length > 0 && argb.length % w == 0,
      s"bad raster: ${argb.length} pixels, width $w")
    val h = argb.length / w
    require(w <= 16384 && h <= 16384, s"dims $w x $h exceed VP8L's 14 bits")
    require(lane >= 0 && lane <= 3 && cacheBits >= 0 && cacheBits <= 11)
    val useCache = lane == 3 && cacheBits > 0
    val useLz = lane >= 2
    val hasAlpha = argb.exists(p => (p >>> 24) != 0xFF)

    // forward subtract-green
    val px = if (!subtractGreen) argb else argb.map { v =>
      val g = (v >>> 8) & 0xFF
      (v & 0xFF00FF00) |
        ((((v >>> 16) & 0xFF) - g) & 0xFF) << 16 |
        (((v & 0xFF) - g) & 0xFF)
    }

    // tokenize with a simulated color cache
    val cacheSize = if (useCache) 1 << cacheBits else 0
    val cache = if (useCache) new Array[Int](cacheSize) else null
    val cacheSeen = if (useCache) new Array[Boolean](cacheSize) else null
    def cacheKey(v: Int): Int = (0x1e35a7bd * v) >>> (32 - cacheBits)
    def cacheInsert(v: Int): Unit =
      if (useCache) { val k = cacheKey(v); cache(k) = v; cacheSeen(k) = true }
    val toks = scala.collection.mutable.ArrayBuffer[Tok]()
    var pos = 0
    val n = px.length
    while (pos < n) {
      var bestLen = 0
      var bestDist = 0
      if (useLz) {
        val maxD = math.min(pos, 64)
        var d = 1
        while (d <= maxD) {
          var l = 0
          while (pos + l < n && px(pos + l - d) == px(pos + l) && l < 4096) l += 1
          if (l > bestLen) { bestLen = l; bestDist = d }
          d += 1
        }
      }
      if (bestLen >= 3) {
        toks += Tok(TCopy, bestLen, bestDist)
        var k = 0
        while (k < bestLen) { cacheInsert(px(pos + k)); k += 1 }
        pos += bestLen
      } else {
        val v = px(pos)
        if (useCache && cacheSeen(cacheKey(v)) && cache(cacheKey(v)) == v) {
          toks += Tok(TCache, cacheKey(v), 0)
        } else {
          toks += Tok(TLit, v, 0)
        }
        cacheInsert(v)
        pos += 1
      }
    }

    // histograms over the five alphabets
    val gFreq = new Array[Int](256 + 24 + cacheSize)
    val rFreq = new Array[Int](256)
    val bFreq = new Array[Int](256)
    val aFreq = new Array[Int](256)
    val dFreq = new Array[Int](40)
    toks.foreach {
      case Tok(TLit, v, _) =>
        gFreq((v >>> 8) & 0xFF) += 1
        rFreq((v >>> 16) & 0xFF) += 1
        bFreq(v & 0xFF) += 1
        aFreq((v >>> 24) & 0xFF) += 1
      case Tok(TCopy, len, dist) =>
        gFreq(256 + prefixSplit(len)._1) += 1
        dFreq(prefixSplit(distToCode(dist, w))._1) += 1
      case Tok(TCache, idx, _) =>
        gFreq(280 + idx) += 1
      case _ => ()
    }

    val bw = new Bw
    bw.put(0x2F, 8)
    val word = ((w - 1).toLong | ((h - 1).toLong << 14) |
      (if (hasAlpha) 1L << 28 else 0L)) & 0xFFFFFFFFL
    bw.put((word & 0xFFF).toInt, 12)
    bw.put(((word >> 12) & 0xFFF).toInt, 12)
    bw.put(((word >> 24) & 0xFF).toInt, 8)
    // transforms
    if (subtractGreen) { bw.put(1, 1); bw.put(2, 2) }
    bw.put(0, 1) // end of transforms
    // color cache
    if (useCache) { bw.put(1, 1); bw.put(cacheBits, 4) } else bw.put(0, 1)
    bw.put(0, 1) // no meta prefix groups
    val (gLen, gCodes) = writeCode(bw, gFreq)
    val (rLen, rCodes) = writeCode(bw, rFreq)
    val (bLen, bCodes) = writeCode(bw, bFreq)
    val (aLen, aCodes) = writeCode(bw, aFreq)
    val (dLen, dCodes) = writeCode(bw, dFreq)
    // a tree with exactly one used symbol consumes 0 bits on read
    def multi(lens: Array[Int]): Boolean = lens.count(_ > 0) >= 2
    val (gM, rM, bM, aM, dM) =
      (multi(gLen), multi(rLen), multi(bLen), multi(aLen), multi(dLen))
    def emit(m: Boolean, codes: Array[Int], lens: Array[Int], s: Int): Unit =
      if (m) putCode(bw, codes(s), lens(s))
    toks.foreach {
      case Tok(TLit, v, _) =>
        emit(gM, gCodes, gLen, (v >>> 8) & 0xFF)
        emit(rM, rCodes, rLen, (v >>> 16) & 0xFF)
        emit(bM, bCodes, bLen, v & 0xFF)
        emit(aM, aCodes, aLen, (v >>> 24) & 0xFF)
      case Tok(TCopy, len, dist) =>
        val (ls, lev, leb) = prefixSplit(len)
        emit(gM, gCodes, gLen, 256 + ls)
        if (leb > 0) bw.put(lev, leb)
        val (ds, dev, deb) = prefixSplit(distToCode(dist, w))
        emit(dM, dCodes, dLen, ds)
        if (deb > 0) bw.put(dev, deb)
      case Tok(TCache, idx, _) =>
        emit(gM, gCodes, gLen, 280 + idx)
      case _ => ()
    }
    val body = bw.finish()

    // RIFF container
    val chunkLen = body.length
    val padded = chunkLen + (chunkLen & 1)
    val riffSize = 4 + 8 + padded
    val out = new java.io.ByteArrayOutputStream(12 + 8 + padded)
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    le32(riffSize)
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    out.write('V'); out.write('P'); out.write('8'); out.write('L')
    le32(chunkLen)
    out.write(body, 0, body.length)
    if ((chunkLen & 1) == 1) out.write(0)
    out.toByteArray
  }
}

/** `vp8l_encode(array<int> argb, int width, int config) → binary` —
  * full WebP container; `config = lane | cacheBits << 4 |
  * subtractGreen << 8`. See [[Vp8lEncoder.encode]].
  */
case class Vp8lEncode(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "vp8l_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, int, int), got $other")
    }

  override def nullSafeEval(px: Any, w: Any, cfg: Any): Any = {
    val c = cfg.asInstanceOf[Int]
    Vp8lEncoder.encode(px.asInstanceOf[ArrayData].toIntArray(),
      w.asInstanceOf[Int], c & 0xF, ((c >> 8) & 1) == 1, (c >> 4) & 0xF)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, w, cfg) => s"""
      |${ev.value} = graft.expressions.Vp8lEncoder.encode(
      |  $px.toIntArray(), $w, $cfg & 0xF, (($cfg >> 8) & 1) == 1,
      |  ($cfg >> 4) & 0xF);
      |""".stripMargin)

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `webp_pixel_stats(payload) → array<long>` of (n_pixels, sum_r,
  * sum_g, sum_b, peak_byte) via a full VP8L decode — see
  * [[Vp8lKernel.stats]].
  */
case class WebpPixelStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "webp_pixel_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    Vp8lKernel.stats(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.Vp8lKernel.stats($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
