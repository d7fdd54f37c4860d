package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{Vp8lEncoder, Vp8lKernel}

/** VP8L codec: encoder↔decoder round trips across the four coding
  * lanes, hand-built streams for the decoder-only features the
  * encoder doesn't emit (color indexing + pixel bundling, all
  * predictor modes, the color transform, meta prefix groups), and
  * never-throw fuzz. No second WebP implementation exists in this
  * container (ImageIO has no WebP plugin), so these are the
  * conformance evidence alongside the DuckDB gate row.
  */
class Vp8lSpec extends AnyFunSuite {

  private def px(a: Int, r: Int, g: Int, b: Int): Int =
    (a << 24) | (r << 16) | (g << 8) | b

  /** Deterministic raster in the synth-lane shapes. */
  private def raster(seed: Long, w: Int, h: Int, lane: Int): Array[Int] = {
    val p = 1 + (seed % 11).toInt
    Array.tabulate(w * h) { i =>
      if (lane == 0) {
        // ≤2 distinct values per channel → simple codes
        val r = ((11 * seed + 71 * (i % 2)) % 256).toInt
        val g = ((7 * seed + 53 * ((i / 2) % 2)) % 256).toInt
        val b = ((13 * seed + 31 * ((i / 4) % 2)) % 256).toInt
        px(255, r, g, b)
      } else {
        val j = i % p
        val r = ((11 * seed + 17 * j) % 256).toInt
        val g = ((7 * seed + 13 * j) % 256).toInt
        val b = ((13 * seed + 19 * j) % 256).toInt
        val a = if (lane == 3) ((5 * seed + 3 * j) % 256).toInt else 255
        px(a, r, g, b)
      }
    }
  }

  test("round trips: every lane × subtract-green × assorted shapes") {
    for {
      seed <- Seq(1L, 2L, 3L, 17L, 40L, 123L, 4096L)
      lane <- 0 to 3
      sg <- Seq(false, true)
    } {
      val w = 4 + (seed % 21).toInt
      val h = 3 + (seed % 13).toInt
      val cacheBits = if (lane == 3) 1 + (seed % 10).toInt else 0
      val in = raster(seed, w, h, lane)
      val enc = Vp8lEncoder.encode(in, w, lane, sg, cacheBits)
      val dec = Vp8lKernel.decodePixels(enc)
      assert(dec != null, s"seed $seed lane $lane sg $sg: decode rejected")
      val (dw, dh, out) = dec
      assert(dw === w && dh === h, s"seed $seed lane $lane: dims")
      assert(out.toSeq === in.toSeq,
        s"seed $seed lane $lane sg $sg cache $cacheBits: pixel mismatch")
    }
  }

  test("degenerate rasters: 1x1, single color, two colors, full-range row") {
    for ((in, w) <- Seq(
      (Array(px(255, 7, 8, 9)), 1),
      (Array.fill(64)(px(255, 200, 100, 50)), 8),
      (Array.tabulate(64)(i => if (i % 2 == 0) px(255, 1, 2, 3) else px(255, 250, 251, 252)), 8),
      (Array.tabulate(256)(i => px(255, i, 255 - i, (i * 7) % 256)), 16));
        lane <- 0 to 3; sg <- Seq(false, true)) {
      val usable = lane != 0 ||
        in.map(v => (v >>> 16) & 0xFF).distinct.length <= 2 &&
          in.map(v => (v >>> 8) & 0xFF).distinct.length <= 2 &&
          in.map(_ & 0xFF).distinct.length <= 2
      // lane 0's simple-code fallback inside writeCode handles >2-value
      // channels too (it switches to normal codes per tree), so encode
      // everything on every lane
      val enc = Vp8lEncoder.encode(in, w, lane, sg, if (lane == 3) 4 else 0)
      val dec = Vp8lKernel.decodePixels(enc)
      assert(dec != null && dec._3.toSeq === in.toSeq,
        s"lane $lane sg $sg w $w (usable=$usable): mismatch")
    }
  }

  test("LZ77 2D map codes: dist==1 runs and dist==w vertical copies decode") {
    // a row of one color then identical rows: greedy matcher emits
    // dist-1 and dist-w copies, which the encoder maps through plane
    // codes 2 and 1 — asserting the kCodeToPlane entries round-trip
    val w = 12
    val h = 6
    val in = Array.tabulate(w * h)(i => if (i < w) px(255, 9, 99, 199) else px(255, 9, 99, 199))
    val enc = Vp8lEncoder.encode(in, w, 2, false, 0)
    val dec = Vp8lKernel.decodePixels(enc)
    assert(dec != null && dec._3.toSeq === in.toSeq)
  }

  test("stats matches a brute-force recount of decodePixels") {
    val in = raster(77L, 10, 7, 2)
    val enc = Vp8lEncoder.encode(in, 10, 2, true, 0)
    val st = Vp8lKernel.stats(enc)
    assert(st != null)
    val n = in.length.toLong
    assert(st.getLong(0) === n)
    assert(st.getLong(1) === in.map(v => ((v >>> 16) & 0xFF).toLong).sum)
    assert(st.getLong(2) === in.map(v => ((v >>> 8) & 0xFF).toLong).sum)
    assert(st.getLong(3) === in.map(v => (v & 0xFF).toLong).sum)
    assert(st.getLong(4) === in.map(v =>
      math.max((v >>> 16) & 0xFF, math.max((v >>> 8) & 0xFF, v & 0xFF)).toLong).max)
  }

  // ---- hand-built streams for decoder-only features ----

  /** Minimal LSB-first bit writer for spec-side stream construction. */
  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0L
    private var cnt = 0
    def put(v: Int, n: Int): Unit = {
      cur |= (v.toLong & ((1L << n) - 1)) << cnt
      cnt += n
      while (cnt >= 8) { out.write((cur & 0xFF).toInt); cur >>>= 8; cnt -= 8 }
    }
    def bytes(): Array[Byte] = {
      val flushed = if (cnt > 0) out.toByteArray :+ (cur & 0xFF).toByte
        else out.toByteArray
      flushed
    }
  }

  private def container(body: Array[Byte]): Array[Byte] = {
    val padded = body.length + (body.length & 1)
    val riff = 4 + 8 + padded
    val o = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { o.write(v & 0xFF); o.write((v >> 8) & 0xFF); o.write((v >> 16) & 0xFF); o.write((v >> 24) & 0xFF) }
    "RIFF".foreach(c => o.write(c))
    le32(riff)
    "WEBPVP8L".foreach(c => o.write(c))
    le32(body.length)
    o.write(body, 0, body.length)
    if ((body.length & 1) == 1) o.write(0)
    o.toByteArray
  }

  private def header(bw: Bw, w: Int, h: Int): Unit = {
    bw.put(0x2F, 8)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1) // alpha hint
    bw.put(0, 3) // version
  }

  /** Write a 2-symbol simple code over (s0, s1); the canonical bit for
    * a symbol is 0 for the smaller VALUE, 1 for the larger.
    */
  private def simple2(bw: Bw, s0: Int, s1: Int): Unit = {
    bw.put(1, 1) // simple
    bw.put(1, 1) // two symbols
    val first8 = if (s0 > 1) 1 else 0
    bw.put(first8, 1)
    bw.put(s0, if (first8 == 1) 8 else 1)
    bw.put(s1, 8)
  }

  private def simple1(bw: Bw, s0: Int): Unit = {
    bw.put(1, 1)
    bw.put(0, 1) // one symbol
    val first8 = if (s0 > 1) 1 else 0
    bw.put(first8, 1)
    bw.put(s0, if (first8 == 1) 8 else 1)
  }

  /** Entropy-coded sub/main image with per-channel 1-or-2-symbol
    * simple codes; `pixels` must use only those symbols. Starts with
    * the cache bit (0) and — when `level0` — the meta bit (0).
    */
  private def writeSimpleImage(bw: Bw, pixels: Array[Int], level0: Boolean): Unit = {
    bw.put(0, 1) // no color cache
    if (level0) bw.put(0, 1) // no meta groups
    def chan(shift: Int): Seq[Int] =
      pixels.map(p => (p >>> shift) & 0xFF).distinct.sorted.toSeq
    val (gs, rs, bs, as) = (chan(8), chan(16), chan(0), chan(24))
    def code(bwx: Bw, syms: Seq[Int]): Unit =
      if (syms.size == 1) simple1(bwx, syms.head) else {
        assert(syms.size == 2, s"simple image needs ≤2 symbols, got $syms")
        simple2(bwx, syms.head, syms.last)
      }
    code(bw, gs); code(bw, rs); code(bw, bs); code(bw, as)
    simple1(bw, 0) // distance tree unused
    pixels.foreach { p =>
      def emit(syms: Seq[Int], v: Int): Unit =
        if (syms.size == 2) bw.put(if (v == syms.head) 0 else 1, 1)
      emit(gs, (p >>> 8) & 0xFF)
      emit(rs, (p >>> 16) & 0xFF)
      emit(bs, p & 0xFF)
      emit(as, (p >>> 24) & 0xFF)
    }
  }

  test("color indexing: palette + 2-bit pixel bundling decodes") {
    // 4×2 image over a 4-color palette → widthBits 2, packed width 1
    val pal = Array(px(255, 10, 20, 30), px(255, 40, 50, 60),
      px(255, 70, 80, 90), px(255, 200, 210, 220))
    val idx = Array(0, 1, 2, 3, 3, 2, 1, 0) // row-major 4×2
    val bw = new Bw
    header(bw, 4, 2)
    bw.put(1, 1); bw.put(3, 2) // transform: color indexing
    bw.put(pal.length - 1, 8)
    // palette image (4×1), DELTA-coded per byte channel
    val deltas = pal.zipWithIndex.map { case (p, i) =>
      if (i == 0) p
      else {
        val q = pal(i - 1)
        def d(sh: Int) = (((p >>> sh) & 0xFF) - ((q >>> sh) & 0xFF)) & 0xFF
        (d(24) << 24) | (d(16) << 16) | (d(8) << 8) | d(0)
      }
    }
    writeFlatImage(bw, deltas, level0 = false)
    bw.put(0, 1) // end of transforms
    // packed image: 1×2, indices in the green byte, 2 bits per pixel
    val packed = Array(
      px(0, 0, idx(0) | (idx(1) << 2) | (idx(2) << 4) | (idx(3) << 6), 0),
      px(0, 0, idx(4) | (idx(5) << 2) | (idx(6) << 4) | (idx(7) << 6), 0))
    writeSimpleImage(bw, packed, level0 = true)
    val dec = Vp8lKernel.decodePixels(container(bw.bytes()))
    assert(dec != null, "palette stream rejected")
    assert(dec._1 === 4 && dec._2 === 2)
    assert(dec._3.toSeq === idx.map(pal).toSeq)
  }

  /** Re-implementation of the predictor modes for expected-value
    * computation (independent arithmetic path from the kernel's).
    */
  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int = {
    def ave(a: Int, b: Int): Int = {
      def c(sh: Int) = (((a >>> sh) & 0xFF) + ((b >>> sh) & 0xFF)) >> 1
      (c(24) << 24) | (c(16) << 16) | (c(8) << 8) | c(0)
    }
    def clamp(v: Int) = math.max(0, math.min(255, v))
    mode match {
      case 0 => 0xFF000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => ave(ave(l, tr), t)
      case 6 => ave(l, tl)
      case 7 => ave(l, t)
      case 8 => ave(tl, t)
      case 9 => ave(t, tr)
      case 10 => ave(ave(l, tl), ave(t, tr))
      case 11 =>
        def s3(sh: Int) = {
          val (a, b, c) = ((t >>> sh) & 0xFF, (l >>> sh) & 0xFF, (tl >>> sh) & 0xFF)
          math.abs(b - c) - math.abs(a - c)
        }
        if (s3(24) + s3(16) + s3(8) + s3(0) <= 0) t else l
      case 12 =>
        def c(sh: Int) = clamp(((l >>> sh) & 0xFF) + ((t >>> sh) & 0xFF) - ((tl >>> sh) & 0xFF))
        (c(24) << 24) | (c(16) << 16) | (c(8) << 8) | c(0)
      case 13 =>
        val av = ave(l, t)
        def c(sh: Int) = {
          val a = (av >>> sh) & 0xFF; val b = (tl >>> sh) & 0xFF
          clamp(a + (a - b) / 2)
        }
        (c(24) << 24) | (c(16) << 16) | (c(8) << 8) | c(0)
    }
  }

  private def revBits(v: Int, n: Int): Int = {
    var r = 0; var i = 0
    while (i < n) { r = (r << 1) | ((v >> i) & 1); i += 1 }
    r
  }

  /** Write a FLAT 8-bit prefix code (all 256 byte symbols at length
    * 8 — complete by construction) via the code-length-coded path:
    * the code-length tree is the single symbol "8", so each of the
    * 256 length reads consumes zero bits, and the max-symbol stop
    * trims any tail of the alphabet beyond 256 (the green tree's
    * length/cache symbols). Canonical code of byte s is s itself.
    */
  private def flatCode(bw: Bw, alphabet: Int): Unit = {
    bw.put(0, 1) // not simple
    // kOrder index of symbol 8 is 11 → 12 entries, all zero but the last
    bw.put(12 - 4, 4)
    for (k <- 0 until 12) bw.put(if (k == 11) 1 else 0, 3)
    if (alphabet > 256) {
      bw.put(1, 1) // use max-symbol: exactly 256 reads
      bw.put(3, 3) // length_nbits = 2 + 2*3 = 8
      bw.put(256 - 2, 8)
    } else bw.put(0, 1)
    // 256 zero-bit reads of "8" follow implicitly (single-symbol tree)
  }

  /** Entropy-coded image where every channel uses the flat 8-bit
    * code: arbitrary byte content, 8 bits per channel per pixel.
    */
  private def writeFlatImage(bw: Bw, pixels: Array[Int], level0: Boolean): Unit = {
    bw.put(0, 1) // no color cache
    if (level0) bw.put(0, 1) // no meta groups
    flatCode(bw, 280) // green
    flatCode(bw, 256) // red
    flatCode(bw, 256) // blue
    flatCode(bw, 256) // alpha
    simple1(bw, 0) // distance tree unused
    pixels.foreach { p =>
      bw.put(revBits((p >>> 8) & 0xFF, 8), 8)
      bw.put(revBits((p >>> 16) & 0xFF, 8), 8)
      bw.put(revBits(p & 0xFF, 8), 8)
      bw.put(revBits((p >>> 24) & 0xFF, 8), 8)
    }
  }

  test("predictor transform: every mode reconstructs a known raster") {
    // 4×4 with predictor bits=2 → one mode for the whole image; for
    // each of the 14 modes, compute residuals with an independent
    // forward pass and require exact recovery through the kernel
    val w = 4; val h = 4
    val target = Array.tabulate(w * h) { i =>
      px(255, (i * 37 + 11) % 256, (i * 53 + 5) % 256, (i * 71 + 99) % 256)
    }
    for (mode <- 0 to 13) {
      // residual(i) = target(i) - pred(i) per byte (mod 256), where
      // pred uses already-FINAL neighbor pixels
      val res = new Array[Int](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val i = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xFF000000
          else if (y == 0) target(i - 1)
          else if (x == 0) target(i - w)
          else predict(mode, target(i - 1), target(i - w), target(i - w - 1),
            target(i - w + 1)) // x==w-1 wraps to current row start
        def d(sh: Int) = (((target(i) >>> sh) & 0xFF) - ((pred >>> sh) & 0xFF)) & 0xFF
        res(i) = (d(24) << 24) | (d(16) << 16) | (d(8) << 8) | d(0)
      }
      val bw = new Bw
      header(bw, w, h)
      bw.put(1, 1); bw.put(0, 2) // transform: predictor
      bw.put(0, 3) // size bits - 2 = 0 → block bits 2 → 1×1 sub-image
      writeSimpleImage(bw, Array(px(0, 0, mode, 0)), level0 = false)
      bw.put(0, 1) // end of transforms
      writeFlatImage(bw, res, level0 = true)
      val dec = Vp8lKernel.decodePixels(container(bw.bytes()))
      assert(dec != null, s"mode $mode: stream rejected")
      assert(dec._3.toSeq === target.toSeq, s"mode $mode: raster mismatch")
    }
  }

  test("color transform: cross-channel deltas reconstruct") {
    val w = 4; val h = 2
    // one transform element for the whole image (bits=2 → 1×1)
    val g2r = 0x90; val g2b = 0x23; val r2b = 0xF1 // signed int8 semantics
    def delta(t: Int, c: Int): Int = (t.toByte.toInt * c.toByte.toInt) >> 5
    // 2-valued target channels keep the residual image simple-codable
    val target = Array.tabulate(w * h)(i =>
      if (i % 2 == 0) px(255, 100, 30, 200) else px(255, 9, 250, 77))
    val res = target.map { p =>
      val r = (p >>> 16) & 0xFF; val g = (p >>> 8) & 0xFF; val b = p & 0xFF
      val rr = (r - delta(g2r, g)) & 0xFF
      val bb = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
      (p & 0xFF00FF00) | (rr << 16) | bb
    }
    val bw = new Bw
    header(bw, w, h)
    bw.put(1, 1); bw.put(1, 2) // transform: color
    bw.put(0, 3) // block bits 2 → 1×1 sub-image
    // CTE pixel: red byte = red_to_blue, green = green_to_blue, blue = green_to_red
    writeSimpleImage(bw, Array((0 << 24) | (r2b << 16) | (g2b << 8) | g2r),
      level0 = false)
    bw.put(0, 1)
    writeSimpleImage(bw, res, level0 = true)
    val dec = Vp8lKernel.decodePixels(container(bw.bytes()))
    assert(dec != null, "color-transform stream rejected")
    assert(dec._3.toSeq === target.toSeq)
  }

  test("meta prefix groups: two groups select by block") {
    // 8×2 image, meta bits=2 → entropy image 2×1 → groups 0 and 1;
    // group 0 codes {A}, group 1 codes {B} as single-symbol trees, so
    // the pixel stream consumes ZERO bits and correctness hinges
    // entirely on per-block group selection
    val w = 8; val h = 2
    val A = px(255, 1, 2, 3)
    val B = px(255, 200, 100, 50)
    val bw = new Bw
    header(bw, w, h)
    bw.put(0, 1) // no transforms
    bw.put(0, 1) // no cache
    bw.put(1, 1) // meta groups
    bw.put(0, 3) // meta bits - 2 = 0 → bits 2 → entropy image 2×1
    // entropy image pixels: group index in (red<<8)|green → green byte
    writeSimpleImage(bw, Array(px(0, 0, 0, 0), px(0, 0, 1, 0)), level0 = false)
    // group 0: all trees single-symbol for A
    def group(bwx: Bw, p: Int): Unit = {
      simple1(bwx, (p >>> 8) & 0xFF)
      simple1(bwx, (p >>> 16) & 0xFF)
      simple1(bwx, p & 0xFF)
      simple1(bwx, (p >>> 24) & 0xFF)
      simple1(bwx, 0)
    }
    group(bw, A)
    group(bw, B)
    // 16 pixels, zero stream bits
    val dec = Vp8lKernel.decodePixels(container(bw.bytes()))
    assert(dec != null, "meta stream rejected")
    val expect = Array.tabulate(w * h) { i =>
      val x = i % w
      if ((x >> 2) == 0) A else B
    }
    assert(dec._3.toSeq === expect.toSeq)
  }

  test("never throws on garbage: random bytes behind the VP8L magic") {
    val rnd = new scala.util.Random(4242)
    var nonNull = 0
    for (_ <- 0 until 4000) {
      val tail = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(tail)
      val size = tail.length + 13
      val p = "RIFF".getBytes("US-ASCII") ++
        Array(size.toByte, 0.toByte, 0.toByte, 0.toByte) ++
        "WEBPVP8L".getBytes("US-ASCII") ++
        Array((tail.length + 1).toByte, 0.toByte, 0.toByte, 0.toByte) ++
        Array(0x2F.toByte) ++ tail
      val r = Vp8lKernel.decodePixels(p) // must not throw
      if (r != null) nonNull += 1
      Vp8lKernel.stats(p)
    }
    // truncations of a VALID stream must also never throw
    val good = Vp8lEncoder.encode(raster(5L, 9, 5, 2), 9, 2, true, 0)
    for (cut <- 0 until good.length) {
      Vp8lKernel.decodePixels(good.take(cut))
    }
    assert(nonNull >= 0)
  }

  test("distance map table sanity: 120 unique in-range offsets") {
    assert(Vp8lKernel.DistX.length === 120)
    assert(Vp8lKernel.DistY.length === 120)
    val pairs = Vp8lKernel.DistX.zip(Vp8lKernel.DistY)
    assert(pairs.distinct.length === 120, "duplicate (x,y) offsets")
    assert(pairs.forall { case (x, y) => x >= -7 && x <= 8 && y >= 0 && y <= 7 })
    // the first eight entries are the spec's own prose example order
    assert(pairs.take(8).toSeq === Seq((0, 1), (1, 0), (1, 1), (-1, 1),
      (0, 2), (2, 0), (1, 2), (-1, 2)))
  }
}
