package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{PackBits, TiffLzw, TiffPixelKernel, TiffPixelSynthKernel}

/** TIFF pixel decode: the synth round trip over the full lane grid
  * (compression × color × layout × predictor), the two codec
  * primitives in isolation (TIFF-LZW with early change and table
  * reset; PackBits), profile-gate rejections (16-bit, planar,
  * palette, fill-order 2), and never-throw fuzz. ImageIO conformance
  * (both directions) lives in CodecConformanceSpec.
  */
class TiffPixelsSpec extends AnyFunSuite {

  /** The oracle's closed form, mirrored in Scala: raster byte j is
    * `(7d + 13j) mod 256`, channels at offsets min(spp-1, c).
    */
  private def expected(d: Long): (Long, Long, Long, Long, Long) = {
    val tiles = d % 5 == 2
    val w = (5 + d % 12 + (if (tiles) 16 else 0)).toInt
    val h = (4 + d % 9 + (if (tiles) 16 else 0)).toInt
    val spp = if (d % 3 == 0) 3 else 1
    val n = w * h
    var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0L
    var i = 0
    while (i < n) {
      def v(c: Int): Long = (7 * d + 13 * (spp * i + math.min(spp - 1, c))) % 256
      val r = v(0); val g = v(1); val b = v(2)
      sr += r; sg += g; sb += b
      peak = math.max(peak, math.max(r, math.max(g, b)))
      i += 1
    }
    (n.toLong, sr, sg, sb, peak)
  }

  test("synth round trips: every lane combination decodes to the closed form") {
    // 840 = lcm(8, 3, 5, 7): every (compression, color, strip count,
    // tile, predictor) combination appears at least once
    for (d <- 0L until 840L) {
      val st = TiffPixelKernel.stats(TiffPixelSynthKernel.synth(d))
      assert(st != null, s"doc $d rejected")
      val (n, sr, sg, sb, pk) = expected(d)
      assert(st.getLong(0) === n, s"doc $d n_pixels")
      assert(st.getLong(1) === sr, s"doc $d sum_r")
      assert(st.getLong(2) === sg, s"doc $d sum_g")
      assert(st.getLong(3) === sb, s"doc $d sum_b")
      assert(st.getLong(4) === pk, s"doc $d peak")
    }
  }

  test("TIFF LZW round trips: growth, KwKwK, width bumps, table reset") {
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      Array.emptyByteArray,
      Array[Byte](7),
      Array[Byte](7, 7),
      Array.fill(100)('a'.toByte), // KwKwK ladder
      Array.tabulate(257)(i => (i % 256).toByte),
      // small alphabet → deep chains; long enough for width 9→10→11
      Array.fill(6000)((rnd.nextInt(4) + 60).toByte),
      // high-entropy and long: forces the 4094-entry table reset
      { val a = new Array[Byte](20000); rnd.nextBytes(a); a })
    for ((data, k) <- cases.zipWithIndex) {
      val enc = TiffLzw.encode(data)
      val dec = TiffLzw.decode(enc, 0, enc.length, data.length)
      assert(dec != null, s"case $k failed to decode")
      assert(java.util.Arrays.equals(dec, data), s"case $k round trip")
    }
  }

  test("TIFF LZW decode rejects truncation and corrupt codes, never throws") {
    val data = Array.tabulate(500)(i => ((i * i + 3) % 256).toByte)
    val enc = TiffLzw.encode(data)
    for (cut <- 0 until enc.length)
      TiffLzw.decode(enc, 0, cut, data.length) // null or short, no throw
    assert(TiffLzw.decode(enc, 0, enc.length - 4, data.length) == null)
    // a code beyond the table: 12-bit all-ones right after clear
    val bad = Array[Byte](0x80.toByte, 0x0F, 0xFF.toByte, 0xC0.toByte)
    assert(TiffLzw.decode(bad, 0, bad.length, 8) == null)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val junk = new Array[Byte](rnd.nextInt(48))
      rnd.nextBytes(junk)
      TiffLzw.decode(junk, 0, junk.length, rnd.nextInt(64)) // must not throw
    }
  }

  test("PackBits round trips runs and literals; -128 is a noop") {
    val rnd = new scala.util.Random(9)
    val cases = Seq(
      Array.emptyByteArray,
      Array[Byte](5),
      Array.fill(500)(9.toByte), // long run, >128 chunking
      Array.tabulate(300)(i => (i % 251).toByte), // pure literals
      { // mixed: runs of 3-10 interleaved with literals
        val b = new scala.collection.mutable.ArrayBuffer[Byte]()
        for (i <- 0 until 50) {
          b ++= Array.fill(3 + i % 8)((i % 256).toByte)
          b += rnd.nextInt(256).toByte
        }
        b.toArray
      })
    for ((data, k) <- cases.zipWithIndex) {
      val enc = PackBits.encode(data)
      val dec = PackBits.decode(enc, 0, enc.length, data.length)
      assert(dec != null && java.util.Arrays.equals(dec, data),
        s"case $k round trip")
    }
    // hand stream: noop then a 3-literal op
    val hand = Array[Byte](-128, 2, 'x', 'y', 'z')
    val out = PackBits.decode(hand, 0, hand.length, 3)
    assert(out != null && new String(out, "US-ASCII") === "xyz")
  }

  private def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Minimal 4×2 gray uncompressed strip TIFF with every profile tag
    * explicit, so each single-tag mutation isolates one gate.
    */
  private def tinyTiff(bits: Int = 8, comp: Int = 1, pm: Int = 1,
      fill: Int = 1, planar: Int = 1, sampleFmt: Int = 1): Array[Byte] = {
    val nE = 12
    val dataOff = 8 + 2 + nE * 12 + 4
    def entry(tag: Int, typ: Int, cnt: Int, v: Int) =
      le16(tag) ++ le16(typ) ++ le32(cnt) ++
        (if (typ == 3) le16(v) ++ le16(0) else le32(v))
    Array[Byte]('I', 'I', 42, 0) ++ le32(8) ++ le16(nE) ++
      entry(0x0100, 3, 1, 4) ++
      entry(0x0101, 3, 1, 2) ++
      entry(0x0102, 3, 1, bits) ++
      entry(0x0103, 3, 1, comp) ++
      entry(0x0106, 3, 1, pm) ++
      entry(0x010A, 3, 1, fill) ++
      entry(0x0111, 4, 1, dataOff) ++
      entry(0x0115, 3, 1, 1) ++
      entry(0x0116, 4, 1, 2) ++
      entry(0x0117, 4, 1, 8) ++
      entry(0x011C, 3, 1, planar) ++
      entry(0x0153, 3, 1, sampleFmt) ++
      le32(0) ++
      Array.tabulate[Byte](8)(i => (i * 10 + 5).toByte)
  }

  test("profile gate: out-of-profile payloads return null, baseline decodes") {
    val ok = TiffPixelKernel.stats(tinyTiff())
    assert(ok != null && ok.getLong(0) === 8L)
    assert(ok.getLong(1) === (0 until 8).map(i => (i * 10 + 5).toLong).sum)
    assert(ok.getLong(4) === 75L)
    assert(TiffPixelKernel.stats(tinyTiff(bits = 16)) == null, "16-bit")
    assert(TiffPixelKernel.stats(tinyTiff(comp = 7)) == null, "JPEG-in-TIFF")
    assert(TiffPixelKernel.stats(tinyTiff(pm = 3)) == null, "palette")
    assert(TiffPixelKernel.stats(tinyTiff(fill = 2)) == null, "fill order 2")
    assert(TiffPixelKernel.stats(tinyTiff(planar = 2)) == null, "planar")
    assert(TiffPixelKernel.stats(tinyTiff(sampleFmt = 2)) == null,
      "signed samples")
  }

  test("truncation sweep and garbage fuzz never throw (every compression lane)") {
    // d = 1, 2, 5, 7 cover compressions 1, 5, 32773, 8
    for (d <- Seq(1L, 2L, 5L, 7L, 12L)) { // 12: tiles lane
      val good = TiffPixelSynthKernel.synth(d)
      for (cut <- 0 until good.length)
        TiffPixelKernel.stats(good.take(cut)) // must not throw
    }
    val rnd = new scala.util.Random(101)
    for (_ <- 0 until 4000) {
      val tail = new Array[Byte](rnd.nextInt(96))
      rnd.nextBytes(tail)
      val head = if (rnd.nextBoolean()) Array[Byte]('I', 'I', 42, 0)
        else Array[Byte]('M', 'M', 0, 42)
      TiffPixelKernel.stats(head ++ tail) // must not throw
    }
  }
}
