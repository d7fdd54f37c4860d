package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{TiffMetaKernel, TiffSynthKernel}

/** TIFF IFD walker: synth round trips over the full lane grid, the
  * structural edges the gate lane cannot exercise (IFD-chain cycles,
  * truncation, out-of-bounds unit offsets), and never-throw fuzz.
  */
class TiffSpec extends AnyFunSuite {

  test("synth round trips: every lane combination parses to its formulas") {
    for (d <- 0L until 240L) {
      val p = TiffSynthKernel.synth(d)
      val r = TiffMetaKernel.parse(p)
      assert(r != null, s"doc $d rejected")
      assert(r.getBoolean(0), s"doc $d invalid")
      assert(r.getUTF8String(1).toString ===
        (if (d % 2 == 0) "II" else "MM"), s"doc $d byte order")
      assert(r.getLong(2) === (if (d % 4 == 0) 2L else 1L), s"doc $d n_ifds")
      val tiles = d % 5 == 2
      assert(r.getLong(3) === (if (tiles) 10L else 9L), s"doc $d entries")
      assert(r.getLong(4) === 16 + d % 240, s"doc $d width")
      assert(r.getLong(5) === 8 + d % 120, s"doc $d height")
      assert(r.getLong(6) === 8L, s"doc $d bps")
      val spp = if (d % 3 == 0) 3L else 1L
      assert(r.getLong(7) === spp, s"doc $d spp")
      assert(r.getLong(8) === Array(1L, 5L, 32773L)(((d / 2) % 3).toInt),
        s"doc $d compression")
      assert(r.getLong(9) === (if (spp == 3) 2L else d % 2), s"doc $d pm")
      assert(r.getUTF8String(10).toString ===
        (if (tiles) "tile" else "strip"), s"doc $d layout")
      val w = 16 + d % 240; val h = 8 + d % 120
      val ns = 1 + d % 3
      val expUnits =
        if (tiles) ((w + 15) / 16) * ((h + 15) / 16) else ns
      assert(r.getLong(11) === expUnits, s"doc $d n_units")
      if (tiles) {
        assert(r.isNullAt(12) && r.getLong(13) === 16L && r.getLong(14) === 16L,
          s"doc $d tile geometry")
      } else {
        assert(r.getLong(12) === (h + ns - 1) / ns && r.isNullAt(13) &&
          r.isNullAt(14), s"doc $d strip geometry")
      }
      assert(r.getBoolean(15), s"doc $d consistency")
    }
  }

  private def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  test("IFD chain cycle is bounded, not an infinite loop") {
    // IFD0 with zero entries whose next pointer loops back to itself
    val p = Array[Byte]('I', 'I', 42, 0) ++ le32(8) ++ le16(0) ++ le32(8)
    val r = TiffMetaKernel.parse(p)
    assert(r != null)
    assert(r.getLong(2) === TiffMetaKernel.MaxIfds.toLong, "cycle must cap")
  }

  test("out-of-bounds strip offset flags header_consistent false") {
    // one entry: StripOffsets LONG count 1 pointing past the payload
    val p = Array[Byte]('I', 'I', 42, 0) ++ le32(8) ++ le16(1) ++
      le16(0x0111) ++ le16(4) ++ le32(1) ++ le32(99999) ++ le32(0)
    val r = TiffMetaKernel.parse(p)
    assert(r != null && r.getBoolean(0))
    assert(!r.getBoolean(15), "offset past payload must be inconsistent")
    assert(r.getUTF8String(10).toString === "strip")
  }

  test("non-TIFF, truncated, and fuzzed payloads never throw") {
    assert(TiffMetaKernel.parse("no tiff here".getBytes("US-ASCII")) == null)
    assert(TiffMetaKernel.parse(Array[Byte]('I', 'I', 42)) == null)
    // truncation sweep of a valid payload
    val good = TiffSynthKernel.synth(6L)
    for (cut <- 0 until good.length) TiffMetaKernel.parse(good.take(cut))
    // garbage behind the magic
    val rnd = new scala.util.Random(77)
    for (_ <- 0 until 4000) {
      val tail = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(tail)
      val head = if (rnd.nextBoolean()) Array[Byte]('I', 'I', 42, 0)
        else Array[Byte]('M', 'M', 0, 42)
      TiffMetaKernel.parse(head ++ tail) // must not throw
    }
  }
}
