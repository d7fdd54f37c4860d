package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{FlacMetaKernel, FlacSynthKernel, Mp3MetaKernel, Mp3SynthKernel}

/** MP3 frame walk + FLAC block chain: synth round trips over the full
  * lane grids, the layers/versions/VBR shapes the gate lanes don't
  * carry (hand-built frames — no independent MP3/FLAC encoder exists
  * in the JDK, so like WebP the conformance rests on the oracle plus
  * these spec-side streams), and never-throw fuzz.
  */
class Mp3FlacSpec extends AnyFunSuite {

  test("MP3 synth round trips: every lane parses to its closed form") {
    for (d <- 0L until 840L) {
      val r = Mp3MetaKernel.parse(Mp3SynthKernel.synth(d))
      assert(r != null, s"doc $d rejected")
      assert(r.getBoolean(0), s"doc $d invalid")
      val mpeg1 = d % 2 == 0
      val id3v2 = d % 4 == 1
      assert(r.getBoolean(1) === id3v2, s"doc $d has_id3v2")
      if (id3v2) assert(r.getLong(2) === 30 + d % 30, s"doc $d id3v2_bytes")
      else assert(r.isNullAt(2), s"doc $d id3v2_bytes null")
      assert(r.getUTF8String(3).toString === (if (mpeg1) "1" else "2"),
        s"doc $d version")
      assert(r.getLong(4) === 3L, s"doc $d layer")
      val br = if (mpeg1) Array(64L, 80L, 96L)((d % 3).toInt)
        else Array(40L, 48L, 56L)((d % 3).toInt)
      val sr = if (mpeg1) Array(44100L, 48000L, 32000L)((d % 3).toInt)
        else Array(22050L, 24000L, 16000L)((d % 3).toInt)
      assert(r.getLong(5) === br, s"doc $d bitrate")
      assert(r.getLong(6) === sr, s"doc $d sample rate")
      val modes = Array("stereo", "joint_stereo", "dual_channel", "mono")
      assert(r.getUTF8String(7).toString === modes((d % 4).toInt),
        s"doc $d mode")
      val nf = 1 + d % 6
      assert(r.getLong(8) === nf, s"doc $d frames")
      val spf = if (mpeg1) 1152L else 576L
      assert(r.getLong(9) === nf * spf * 1000 / sr, s"doc $d duration")
      assert(r.getBoolean(10) === (d % 8 == 5), s"doc $d id3v1")
      assert(!r.getBoolean(11), s"doc $d vbr")
      assert(r.getBoolean(12), s"doc $d consistent")
    }
  }

  /** One frame with explicit header fields + zero payload. */
  private def frame(verBits: Int, layerBits: Int, brIdx: Int, srIdx: Int,
      pad: Int, mode: Int, len: Int): Array[Byte] = {
    val f = new Array[Byte](len)
    f(0) = 0xFF.toByte
    f(1) = (0xE0 | (verBits << 3) | (layerBits << 1) | 1).toByte
    f(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    f(3) = (mode << 6).toByte
    f
  }

  test("MP3 layers I/II, MPEG2.5, Xing, and the ID3v2 footer — the shapes the gate lanes skip") {
    // Layer I MPEG1: slot arithmetic ×4, 384 samples/frame
    val l1len = (12 * 128000 / 44100 + 0) * 4
    val l1 = frame(3, 3, 4, 0, 0, 0, l1len) ++ frame(3, 3, 4, 0, 0, 0, l1len)
    val r1 = Mp3MetaKernel.parse(l1)
    assert(r1 != null && r1.getLong(4) === 1L && r1.getLong(5) === 128L)
    assert(r1.getLong(8) === 2L && r1.getBoolean(12))
    assert(r1.getLong(9) === 2L * 384 * 1000 / 44100)
    // Layer II MPEG1
    val l2len = 144 * 64000 / 44100
    val r2 = Mp3MetaKernel.parse(frame(3, 2, 4, 0, 0, 1, l2len))
    assert(r2 != null && r2.getLong(4) === 2L && r2.getLong(5) === 64L)
    assert(r2.getLong(9) === 1152L * 1000 / 44100)
    // MPEG2.5 Layer III: 576 samples, 72-slot arithmetic
    val l25len = 72 * 40000 / 11025
    val r25 = Mp3MetaKernel.parse(frame(0, 1, 5, 0, 0, 3, l25len))
    assert(r25 != null && r25.getUTF8String(3).toString === "2.5")
    assert(r25.getLong(6) === 11025L && r25.getLong(9) === 576L * 1000 / 11025)
    // Xing VBR tag behind MPEG1 mono side info (17 bytes)
    val xlen = 144 * 96000 / 44100
    val xf = frame(3, 1, 7, 0, 0, 3, xlen)
    "Xing".getBytes("US-ASCII").copyToArray(xf, 4 + 17)
    val rx = Mp3MetaKernel.parse(xf)
    assert(rx != null && rx.getBoolean(11), "Xing tag must set is_vbr")
    // stereo side info is 32 bytes — an 'Xing' at the MONO offset of a
    // STEREO frame must NOT count
    val sf = frame(3, 1, 7, 0, 0, 0, xlen)
    "Xing".getBytes("US-ASCII").copyToArray(sf, 4 + 17)
    assert(!Mp3MetaKernel.parse(sf).getBoolean(11))
    // ID3v2 footer flag adds 10 trailing bytes to the tag
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 8) ++
      new Array[Byte](8 + 10)
    val rf = Mp3MetaKernel.parse(id3 ++ frame(3, 1, 7, 0, 0, 0, xlen))
    assert(rf != null && rf.getLong(2) === 10L + 8 + 10, "footer bytes")
    assert(rf.getBoolean(12), "footer-tagged stream still wall-to-wall")
    // trailing junk after the last frame breaks consistency, not validity
    val rj = Mp3MetaKernel.parse(frame(3, 1, 7, 0, 0, 0, xlen) ++
      Array[Byte](1, 2, 3))
    assert(rj != null && rj.getBoolean(0) && !rj.getBoolean(12))
    // free-format bitrate (index 0) is not walkable
    assert(Mp3MetaKernel.parse(frame(3, 1, 0, 0, 0, 0, 64)) == null)
  }

  test("FLAC synth round trips: every lane parses to its closed form") {
    for (d <- 0L until 240L) {
      val r = FlacMetaKernel.parse(FlacSynthKernel.synth(d))
      assert(r != null, s"doc $d rejected")
      assert(r.getBoolean(0), s"doc $d invalid")
      assert(r.getLong(1) === 8000 + (d % 5) * 4000, s"doc $d sr")
      assert(r.getLong(2) === 1 + d % 2, s"doc $d channels")
      assert(r.getLong(3) === 8 * (1 + d % 3), s"doc $d bps")
      val total = 1000 + d % 5000
      assert(r.getLong(4) === total, s"doc $d total")
      assert(r.getLong(5) === total * 1000 / (8000 + (d % 5) * 4000),
        s"doc $d duration")
      val blocks = 1L + (if (d % 3 == 1) 1 else 0) + (if (d % 4 == 2) 1 else 0)
      assert(r.getLong(6) === blocks, s"doc $d blocks")
      assert(r.getBoolean(7) === (d % 3 == 1), s"doc $d vorbis")
      assert(r.getLong(8) === 4096L && r.getLong(9) === 4096L, s"doc $d block sizes")
      assert(r.getBoolean(10), s"doc $d consistent")
    }
  }

  test("FLAC structural edges: non-STREAMINFO first block, truncated chain, 36-bit totals") {
    // first block not STREAMINFO → detection refuses (strict magic)
    val bad = "fLaC".getBytes("US-ASCII") ++ Array[Byte](0x84.toByte, 0, 0, 4) ++
      new Array[Byte](4)
    assert(FlacMetaKernel.parse(bad) == null)
    // a declared block running past the payload flags inconsistent
    val good = FlacSynthKernel.synth(13L) // vorbis lane (13 % 3 == 1)
    val cut = good.take(good.length - 10)
    val rc = FlacMetaKernel.parse(cut)
    assert(rc != null && !rc.getBoolean(10), "truncated chain must flag")
    // 36-bit total-samples: the high nibble of byte 13 carries bits 32-35
    val si = new Array[Byte](34)
    si(0) = 0x10; si(2) = 0x10
    val bits = (44100L << 44) | (1L << 41) | (15L << 36) | (1L << 35 | 7L)
    for (i <- 0 until 8) si(10 + i) = ((bits >>> (56 - 8 * i)) & 0xFF).toByte
    val hand = "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ si
    val rh = FlacMetaKernel.parse(hand)
    assert(rh != null && rh.getLong(4) === (1L << 35 | 7L), "36-bit total")
    assert(rh.getLong(2) === 2L && rh.getLong(3) === 16L)
  }

  test("MP3/FLAC truncation sweeps and garbage fuzz never throw") {
    for (d <- Seq(1L, 2L, 5L, 13L, 21L)) {
      val m = Mp3SynthKernel.synth(d)
      for (cut <- 0 until m.length) Mp3MetaKernel.parse(m.take(cut))
      val f = FlacSynthKernel.synth(d)
      for (cut <- 0 until f.length) FlacMetaKernel.parse(f.take(cut))
    }
    val rnd = new scala.util.Random(55)
    for (_ <- 0 until 4000) {
      val tail = new Array[Byte](rnd.nextInt(96))
      rnd.nextBytes(tail)
      val head = rnd.nextInt(4) match {
        case 0 => Array[Byte]('I', 'D', '3', 3, 0)
        case 1 => Array[Byte](0xFF.toByte, 0xFB.toByte)
        case 2 => "fLaC".getBytes("US-ASCII") ++ Array[Byte](0)
        case _ => Array.emptyByteArray
      }
      Mp3MetaKernel.parse(head ++ tail) // must not throw
      FlacMetaKernel.parse(head ++ tail)
    }
  }
}
