package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{MkvMetaKernel, MkvSynthKernel}

/** Matroska/WebM EBML walk: synth round trips over the full lane grid
  * (doctype × versions × codecs × dims × audio lane × float widths ×
  * cluster counts), hand-built EBML for the shapes the gate lanes
  * don't carry (unknown-size Segment, long size varints, non-default
  * timecode scale, multi-track first-wins, illegal unknown sizes),
  * and never-throw truncation/garbage sweeps. No Matroska muxer
  * exists in the JDK — the WebP/MP3/OGG conformance posture.
  */
class MkvSpec extends AnyFunSuite {

  test("MKV synth round trips: every lane parses to its closed form") {
    for (d <- 0L until 840L) {
      val r = MkvMetaKernel.parse(MkvSynthKernel.synth(d))
      assert(r != null, s"doc $d rejected")
      assert(r.getBoolean(0), s"doc $d invalid")
      assert(r.getUTF8String(1).toString ===
        (if (d % 2 == 0) "webm" else "matroska"), s"doc $d doctype")
      assert(r.getLong(2) === 2 + d % 3, s"doc $d version")
      assert(r.getLong(3) === 1000000L, s"doc $d scale")
      assert(r.getLong(4) === 10000 + d % 5000, s"doc $d duration")
      val hasAudio = d % 2 == 1
      assert(r.getLong(5) === (if (hasAudio) 2L else 1L), s"doc $d tracks")
      assert(r.getUTF8String(6).toString ===
        Array("V_VP8", "V_VP9", "V_AV1").apply((d % 3).toInt), s"doc $d vcodec")
      assert(r.getLong(7) === 320 + 16 * (d % 20), s"doc $d width")
      assert(r.getLong(8) === 240 + 16 * (d % 15), s"doc $d height")
      if (hasAudio) {
        assert(r.getUTF8String(9).toString ===
          (if (d % 4 == 1) "A_VORBIS" else "A_OPUS"), s"doc $d acodec")
        assert(r.getLong(10) === 1 + (d % 5) % 2, s"doc $d channels")
        assert(r.getLong(11) === (if (d % 4 == 1) 44100L else 48000L),
          s"doc $d rate")
      } else {
        assert(r.isNullAt(9) && r.isNullAt(10) && r.isNullAt(11),
          s"doc $d audio nulls")
      }
      assert(r.getLong(12) === d % 3, s"doc $d clusters")
      assert(r.getBoolean(13), s"doc $d consistent")
    }
  }

  test("MKV synth byte length matches the triage oracle's closed form") {
    for (d <- 0L until 840L) {
      val headerTotal = if (d % 2 == 0) 20 else 24
      val infoTotal = if (d % 4 == 1) 19 else 23
      val hb = if (d % 15 == 0) 1 else 2 // height < 256 packs to one byte
      val audio = if (d % 2 == 0) 0 else if (d % 4 == 1) 33 else 31
      val tracksTotal = 28 + hb + audio
      val cl = (d % 3) match {
        case 0 => 0L
        case 1 => 18 + d % 9
        case _ => 37 + 2 * (d % 9)
      }
      val segBody = infoTotal + tracksTotal + cl
      val segTotal = 4 + (if (segBody < 127) 1 else 2) + segBody
      assert(MkvSynthKernel.synth(d).length === headerTotal + segTotal,
        s"doc $d length")
    }
  }

  // -- hand-built EBML ------------------------------------------------
  private def el(id: Long, idW: Int, body: Array[Byte],
      szW: Int = 0): Array[Byte] = {
    val sw = if (szW > 0) szW else if (body.length < 127) 1 else 2
    val out = new Array[Byte](idW + sw + body.length)
    for (i <- 0 until idW) out(i) = ((id >>> (8 * (idW - 1 - i))) & 0xFF).toByte
    // size with the marker bit in the first byte
    val marker = 1L << (7 * sw)
    val v = marker | body.length.toLong
    for (i <- 0 until sw)
      out(idW + i) = ((v >>> (8 * (sw - 1 - i))) & 0xFF).toByte
    System.arraycopy(body, 0, out, idW + sw, body.length)
    out
  }
  private def unknownSizeEl(id: Long, idW: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](idW + 1 + body.length)
    for (i <- 0 until idW) out(i) = ((id >>> (8 * (idW - 1 - i))) & 0xFF).toByte
    out(idW) = 0xFF.toByte // 1-byte all-ones = unknown
    System.arraycopy(body, 0, out, idW + 1, body.length)
    out
  }
  private def uint(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >>> (8 * n)) != 0) n += 1
    val b = new Array[Byte](n)
    for (i <- 0 until n) b(i) = ((v >>> (8 * (n - 1 - i))) & 0xFF).toByte
    b
  }
  private def f64(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    val b = new Array[Byte](8)
    for (i <- 0 until 8) b(i) = ((bits >>> (8 * (7 - i))) & 0xFF).toByte
    b
  }
  private def cat(xs: Array[Byte]*): Array[Byte] = xs.flatten.toArray
  private def header: Array[Byte] = el(0x1A45DFA3L, 4, cat(
    el(0x4282, 2, "webm".getBytes("US-ASCII")),
    el(0x4287, 2, uint(4))))

  test("unknown-size Segment is legal; unknown size anywhere else is not") {
    val info = el(0x1549A966L, 4, cat(
      el(0x2AD7B1L, 3, uint(500000L)), // non-default scale: ms halve
      el(0x4489, 2, f64(6000.0))))
    val seg = unknownSizeEl(0x18538067L, 4, info)
    val r = MkvMetaKernel.parse(cat(header, seg))
    assert(r != null && r.getBoolean(0) && r.getBoolean(13),
      "streaming-mux segment must stay consistent")
    assert(r.getLong(3) === 500000L)
    assert(r.getLong(4) === 3000L, "6000 ticks × 0.5 ms/tick")
    // the same unknown-size trick on Info is an impossible skip
    val badSeg = el(0x18538067L, 4, unknownSizeEl(0x1549A966L, 4,
      el(0x2AD7B1L, 3, uint(1000000L))))
    val rb = MkvMetaKernel.parse(cat(header, badSeg))
    assert(rb != null && !rb.getBoolean(13))
  }

  test("8-byte size varints, multi-track first-wins, missing duration") {
    val tracks = el(0x1654AE6BL, 4, cat(
      el(0xAE, 1, cat(el(0x83, 1, uint(1)),
        el(0x86, 1, "V_MPEG4/ISO/AVC".getBytes("US-ASCII")),
        el(0xE0, 1, cat(el(0xB0, 1, uint(1920)), el(0xBA, 1, uint(1080)))))),
      // a SECOND video track: counted, not reported
      el(0xAE, 1, cat(el(0x83, 1, uint(1)),
        el(0x86, 1, "V_VP9".getBytes("US-ASCII")),
        el(0xE0, 1, cat(el(0xB0, 1, uint(640)), el(0xBA, 1, uint(360)))))),
      el(0xAE, 1, cat(el(0x83, 1, uint(17)), // subtitle: counted only
        el(0x86, 1, "S_TEXT/UTF8".getBytes("US-ASCII"))))),
      szW = 8) // 8-byte size varint on the Tracks element
    val seg = el(0x18538067L, 4, tracks)
    val r = MkvMetaKernel.parse(cat(header, seg))
    assert(r != null && r.getBoolean(13))
    assert(r.getLong(5) === 3L, "all tracks counted")
    assert(r.getUTF8String(6).toString === "V_MPEG4/ISO/AVC", "first video wins")
    assert(r.getLong(7) === 1920L && r.getLong(8) === 1080L)
    assert(r.isNullAt(9), "no audio track")
    assert(r.isNullAt(4), "no Duration element → null ms")
    assert(r.getLong(3) === 1000000L, "TimecodeScale EBML default")
  }

  test("structural breaks: bad float width, trailing junk, no Segment") {
    val badDur = el(0x18538067L, 4, el(0x1549A966L, 4,
      el(0x4489, 2, Array[Byte](1, 2, 3, 4, 5)))) // 5-byte float
    val r1 = MkvMetaKernel.parse(cat(header, badDur))
    assert(r1 != null && !r1.getBoolean(13))
    val ok = el(0x18538067L, 4, el(0x1549A966L, 4,
      el(0x4489, 2, f64(1000.0))))
    val r2 = MkvMetaKernel.parse(cat(header, ok, Array[Byte](0x00, 0x01)))
    assert(r2 != null && !r2.getBoolean(13), "junk after the Segment")
    val r3 = MkvMetaKernel.parse(header)
    assert(r3 != null && !r3.getBoolean(13), "EBML header alone: no Segment")
  }

  test("strict detection and never-throw: text, truncation, garbage") {
    assert(MkvMetaKernel.parse("plain text here".getBytes("UTF-8")) == null)
    assert(MkvMetaKernel.parse(Array[Byte]()) == null)
    val full = MkvSynthKernel.synth(23L)
    for (cut <- 0 to full.length) {
      val r = MkvMetaKernel.parse(java.util.Arrays.copyOf(full, cut))
      if (r != null && cut < full.length)
        assert(!r.getBoolean(13), s"cut $cut can't be consistent")
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val g = new Array[Byte](4 + rnd.nextInt(300))
      rnd.nextBytes(g)
      g(0) = 0x1A; g(1) = 0x45; g(2) = 0xDF.toByte; g(3) = 0xA3.toByte
      MkvMetaKernel.parse(g) // must not throw
    }
  }
}
