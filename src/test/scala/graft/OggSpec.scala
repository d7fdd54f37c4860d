package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{OggMetaKernel, OggSynthKernel}

/** OGG page walk: synth round trips over the full lane grid
  * (Vorbis/Opus/Ogg-FLAC × rates × channels × page counts × lacing
  * shapes × the flipped-CRC lane), hand-built pages for the shapes
  * the gate lanes don't carry (continuation-flag packets spanning
  * pages, Theora, multiplexed serials, sequence gaps, stray BOS,
  * data after EOS, body corruption caught by the CRC), and
  * never-throw truncation/garbage sweeps. No independent OGG muxer
  * exists in the JDK — the WebP/MP3 conformance posture: the oracle
  * plus these spec-side streams.
  */
class OggSpec extends AnyFunSuite {

  test("OGG synth round trips: every lane parses to its closed form") {
    for (d <- 0L until 840L) {
      val r = OggMetaKernel.parse(OggSynthKernel.synth(d))
      assert(r != null, s"doc $d rejected")
      assert(r.getBoolean(0), s"doc $d invalid")
      val codec = Array("vorbis", "opus", "flac").apply((d % 3).toInt)
      assert(r.getUTF8String(1).toString === codec, s"doc $d codec")
      val sr = 8000L + (d % 5) * 4000L
      val ch = 1 + d % 2
      val preSkip = 120L + (d % 4) * 60L
      val nAudio = 1 + d % 4
      val g = 960L + (d % 7) * 320L
      assert(r.getLong(2) === sr, s"doc $d rate")
      assert(r.getLong(3) === ch, s"doc $d channels")
      if (codec == "opus") assert(r.getLong(4) === preSkip, s"doc $d pre_skip")
      else assert(r.isNullAt(4), s"doc $d pre_skip null")
      assert(r.getLong(5) === 2 + nAudio, s"doc $d pages")
      assert(r.getLong(6) === 2 + nAudio, s"doc $d packets")
      val g0 = if (codec == "opus") preSkip else 0L
      assert(r.getLong(7) === g0 + nAudio * g, s"doc $d granule")
      val dur = if (codec == "opus") nAudio * g * 1000 / 48000
        else (g0 + nAudio * g) * 1000 / sr
      assert(r.getLong(8) === dur, s"doc $d duration")
      assert(r.getBoolean(9) === (d % 20 != 7), s"doc $d crc")
      assert(r.getBoolean(10), s"doc $d consistent")
    }
  }

  test("OGG synth byte length matches the triage oracle's closed form") {
    for (d <- 0L until 840L) {
      val idLen = Array(30, 19, 51)((d % 3).toInt)
      val clen = if (d % 5 == 2) 255 else if (d % 5 == 3) 300 else (20 + d % 40).toInt
      val nlac2 = if (d % 5 == 2 || d % 5 == 3) 2 else 1
      val nAudio = (1 + d % 4).toInt
      val expect = (28 + idLen) + (27 + nlac2 + clen) + nAudio * (68 + d % 30)
      assert(OggSynthKernel.synth(d).length === expect, s"doc $d length")
    }
  }

  /** Hand-built page with a REAL CRC. `lacings` is the raw segment
    * table; `body` must match its total.
    */
  private def page(hdrType: Int, granule: Long, serial: Long, seq: Long,
      lacings: Array[Int], body: Array[Byte]): Array[Byte] = {
    val pg = new Array[Byte](27 + lacings.length + body.length)
    pg(0) = 'O'; pg(1) = 'g'; pg(2) = 'g'; pg(3) = 'S'
    pg(5) = hdrType.toByte
    for (k <- 0 until 8) pg(6 + k) = ((granule >>> (8 * k)) & 0xFF).toByte
    for (k <- 0 until 4) pg(14 + k) = ((serial >>> (8 * k)) & 0xFF).toByte
    for (k <- 0 until 4) pg(18 + k) = ((seq >>> (8 * k)) & 0xFF).toByte
    pg(26) = lacings.length.toByte
    for (i <- lacings.indices) pg(27 + i) = lacings(i).toByte
    System.arraycopy(body, 0, pg, 27 + lacings.length, body.length)
    val crc = OggMetaKernel.pageCrc(pg, 0, pg.length, 22)
    for (k <- 0 until 4) pg(22 + k) = ((crc >>> (8 * k)) & 0xFF).toByte
    pg
  }

  test("continuation flag: a packet spanning pages is consistent iff flagged") {
    // BOS page: one 40-byte id packet, then a 300-byte packet that
    // only fits 255 bytes here (lacing 255, no terminator)
    val p0 = page(2, 0, 7, 0, Array(40, 255), new Array[Byte](40 + 255))
    // the spill page must carry flag 0x01 (and EOS to close the file)
    val good = p0 ++ page(5, 480, 7, 1, Array(45), new Array[Byte](45))
    val rg = OggMetaKernel.parse(good)
    assert(rg != null && rg.getBoolean(0) && rg.getBoolean(10),
      "flagged continuation must be consistent")
    assert(rg.getLong(6) === 2L, "two completed packets across the span")
    val bad = p0 ++ page(4, 480, 7, 1, Array(45), new Array[Byte](45))
    val rb = OggMetaKernel.parse(bad)
    assert(rb != null && !rb.getBoolean(10),
      "unflagged continuation must break consistency")
    // the reverse lie: flag set with no open packet
    val lone = page(2, 0, 7, 0, Array(40), new Array[Byte](40)) ++
      page(5, 480, 7, 1, Array(45), new Array[Byte](45))
    assert(!OggMetaKernel.parse(lone).getBoolean(10))
  }

  test("theora ID header detected; unknown codec keeps null rate/duration") {
    val id = new Array[Byte](42)
    id(0) = 0x80.toByte
    "theora".getBytes("US-ASCII").copyToArray(id, 1)
    val r = OggMetaKernel.parse(
      page(6, 0, 3, 0, Array(42), id)) // BOS+EOS single page
    assert(r != null && r.getUTF8String(1).toString === "theora")
    assert(r.isNullAt(2) && r.isNullAt(8))
    val u = OggMetaKernel.parse(
      page(6, 0, 3, 0, Array(4), Array[Byte](9, 9, 9, 9)))
    assert(u != null && u.getUTF8String(1).toString === "unknown")
  }

  test("structural lies break consistency: serial, sequence, BOS, post-EOS") {
    def vorbisId: Array[Byte] = {
      val b = new Array[Byte](30)
      b(0) = 1; "vorbis".getBytes("US-ASCII").copyToArray(b, 1)
      b(11) = 2
      b(12) = 0x44.toByte; b(13) = 0xAC.toByte // 44100 LE
      b
    }
    val p0 = page(2, 0, 7, 0, Array(30), vorbisId)
    // multiplexed second serial
    val mux = p0 ++ page(4, 960, 8, 1, Array(10), new Array[Byte](10))
    assert(!OggMetaKernel.parse(mux).getBoolean(10))
    // sequence gap
    val gap = p0 ++ page(4, 960, 7, 2, Array(10), new Array[Byte](10))
    assert(!OggMetaKernel.parse(gap).getBoolean(10))
    // stray BOS mid-stream
    val stray = p0 ++ page(6, 960, 7, 1, Array(10), new Array[Byte](10))
    assert(!OggMetaKernel.parse(stray).getBoolean(10))
    // data after the EOS page
    val post = p0 ++ page(4, 960, 7, 1, Array(10), new Array[Byte](10)) ++
      page(0, 1920, 7, 2, Array(10), new Array[Byte](10))
    assert(!OggMetaKernel.parse(post).getBoolean(10))
    // no EOS at all
    val noEos = p0 ++ page(0, 960, 7, 1, Array(10), new Array[Byte](10))
    assert(!OggMetaKernel.parse(noEos).getBoolean(10))
    // the clean two-page stream IS consistent (control)
    val ok = p0 ++ page(4, 960, 7, 1, Array(10), new Array[Byte](10))
    val rk = OggMetaKernel.parse(ok)
    assert(rk.getBoolean(10) && rk.getBoolean(9))
    assert(rk.getUTF8String(1).toString === "vorbis" && rk.getLong(2) === 44100L)
    assert(rk.getLong(8) === 960L * 1000 / 44100)
    // one flipped BODY byte: structure intact, CRC verdict false
    val corrupt = ok.clone()
    corrupt(ok.length - 1) = (corrupt(ok.length - 1) ^ 0x55).toByte
    val rc = OggMetaKernel.parse(corrupt)
    assert(rc.getBoolean(10) && !rc.getBoolean(9),
      "body corruption must fail the CRC, not the walk")
  }

  test("strict detection and never-throw: text, truncation, garbage") {
    // printable "OggS" prefix is TEXT (version byte must be NUL)
    assert(OggMetaKernel.parse("OggS is a nice word".getBytes("UTF-8")) == null)
    assert(OggMetaKernel.parse(Array[Byte]()) == null)
    val full = OggSynthKernel.synth(17L)
    for (cut <- 0 to math.min(full.length, 200)) {
      val r = OggMetaKernel.parse(java.util.Arrays.copyOf(full, cut))
      if (r != null) assert(!r.getBoolean(10), s"cut $cut can't be consistent")
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val g = new Array[Byte](5 + rnd.nextInt(400))
      rnd.nextBytes(g)
      g(0) = 'O'; g(1) = 'g'; g(2) = 'g'; g(3) = 'S'; g(4) = 0
      OggMetaKernel.parse(g) // must not throw
    }
  }
}
