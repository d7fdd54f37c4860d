package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{AudioHashKernel, FlacAudioKernel, FlacAudioSynthKernel, FlacBitWriter, FlacCrc}

/** FLAC frame decode: encoder↔decoder round trips across every
  * coding lane (constant / verbatim / fixed-rice / fixed-rice2-
  * partitioned / LPC × mono/stereo × 8/16-bit × independent /
  * left-side / mid-side), hand-built streams for the decoder-only
  * paths the synth doesn't emit (wasted bits, escape partitions,
  * table-coded block sizes, inline sample rates, right-side stereo,
  * higher fixed/LPC orders, deeper partitions, 3 channels, variable
  * blocking strategy), CRC damage, truncation sweeps, and garbage
  * fuzz. No FLAC implementation exists in the JDK, so these streams
  * plus the closed-form DuckDB gate row are the conformance evidence
  * (the documented WebP/MP3 posture).
  */
class FlacAudioSpec extends SparkSpec {

  // ---- closed-form mirror of FlacAudioSynthKernel.synth ----

  private def expected(d: Long): (Int, Int, Int, Long, Long, Long) = {
    val ch = (1 + d % 2).toInt
    val bps = if (d % 3 == 0) 8 else 16
    val m = if (bps == 8) 160L else 2000L
    val n = (96 + (d % 5) * 32).toInt
    var sum = 0L; var sumSq = 0L; var peak = 0L
    for (c <- 0 until ch; j <- 0 until n) {
      val v = if (j < 64) (d * 13 + c * 29) % m - m / 2
        else ((d + 1) * 31 + c * 17 + j * 7) % m - m / 2
      sum += v; sumSq += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
    }
    (ch, bps, n, sum, sumSq, peak)
  }

  test("round trips: every lane decodes to the closed-form stats") {
    for (d <- 1L to 120L if d % 10 != 0) {
      val p = FlacAudioSynthKernel.synth(d)
      val row = FlacAudioKernel.stats(p)
      assert(row != null, s"d=$d: stats null")
      val (ch, bps, n, sum, sumSq, peak) = expected(d)
      assert(row.getBoolean(0), s"d=$d: flac_valid")
      assert(row.getBoolean(1), s"d=$d: decode_ok")
      assert(row.getLong(2) === ch.toLong, s"d=$d: channels")
      assert(row.getLong(3) === bps.toLong, s"d=$d: bps")
      assert(row.getLong(4) === ((n + 63) / 64).toLong, s"d=$d: n_frames")
      assert(row.getLong(5) === n.toLong, s"d=$d: n_samples")
      assert(row.getLong(6) === sum, s"d=$d: sum")
      assert(row.getLong(7) === sumSq, s"d=$d: sum_sq")
      assert(row.getLong(8) === peak, s"d=$d: peak")
      assert(row.getBoolean(9) === (d % 20 != 5), s"d=$d: crc_ok")
      assert(row.getBoolean(10), s"d=$d: matches_streaminfo")
    }
  }

  // ---- hand-built stream machinery ----

  private def streaminfo(sr: Long, ch: Int, bps: Int, total: Long,
      minB: Int = 64, maxB: Int = 64): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val si = new Array[Byte](34)
    si(0) = ((minB >> 8) & 0xFF).toByte; si(1) = (minB & 0xFF).toByte
    si(2) = ((maxB >> 8) & 0xFF).toByte; si(3) = (maxB & 0xFF).toByte
    val packed = (sr << 44) | ((ch - 1).toLong << 41) | ((bps - 1).toLong << 36) | total
    for (i <- 0 until 8)
      si(10 + i) = ((packed >>> (56 - 8 * i)) & 0xFF).toByte
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si, 0, 34)
    out.toByteArray
  }

  /** Assemble one frame: `header` are the byte-aligned header bytes
    * (sync through the last extra byte, CRC-8 appended here), `body`
    * writes the subframe bits.
    */
  private def frame(header: Array[Byte], body: FlacBitWriter => Unit,
      breakCrc16: Boolean = false, breakCrc8: Boolean = false): Array[Byte] = {
    val f = new java.io.ByteArrayOutputStream(256)
    f.write(header, 0, header.length)
    val c8 = FlacCrc.crc8(header, 0, header.length)
    f.write(if (breakCrc8) c8 ^ 0x55 else c8)
    val bw = new FlacBitWriter
    body(bw)
    val sub = bw.bytes
    f.write(sub, 0, sub.length)
    val fb = f.toByteArray
    var c16 = FlacCrc.crc16(fb, 0, fb.length)
    if (breakCrc16) c16 ^= 0xFF
    f.write((c16 >> 8) & 0xFF); f.write(c16 & 0xFF)
    f.toByteArray
  }

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    parts.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }

  /** Standard header: 8-bit blocksize form, sr-from-streaminfo,
    * explicit bps code, single-byte frame number.
    */
  private def hdr(blockSize: Int, chAssign: Int, bpsCode: Int,
      frameNo: Int = 0): Array[Byte] =
    Array(0xFF.toByte, 0xF8.toByte, 0x60.toByte,
      (((chAssign << 4) | (bpsCode << 1)) & 0xFF).toByte,
      frameNo.toByte, (blockSize - 1).toByte)

  private def statsOf(p: Array[Byte]) = FlacAudioKernel.stats(p)

  test("wasted bits: decoded samples are shifted back up") {
    // mono 16-bit, one 8-sample constant subframe with 2 wasted bits
    val body = (bw: FlacBitWriter) => {
      bw.put(0, 1); bw.put(0, 6)
      bw.put(1, 1) // wasted flag
      bw.putUnary(1) // k = 2
      bw.put(5, 14) // constant value in bps-k bits
    }
    val p = cat(streaminfo(8000, 1, 16, 8), frame(hdr(8, 0, 4), body))
    val row = statsOf(p)
    assert(row != null && row.getBoolean(1), "decode_ok")
    assert(row.getLong(6) === 8L * 20L, "sum: 5 << 2 per sample")
    assert(row.getLong(8) === 20L, "peak")
    assert(row.getBoolean(9), "crc_ok")
  }

  test("escape partition: raw-bits residual decodes") {
    // mono 16-bit, fixed order 0 over 8 samples, method 0, partition
    // order 0, param 15 (escape) → 6 raw bits per sample
    val vals = Array[Long](3, -3, 7, 0, -8, 15, -16, 1)
    val body = (bw: FlacBitWriter) => {
      bw.put(0, 1); bw.put(8, 6); bw.put(0, 1) // fixed order 0
      bw.put(0, 2); bw.put(0, 4) // method 0, po 0
      bw.put(15, 4) // escape
      bw.put(6, 5) // raw bits
      vals.foreach(v => bw.put(v, 6))
    }
    val p = cat(streaminfo(8000, 1, 16, 8), frame(hdr(8, 0, 4), body))
    val row = statsOf(p)
    assert(row != null && row.getBoolean(1))
    assert(row.getLong(6) === vals.sum)
    assert(row.getLong(8) === 16L)
  }

  test("zero-bit escape partition decodes as silence") {
    val body = (bw: FlacBitWriter) => {
      bw.put(0, 1); bw.put(8, 6); bw.put(0, 1)
      bw.put(0, 2); bw.put(0, 4)
      bw.put(15, 4); bw.put(0, 5) // raw bits = 0 → all zero
    }
    val p = cat(streaminfo(8000, 1, 16, 8), frame(hdr(8, 0, 4), body))
    val row = statsOf(p)
    assert(row != null && row.getBoolean(1))
    assert(row.getLong(6) === 0L && row.getLong(8) === 0L)
  }

  test("table-coded block sizes: 192 (code 1) and 16-bit form (code 7)") {
    // code 1 → 192 samples, verbatim zeros
    val h192 = Array(0xFF.toByte, 0xF8.toByte, 0x10.toByte, 0x08.toByte, 0x00.toByte)
    val body192 = (bw: FlacBitWriter) => {
      bw.put(0, 1); bw.put(1, 6); bw.put(0, 1)
      for (_ <- 0 until 192) bw.put(0, 16)
    }
    val p1 = cat(streaminfo(8000, 1, 16, 192, 192, 192),
      frame(h192, body192))
    val r1 = statsOf(p1)
    assert(r1 != null && r1.getBoolean(1) && r1.getLong(5) === 192L)
    // code 7 → 16-bit blockSize-1
    val h16 = Array(0xFF.toByte, 0xF8.toByte, 0x70.toByte, 0x08.toByte,
      0x00.toByte, 0x00.toByte, 0x09.toByte) // blockSize 10
    val body16 = (bw: FlacBitWriter) => {
      bw.put(0, 1); bw.put(0, 6); bw.put(0, 1); bw.put(-7 & 0xFFFF, 16)
    }
    val p2 = cat(streaminfo(8000, 1, 16, 10, 10, 10), frame(h16, body16))
    val r2 = statsOf(p2)
    assert(r2 != null && r2.getBoolean(1) && r2.getLong(5) === 10L)
    assert(r2.getLong(6) === -70L)
  }

  test("inline sample-rate forms consume their bytes (codes 12/13/14)") {
    for ((srCode, extra) <- Seq(
        (12, Array(8.toByte)), // kHz
        (13, Array(0x1F.toByte, 0x40.toByte)), // 8000 Hz
        (14, Array(0x03.toByte, 0x20.toByte)))) { // 800 × 10
      val h = Array(0xFF.toByte, 0xF8.toByte, (0x60 | srCode).toByte,
        0x08.toByte, 0x00.toByte, 7.toByte) ++ extra // blockSize 8
      val body = (bw: FlacBitWriter) => {
        bw.put(0, 1); bw.put(0, 6); bw.put(0, 1); bw.put(9, 16)
      }
      val p = cat(streaminfo(8000, 1, 16, 8), frame(h, body))
      val row = statsOf(p)
      assert(row != null && row.getBoolean(1), s"srCode $srCode")
      assert(row.getLong(6) === 72L, s"srCode $srCode sum")
    }
  }

  test("bps-from-streaminfo code and right/side stereo reconstruct") {
    // stereo 16-bit, assignment 9 (side + right), bpsCode 0
    val l = Array[Long](10, 20, -5, 7)
    val r = Array[Long](4, -6, 3, 7)
    val body = (bw: FlacBitWriter) => {
      // channel 0 = side (17 bits), verbatim
      bw.put(0, 1); bw.put(1, 6); bw.put(0, 1)
      for (i <- 0 until 4) bw.put(l(i) - r(i), 17)
      // channel 1 = right, verbatim
      bw.put(0, 1); bw.put(1, 6); bw.put(0, 1)
      for (i <- 0 until 4) bw.put(r(i), 16)
    }
    val p = cat(streaminfo(8000, 2, 16, 4), frame(hdr(4, 9, 0), body))
    val row = statsOf(p)
    assert(row != null && row.getBoolean(1))
    assert(row.getLong(6) === l.sum + r.sum)
    assert(row.getLong(8) === 20L)
  }

  test("fixed orders 3 and 4 reconstruct") {
    val s = Array[Long](3, 1, 4, 1, 5, 9, 2, 6)
    for (order <- Seq(3, 4)) {
      val body = (bw: FlacBitWriter) => {
        bw.put(0, 1); bw.put(8 + order, 6); bw.put(0, 1)
        for (j <- 0 until order) bw.put(s(j), 16)
        bw.put(0, 2); bw.put(0, 4); bw.put(7, 4)
        for (j <- order until 8) {
          val r = order match {
            case 3 => s(j) - 3 * s(j - 1) + 3 * s(j - 2) - s(j - 3)
            case _ => s(j) - 4 * s(j - 1) + 6 * s(j - 2) - 4 * s(j - 3) + s(j - 4)
          }
          bw.putRice(r, 7)
        }
      }
      val p = cat(streaminfo(8000, 1, 16, 8), frame(hdr(8, 0, 4), body))
      val row = statsOf(p)
      assert(row != null && row.getBoolean(1), s"order $order")
      assert(row.getLong(6) === s.sum, s"order $order sum")
      assert(row.getLong(7) === s.map(v => v * v).sum, s"order $order sumsq")
    }
  }

  test("LPC order 4 with negative coefficients and partition order 2") {
    val n = 16
    val s = Array.tabulate(n)(j => ((j * 37 + 11) % 50 - 25).toLong)
    val coefs = Array[Long](900, -300, 150, -50)
    val shift = 9
    val body = (bw: FlacBitWriter) => {
      bw.put(0, 1); bw.put(32 | 3, 6); bw.put(0, 1) // LPC order 4
      for (j <- 0 until 4) bw.put(s(j), 16)
      bw.put(11, 4) // precision 12
      bw.put(shift, 5)
      coefs.foreach(c => bw.put(c, 12))
      bw.put(0, 2); bw.put(2, 4) // method 0, po 2 → 4 partitions of 4
      for (part <- 0 until 4) {
        bw.put(8, 4)
        val from = if (part == 0) 4 else part * 4
        for (j <- from until (part + 1) * 4) {
          var pred = 0L
          for (i <- 0 until 4) pred += coefs(i) * s(j - 1 - i)
          bw.putRice(s(j) - (pred >> shift), 8)
        }
      }
    }
    val p = cat(streaminfo(8000, 1, 16, n), frame(hdr(n, 0, 4), body))
    val row = statsOf(p)
    assert(row != null && row.getBoolean(1))
    assert(row.getLong(6) === s.sum)
    assert(row.getLong(7) === s.map(v => v * v).sum)
  }

  test("three independent channels decode") {
    val body = (bw: FlacBitWriter) => {
      for (c <- 0 until 3) {
        bw.put(0, 1); bw.put(0, 6); bw.put(0, 1)
        bw.put(c + 1, 16) // constants 1, 2, 3
      }
    }
    val p = cat(streaminfo(8000, 3, 16, 4), frame(hdr(4, 2, 4), body))
    val row = statsOf(p)
    assert(row != null && row.getBoolean(1))
    assert(row.getLong(2) === 3L)
    assert(row.getLong(6) === 4L * (1 + 2 + 3))
  }

  test("variable blocking strategy with a multi-byte coded number") {
    // blocking bit set; sample number 128 → 2-byte UTF-8 (0xC2 0x80)
    val h = Array(0xFF.toByte, 0xF9.toByte, 0x60.toByte, 0x08.toByte,
      0xC2.toByte, 0x80.toByte, 7.toByte)
    val body = (bw: FlacBitWriter) => {
      bw.put(0, 1); bw.put(0, 6); bw.put(0, 1); bw.put(3, 16)
    }
    val p = cat(streaminfo(8000, 1, 16, 8), frame(h, body))
    val row = statsOf(p)
    assert(row != null && row.getBoolean(1))
    assert(row.getLong(6) === 24L)
  }

  test("CRC-8 damage: samples decode, crc_ok false") {
    val body = (bw: FlacBitWriter) => {
      bw.put(0, 1); bw.put(0, 6); bw.put(0, 1); bw.put(2, 16)
    }
    val p = cat(streaminfo(8000, 1, 16, 8),
      frame(hdr(8, 0, 4), body, breakCrc8 = true))
    val row = statsOf(p)
    assert(row != null && row.getBoolean(1))
    assert(!row.getBoolean(9), "crc_ok must be false")
    assert(row.getLong(6) === 16L, "samples unchanged")
  }

  test("STREAMINFO total mismatch: matches_streaminfo false") {
    val body = (bw: FlacBitWriter) => {
      bw.put(0, 1); bw.put(0, 6); bw.put(0, 1); bw.put(1, 16)
    }
    val p = cat(streaminfo(8000, 1, 16, 99), frame(hdr(8, 0, 4), body))
    val row = statsOf(p)
    assert(row != null && row.getBoolean(1))
    assert(!row.getBoolean(10))
  }

  test("truncation sweep never throws") {
    val p = FlacAudioSynthKernel.synth(7L)
    for (len <- 0 until p.length) {
      val row = FlacAudioKernel.stats(java.util.Arrays.copyOf(p, len))
      // a cut at a frame boundary still decodes cleanly but must
      // then disagree with STREAMINFO's declared total
      if (row != null && row.getBoolean(1))
        assert(!row.getBoolean(10), s"len $len: prefix claims full stream")
      // the fingerprint refuses any prefix (decoded != declared)
      assert(FlacAudioKernel.ahash(java.util.Arrays.copyOf(p, len)) == null,
        s"len $len: prefix fingerprinted")
    }
  }

  test("garbage behind the magic never throws") {
    val rnd = new scala.util.Random(41)
    for (_ <- 0 until 300) {
      val g = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(g)
      val p = cat(Array[Byte]('f', 'L', 'a', 'C', 0x00), g)
      FlacAudioKernel.stats(p)
      FlacAudioKernel.ahash(p)
      // and fully random payloads
      FlacAudioKernel.stats(g)
      FlacAudioKernel.ahash(g)
    }
  }

  // ---- perceptual dedup: FLAC ↔ WAV cross-codec ----

  private def wavWindowData(key: Long, m: Int): Array[Byte] = {
    val nWin = AudioHashKernel.Windows
    val out = new Array[Byte](2 * nWin * m)
    for (w <- 0 until nWin; i <- 0 until m) {
      val v = ((key * 13 + w * 29) % 1024 - 512).toInt
      val u = v & 0xFFFF
      out(2 * (w * m + i)) = (u & 0xFF).toByte
      out(2 * (w * m + i) + 1) = ((u >> 8) & 0xFF).toByte
    }
    out
  }

  test("FLAC re-encode fingerprints identically to the WAV original") {
    for (key <- Seq(0L, 2L, 14L, 96L, 1234L)) {
      val wavHash = AudioHashKernel.ahash(wavWindowData(key, 4), 16L)
      val flacHash = FlacAudioKernel.ahash(
        FlacAudioSynthKernel.synthWindowed(key, 4))
      assert(wavHash != null && flacHash != null, s"key $key: null hash")
      assert(wavHash.longValue() === flacHash.longValue(),
        s"key $key: cross-codec fingerprint mismatch")
    }
  }

  test("audioDedup groups a WAV member with its FLAC re-encode") {
    import graft.multimodal.Binary
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 40)
    val k = expr("(doc_id div 2) * 2")
    val wavM = Binary.Wav.synthWindowedFromDocs(docs, k)
      .select(col("doc_id"), col("payload").as("wp"))
    val flacM = Binary.Flac.synthWindowedFromDocs(docs, k)
      .select(col("doc_id"), col("payload").as("fp"))
    val media = wavM.join(flacM, Seq("doc_id"))
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, col("wp")).otherwise(col("fp"))
          .as("payload"))
    val out = Binary.audioDedup(media)
      .select("doc_id", "audio_valid", "n_copies", "keeper_id", "is_canonical")
      .collect().map(r => r.getLong(0) -> r).toMap
    // docs 2 (WAV) and 3 (FLAC) share key 2 — one group of 2
    assert(out(2L).getBoolean(1) && out(3L).getBoolean(1))
    assert(out(2L).getLong(2) === 2L && out(3L).getLong(2) === 2L)
    assert(out(2L).getLong(3) === 2L && out(3L).getLong(3) === 2L)
    assert(out(2L).getBoolean(4) && !out(3L).getBoolean(4))
    // doc 10 is the invalid text lane; 11 (FLAC) groups alone
    assert(!out(10L).getBoolean(1))
    assert(out(11L).getLong(2) === 1L && out(11L).getBoolean(4))
  }
}
