package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** FLAC audio-frame CRCs (RFC 9639 §9.2/§9.3): CRC-8 poly x⁸+x²+x+1
  * (0x07) over the frame header, CRC-16 poly x¹⁶+x¹⁵+x²+1 (0x8005)
  * over the whole frame, both init 0, MSB-first, no reflection.
  */
object FlacCrc {
  def crc8(p: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (p(i) & 0xFF)
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    crc
  }

  def crc16(p: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (p(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
          else (crc << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    crc
  }
}

/** MSB-first bit reader over a byte array — FLAC packs everything
  * big-endian bit-first (the mirror of [[Vp8lKernel]]'s LSB-first
  * reader). Never throws: out-of-bounds reads set `failed` and
  * return 0, so callers bail without exceptions (the engine's
  * never-throw kernel discipline).
  */
final class FlacBits(p: Array[Byte]) {
  private val bitLen: Long = p.length.toLong << 3
  var pos: Long = 0L
  var failed: Boolean = false

  def atByte: Int = (pos >>> 3).toInt
  def aligned: Boolean = (pos & 7L) == 0L

  def bits(n: Int): Long = {
    if (failed || n == 0) return 0L
    if (pos + n > bitLen) { failed = true; return 0L }
    var v = 0L
    var remaining = n
    while (remaining > 0) {
      val byteIdx = (pos >>> 3).toInt
      val bitOff = (pos & 7L).toInt
      val avail = 8 - bitOff
      val take = if (avail < remaining) avail else remaining
      val chunk = ((p(byteIdx) & 0xFF) >>> (avail - take)) & ((1 << take) - 1)
      v = (v << take) | chunk
      pos += take
      remaining -= take
    }
    v
  }

  /** Sign-extended read of `n` bits (two's complement). */
  def signed(n: Int): Long = {
    if (n == 0) return 0L
    val v = bits(n)
    (v << (64 - n)) >> (64 - n)
  }

  /** Unary read: count 0-bits until the terminating 1. */
  def unary(): Int = {
    var q = 0
    while (!failed) {
      if (pos >= bitLen) { failed = true; return 0 }
      val b = (p((pos >>> 3).toInt) >> (7 - (pos & 7L).toInt)) & 1
      pos += 1
      if (b == 1) return q
      q += 1
    }
    0
  }

  def align(): Unit = pos = (pos + 7L) & ~7L
}

/** REAL FLAC audio-frame decode — the SIXTH genuine compressed-stream
  * decode in the engine (zlib, PCM, GIF-LZW, JPEG-Huffman, VP8L,
  * TIFF-LZW/PackBits — and now FLAC's rice-coded linear prediction).
  * [[FlacMetaKernel]] triages the metadata-block chain; this kernel
  * decodes the frames behind it per RFC 9639: the byte-aligned frame
  * header (sync 0b11111111111110, blocking strategy, coded block
  * size / sample rate / channel assignment / sample size, the
  * UTF-8-style coded frame number, CRC-8), then per-channel
  * subframes (CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  * with quantized coefficients and shift), rice/rice2 residual
  * partitions (escape = raw), wasted bits, stereo decorrelation
  * (left/side, right/side, mid/side — the side channel one bit
  * wider), byte-align, CRC-16.
  *
  * Reference behavior: lshrs treats audio payloads as opaque blobs
  * (`io/parquet.py`); sample-level audio decode is part of the
  * beyond-reference multimodal tier. No FLAC implementation exists in
  * the JDK, so conformance rests on the closed-form oracle plus
  * hand-built streams (the documented WebP/MP3 posture).
  *
  * Never throws; structural damage → `decode_ok=false`, CRC damage →
  * decodes but `crc_ok=false` (triage wants the samples AND the
  * verdict). Bomb-guarded (frame cap, sample cap, channel/blocksize
  * bounds) — a 100 TB crawl feeds this adversarial bytes.
  */
object FlacAudioKernel {
  val MaxFrames = 1 << 16
  val MaxInterleavedSamples = 1L << 26
  val MaxBlockSize = 65536
  val Windows = AudioHashKernel.Windows

  private val SrTable = Array(0, 88200, 176400, 192000, 8000, 16000, 22050,
    24000, 32000, 44100, 48000, 96000)

  /** Decode result accumulator. When `winSums` is non-null the decode
    * also buckets interleaved |samples| into the 65 fingerprint
    * windows (the [[AudioHashKernel]] arithmetic, streamed — the
    * raster is never materialized).
    */
  private final class Acc(val winTotal: Long) {
    var structOk = true
    var crcOk = true
    var nFrames = 0L
    var nPerChannel = 0L
    var emitted = 0L // interleaved count
    var sum = 0L
    var sumSq = 0L
    var peak = 0L
    val winSums: Array[Long] = if (winTotal > 0) new Array[Long](Windows) else null
    var winIdx = 0
    private def boundary(w: Int): Long = w.toLong * winTotal / Windows

    def emit(v: Long): Unit = {
      sum += v
      sumSq += v * v
      val a = if (v < 0) -v else v
      if (a > peak) peak = a
      if (winSums != null && emitted < winTotal) {
        while (winIdx < Windows - 1 && emitted >= boundary(winIdx + 1)) winIdx += 1
        winSums(winIdx) += a
      }
      emitted += 1
    }
  }

  private def decodeResidual(br: FlacBits, order: Int, blockSize: Int,
      out: Array[Long]): Boolean = {
    val method = br.bits(2).toInt
    if (method > 1) return false
    val pbits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val po = br.bits(4).toInt
    val parts = 1 << po
    if (blockSize % parts != 0) return false
    val perPart = blockSize / parts
    var idx = order
    var part = 0
    while (part < parts) {
      val n = if (part == 0) perPart - order else perPart
      if (n < 0) return false
      val param = br.bits(pbits).toInt
      if (param == escape) {
        val raw = br.bits(5).toInt
        var i = 0
        while (i < n) {
          out(idx) = if (raw == 0) 0L else br.signed(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          val q = br.unary().toLong
          if (br.failed) return false
          val r = br.bits(param)
          val u = (q << param) | r
          out(idx) = (u >>> 1) ^ -(u & 1L)
          idx += 1; i += 1
        }
      }
      if (br.failed) return false
      part += 1
    }
    true
  }

  private def decodeSubframe(br: FlacBits, blockSize: Int, bpsEff: Int,
      out: Array[Long]): Boolean = {
    if (br.bits(1) != 0L) return false
    val typ = br.bits(6).toInt
    val wastedFlag = br.bits(1)
    var wasted = 0
    if (wastedFlag == 1L) { wasted = br.unary() + 1 }
    if (br.failed) return false
    val bps = bpsEff - wasted
    if (bps <= 0 || bps > 33) return false
    if (typ == 0) {
      val v = br.signed(bps)
      var j = 0
      while (j < blockSize) { out(j) = v; j += 1 }
    } else if (typ == 1) {
      var j = 0
      while (j < blockSize) { out(j) = br.signed(bps); j += 1 }
    } else if (typ >= 8 && typ <= 12) {
      val order = typ - 8
      if (order > blockSize) return false
      var j = 0
      while (j < order) { out(j) = br.signed(bps); j += 1 }
      if (!decodeResidual(br, order, blockSize, out)) return false
      // fixed predictors 0-4 (RFC 9639 §10.2.3)
      j = order
      while (j < blockSize) {
        val r = out(j)
        out(j) = order match {
          case 0 => r
          case 1 => r + out(j - 1)
          case 2 => r + 2 * out(j - 1) - out(j - 2)
          case 3 => r + 3 * out(j - 1) - 3 * out(j - 2) + out(j - 3)
          case _ => r + 4 * out(j - 1) - 6 * out(j - 2) + 4 * out(j - 3) - out(j - 4)
        }
        j += 1
      }
    } else if (typ >= 32) {
      val order = (typ & 31) + 1
      if (order > blockSize) return false
      var j = 0
      while (j < order) { out(j) = br.signed(bps); j += 1 }
      val precM1 = br.bits(4).toInt
      if (precM1 == 15) return false
      val prec = precM1 + 1
      val shift = br.signed(5)
      if (shift < 0) return false
      val coefs = new Array[Long](order)
      var i = 0
      while (i < order) { coefs(i) = br.signed(prec); i += 1 }
      if (br.failed) return false
      if (!decodeResidual(br, order, blockSize, out)) return false
      j = order
      while (j < blockSize) {
        var pred = 0L
        i = 0
        while (i < order) { pred += coefs(i) * out(j - 1 - i); i += 1 }
        out(j) = out(j) + (pred >> shift)
        j += 1
      }
    } else return false
    if (br.failed) return false
    if (wasted > 0) {
      var j = 0
      while (j < blockSize) { out(j) = out(j) << wasted; j += 1 }
    }
    true
  }

  /** Walk the metadata chain; returns (frameStart, sr, ch, bps,
    * total) or null.
    */
  private def streamInfo(p: Array[Byte]): Array[Long] = {
    if (!FlacMetaKernel.isFlac(p)) return null
    var at = 4
    var sr = -1L; var ch = -1L; var bps = -1L; var total = -1L
    var last = false
    var n = 0
    while (!last && n < FlacMetaKernel.MaxBlocks) {
      if (at + 4 > p.length) return null
      val hdr = p(at) & 0xFF
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7F
      val len = ((p(at + 1) & 0xFF) << 16) | ((p(at + 2) & 0xFF) << 8) |
        (p(at + 3) & 0xFF)
      if (at + 4 + len > p.length) return null
      if (n == 0) {
        if (typ != 0 || len != 34) return null
        val b = at + 4
        var bits = 0L
        var i = 0
        while (i < 8) { bits = (bits << 8) | (p(b + 10 + i) & 0xFFL); i += 1 }
        sr = bits >>> 44
        ch = ((bits >>> 41) & 0x7L) + 1
        bps = ((bits >>> 36) & 0x1FL) + 1
        total = bits & 0xFFFFFFFFFL
      }
      at += 4 + len
      n += 1
    }
    if (!last || sr <= 0) return null
    Array(at.toLong, sr, ch, bps, total)
  }

  /** Decode one frame starting at the reader's (byte-aligned)
    * position. Returns false on structural damage.
    */
  private def decodeFrame(p: Array[Byte], br: FlacBits, sr: Long, ch: Int,
      bps: Int, acc: Acc): Boolean = {
    val frameStart = br.atByte
    if (br.bits(14) != 0x3FFEL) return false
    if (br.bits(1) != 0L) return false
    br.bits(1) // blocking strategy — both accepted
    val bsCode = br.bits(4).toInt
    val srCode = br.bits(4).toInt
    val chAssign = br.bits(4).toInt
    val bpsCode = br.bits(3).toInt
    if (br.bits(1) != 0L) return false
    // coded number: UTF-8-style, 1-7 bytes
    val first = br.bits(8).toInt
    var extra = 0
    if ((first & 0x80) == 0) extra = 0
    else {
      var mask = 0x40
      while (mask != 0 && (first & mask) != 0) { extra += 1; mask >>= 1 }
      if (extra < 1 || extra > 6) return false
    }
    var i = 0
    while (i < extra) {
      val c = br.bits(8).toInt
      if ((c & 0xC0) != 0x80) return false
      i += 1
    }
    val blockSize = bsCode match {
      case 0 => return false
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => br.bits(8).toInt + 1
      case 7 => br.bits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    srCode match {
      case 0 => ()
      case c if c <= 11 => ()
      case 12 => br.bits(8)
      case 13 => br.bits(16)
      case 14 => br.bits(16)
      case _ => return false
    }
    val nCh = if (chAssign <= 7) chAssign + 1
      else if (chAssign <= 10) 2
      else return false
    if (nCh != ch) return false
    val frameBps = bpsCode match {
      case 0 => bps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => return false
    }
    if (frameBps != bps) return false
    if (br.failed || blockSize <= 0 || blockSize > MaxBlockSize) return false
    if (acc.emitted + blockSize.toLong * nCh > MaxInterleavedSamples) return false
    // CRC-8 over the header bytes (reader is byte-aligned here)
    if (!br.aligned) return false
    val headerCrc = FlacCrc.crc8(p, frameStart, br.atByte)
    if (br.bits(8).toInt != headerCrc) acc.crcOk = false
    // subframes
    val chans = new Array[Array[Long]](nCh)
    var c = 0
    while (c < nCh) {
      val side = (chAssign == 8 && c == 1) || (chAssign == 9 && c == 0) ||
        (chAssign == 10 && c == 1)
      val out = new Array[Long](blockSize)
      if (!decodeSubframe(br, blockSize, bps + (if (side) 1 else 0), out))
        return false
      chans(c) = out
      c += 1
    }
    // stereo decorrelation (RFC 9639 §10.1)
    if (chAssign == 8) { // left/side: right = left - side
      val l = chans(0); val s = chans(1)
      var j = 0
      while (j < blockSize) { s(j) = l(j) - s(j); j += 1 }
    } else if (chAssign == 9) { // right/side: left = side + right
      val s = chans(0); val r = chans(1)
      var j = 0
      while (j < blockSize) { s(j) = s(j) + r(j); j += 1 }
    } else if (chAssign == 10) { // mid/side
      val m = chans(0); val s = chans(1)
      var j = 0
      while (j < blockSize) {
        val mid2 = (m(j) << 1) | (s(j) & 1L)
        m(j) = (mid2 + s(j)) >> 1
        s(j) = (mid2 - s(j)) >> 1
        j += 1
      }
    }
    br.align()
    if (br.failed) return false
    val frameCrc = FlacCrc.crc16(p, frameStart, br.atByte)
    if (br.bits(16).toInt != frameCrc) acc.crcOk = false
    if (br.failed) return false
    // emit interleaved
    var j = 0
    while (j < blockSize) {
      c = 0
      while (c < nCh) { acc.emit(chans(c)(j)); c += 1 }
      j += 1
    }
    acc.nFrames += 1
    acc.nPerChannel += blockSize
    true
  }

  private def run(p: Array[Byte], withWindows: Boolean): (Array[Long], Acc) = {
    val si = streamInfo(p)
    if (si == null) return (null, null)
    val sr = si(1); val ch = si(2).toInt; val bps = si(3).toInt
    val total = si(4)
    if (ch < 1 || ch > 8 || bps < 4 || bps > 32) return (si, { val a = new Acc(0); a.structOk = false; a })
    val winTotal = if (withWindows) total * ch else 0L
    val acc = new Acc(winTotal)
    val br = new FlacBits(p)
    br.pos = si(0) << 3
    var done = false
    while (!done) {
      if (br.atByte >= p.length && br.aligned) done = true
      else if (acc.nFrames >= MaxFrames) { acc.structOk = false; done = true }
      else if (!decodeFrame(p, br, sr, ch, bps, acc)) {
        acc.structOk = false; done = true
      }
    }
    (si, acc)
  }

  /** Struct (flac_valid, decode_ok, channels, bits_per_sample,
    * n_frames, n_samples [per channel], sample_sum, sample_sum_sq,
    * peak_abs, crc_ok, matches_streaminfo) or null for non-FLAC /
    * unreadable-STREAMINFO bytes.
    */
  def stats(p: Array[Byte]): InternalRow = {
    val (si, acc) = run(p, withWindows = false)
    if (si == null) return null
    val ok = acc.structOk && acc.nFrames > 0
    if (!ok)
      return new GenericInternalRow(Array[Any](
        true, false, si(2), si(3), null, null, null, null, null, null, null))
    val total = si(4)
    new GenericInternalRow(Array[Any](
      true, true, si(2), si(3), acc.nFrames, acc.nPerChannel,
      acc.sum, acc.sumSq, acc.peak, acc.crcOk,
      total > 0 && acc.nPerChannel == total))
  }

  /** 64-bit energy-gradient fingerprint over the DECODED interleaved
    * samples — [[AudioHashKernel]]'s exact arithmetic (65 windows,
    * floor mean absolute amplitude, strict consecutive-window
    * gradient), streamed during the decode so the sample stream is
    * never materialized. Null when the stream is structurally
    * damaged, STREAMINFO declares no total, or the decoded count
    * disagrees with STREAMINFO (window boundaries would lie).
    */
  def ahash(p: Array[Byte]): java.lang.Long = {
    val (si, acc) = run(p, withWindows = true)
    if (si == null || acc == null) return null
    if (!acc.structOk || acc.nFrames == 0L) return null
    val total = si(4) * si(2)
    if (si(4) <= 0 || acc.emitted != total || total < Windows) return null
    val means = new Array[Long](Windows)
    var w = 0
    while (w < Windows) {
      val i0 = w.toLong * total / Windows
      val i1 = (w + 1).toLong * total / Windows
      means(w) = if (i1 > i0) acc.winSums(w) / (i1 - i0) else 0L
      w += 1
    }
    var bitsOut = 0L
    var b = 0
    while (b < 64) {
      if (means(b) > means(b + 1)) bitsOut |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(bitsOut)
  }
}

/** MSB-first bit writer — the encoder half of [[FlacBits]]. */
final class FlacBitWriter {
  private val out = new java.io.ByteArrayOutputStream(256)
  private var acc = 0L
  private var nb = 0

  def put(v: Long, n: Int): Unit = {
    acc = (acc << n) | (v & ((1L << n) - 1L))
    nb += n
    while (nb >= 8) {
      out.write(((acc >>> (nb - 8)) & 0xFF).toInt)
      nb -= 8
    }
  }

  def putUnary(q: Long): Unit = {
    var i = 0L
    while (i < q) { put(0, 1); i += 1 }
    put(1, 1)
  }

  def putRice(v: Long, param: Int): Unit = {
    val u = (v << 1) ^ (v >> 63)
    putUnary(u >>> param)
    put(u, param)
  }

  def align(): Unit = if (nb > 0) put(0, 8 - nb)

  def bytes: Array[Byte] = { align(); out.toByteArray }
}

/** Deterministic FLAC AUDIO synthesis from a doc_id — the
  * synthesis-side inverse of [[FlacAudioKernel]] (the established
  * `Vp8lEncoder`/`JpegEncoder` convention): a real FLAC encoder
  * whose CODING lane rotates per doc while the decoded samples stay
  * closed-form, so the DuckDB oracle recomputes the stats from
  * doc_id arithmetic and a hash match proves the bit-level decode
  * across every lane.
  *
  * Per valid doc: ch = 1+d%2, bps = 8 (d%3==0) or 16, N = 96+(d%5)·32
  * samples per channel in 64-sample frames (the last one partial).
  * Frame 0 is CONSTANT subframes; frames ≥1 rotate by d%4 — verbatim
  * / FIXED order 1 (rice) / FIXED order 2 (rice2, 2 partitions) /
  * LPC order 2 (coefs 1536,512 shift 10). Stereo docs rotate
  * decorrelation by (d/4)%3 — independent / left-side / mid-side.
  * Samples: j<64 → ((d·13 + c·29) mod M) − M/2; j≥64 →
  * ((d+1)·31 + c·17 + j·7) mod M − M/2, with M = 160 (8-bit) or
  * 2000. Every d%20==5 doc ships a FLIPPED final CRC-16 byte —
  * samples decode, `crc_ok` goes false (the verdict lane).
  */
object FlacAudioSynthKernel {
  def synth(d: Long): Array[Byte] = {
    val ch = (1 + d % 2).toInt
    val bps = if (d % 3 == 0) 8 else 16
    val m = if (bps == 8) 160L else 2000L
    val n = (96 + (d % 5) * 32).toInt
    val sr = 8000L + (d % 5) * 4000L
    val lane = (d % 4).toInt
    val decorr = if (ch == 2) ((d / 4) % 3).toInt else 0
    val breakCrc = d % 20 == 5
    def sample(c: Int, j: Int): Long =
      if (j < 64) (d * 13 + c * 29) % m - m / 2
      else ((d + 1) * 31 + c * 17 + j * 7) % m - m / 2
    encode(ch, bps, n, sr, lane, decorr, breakCrc, constFirst = true, sample)
  }

  /** [[synth]] split at its natural seams — (fLaC+STREAMINFO header,
    * one byte array per encoded frame) — for container wrappers that
    * need packet boundaries (the Ogg-FLAC mapping ships one frame per
    * packet). Concatenating the parts is bit-identical to [[synth]].
    */
  def synthParts(d: Long): (Array[Byte], Array[Array[Byte]]) = {
    val ch = (1 + d % 2).toInt
    val bps = if (d % 3 == 0) 8 else 16
    val m = if (bps == 8) 160L else 2000L
    val n = (96 + (d % 5) * 32).toInt
    val sr = 8000L + (d % 5) * 4000L
    val lane = (d % 4).toInt
    val decorr = if (ch == 2) ((d / 4) % 3).toInt else 0
    val breakCrc = d % 20 == 5
    def sample(c: Int, j: Int): Long =
      if (j < 64) (d * 13 + c * 29) % m - m / 2
      else ((d + 1) * 31 + c * 17 + j * 7) % m - m / 2
    encodeParts(ch, bps, n, sr, lane, decorr, breakCrc, constFirst = true, sample)
  }

  /** [[synthWindowed]] split the same way. */
  def synthWindowedParts(key: Long, m: Int): (Array[Byte], Array[Array[Byte]]) = {
    val nWin = FlacAudioKernel.Windows
    val n = nWin * m
    def sample(c: Int, j: Int): Long = (key * 13 + (j / m) * 29) % 1024 - 512
    encodeParts(1, 16, n, 8000L, 0, 0, breakCrc = false, constFirst = false, sample)
  }

  /** 16-bit mono verbatim encode of the planted 65-window stream the
    * WAV twin [[graft.multimodal.Binary.Wav.synthWindowedFromDocs]]
    * carries — `((key·13 + w·29) mod 1024) − 512`, each amplitude
    * repeated `m` times — so a FLAC re-encode of the same audio
    * collides with the WAV original in the perceptual dedup gate.
    */
  def synthWindowed(key: Long, m: Int): Array[Byte] = {
    val nWin = FlacAudioKernel.Windows
    val n = nWin * m
    def sample(c: Int, j: Int): Long = (key * 13 + (j / m) * 29) % 1024 - 512
    encode(1, 16, n, 8000L, 0, 0, breakCrc = false, constFirst = false, sample)
  }

  private def encode(ch: Int, bps: Int, n: Int, sr: Long, lane: Int,
      decorr: Int, breakCrc: Boolean, constFirst: Boolean,
      sample: (Int, Int) => Long): Array[Byte] = {
    val (hdr, frames) = encodeParts(ch, bps, n, sr, lane, decorr, breakCrc,
      constFirst, sample)
    val out = new java.io.ByteArrayOutputStream(1024)
    out.write(hdr, 0, hdr.length)
    var i = 0
    while (i < frames.length) { out.write(frames(i), 0, frames(i).length); i += 1 }
    out.toByteArray
  }

  private def encodeParts(ch: Int, bps: Int, n: Int, sr: Long, lane: Int,
      decorr: Int, breakCrc: Boolean, constFirst: Boolean,
      sample: (Int, Int) => Long): (Array[Byte], Array[Array[Byte]]) = {
    val out = new java.io.ByteArrayOutputStream(1024)
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO, last block
    val si = new Array[Byte](34)
    si(0) = 0; si(1) = 64 // min block
    si(2) = 0; si(3) = 64 // max block
    val packed = (sr << 44) | ((ch - 1).toLong << 41) | ((bps - 1).toLong << 36) | n.toLong
    var i = 0
    while (i < 8) { si(10 + i) = ((packed >>> (56 - 8 * i)) & 0xFF).toByte; i += 1 }
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si, 0, 34)
    val header = out.toByteArray
    val nFrames = (n + 63) / 64
    val frameParts = new Array[Array[Byte]](nFrames)
    var f = 0
    while (f < nFrames) {
      val j0 = f * 64
      val blockSize = math.min(64, n - j0)
      // physical channel streams after decorrelation
      val phys = new Array[Array[Long]](ch)
      var c = 0
      while (c < ch) { phys(c) = new Array[Long](blockSize); c += 1 }
      var j = 0
      while (j < blockSize) {
        if (ch == 1 || decorr == 0) {
          c = 0
          while (c < ch) { phys(c)(j) = sample(c, j0 + j); c += 1 }
        } else {
          val l = sample(0, j0 + j)
          val r = sample(1, j0 + j)
          if (decorr == 1) { phys(0)(j) = l; phys(1)(j) = l - r } // left/side
          else { phys(0)(j) = (l + r) >> 1; phys(1)(j) = l - r } // mid/side
        }
        j += 1
      }
      val chAssign = if (ch == 1 || decorr == 0) ch - 1
        else if (decorr == 1) 8 else 10
      // header (byte-aligned): sync/blocking, codes, frame number,
      // 8-bit blocksize-1, CRC-8
      val hdr = new java.io.ByteArrayOutputStream(8)
      hdr.write(0xFF); hdr.write(0xF8)
      hdr.write((6 << 4) | 0) // blocksize 8-bit form, sr from streaminfo
      val bpsCode = if (bps == 8) 1 else 4
      hdr.write((chAssign << 4) | (bpsCode << 1))
      hdr.write(f) // UTF-8 coded frame number (< 128)
      hdr.write(blockSize - 1)
      val hb = hdr.toByteArray
      val frame = new java.io.ByteArrayOutputStream(512)
      frame.write(hb, 0, hb.length)
      frame.write(FlacCrc.crc8(hb, 0, hb.length))
      // subframes
      val bw = new FlacBitWriter
      c = 0
      while (c < ch) {
        val side = chAssign >= 8 && c == 1
        val sbps = bps + (if (side) 1 else 0)
        val s = phys(c)
        val constant = constFirst && f == 0
        val riceParam = if (bps == 8) 6 else 9
        if (constant) {
          bw.put(0, 1); bw.put(0, 6); bw.put(0, 1)
          bw.put(s(0), sbps)
        } else lane match {
          case 0 => // verbatim
            bw.put(0, 1); bw.put(1, 6); bw.put(0, 1)
            j = 0
            while (j < blockSize) { bw.put(s(j), sbps); j += 1 }
          case 1 => // fixed order 1, rice, one partition
            bw.put(0, 1); bw.put(8 + 1, 6); bw.put(0, 1)
            bw.put(s(0), sbps)
            bw.put(0, 2); bw.put(0, 4) // method 0, partition order 0
            bw.put(riceParam, 4)
            j = 1
            while (j < blockSize) { bw.putRice(s(j) - s(j - 1), riceParam); j += 1 }
          case 2 => // fixed order 2, rice2, TWO partitions
            bw.put(0, 1); bw.put(8 + 2, 6); bw.put(0, 1)
            bw.put(s(0), sbps); bw.put(s(1), sbps)
            bw.put(1, 2); bw.put(1, 4) // method 1, partition order 1
            val half = blockSize / 2
            bw.put(riceParam, 5)
            j = 2
            while (j < half) {
              bw.putRice(s(j) - 2 * s(j - 1) + s(j - 2), riceParam); j += 1
            }
            bw.put(riceParam, 5)
            while (j < blockSize) {
              bw.putRice(s(j) - 2 * s(j - 1) + s(j - 2), riceParam); j += 1
            }
          case _ => // LPC order 2: pred = (1536·s[j-1] + 512·s[j-2]) >> 10
            bw.put(0, 1); bw.put(32 | (2 - 1), 6); bw.put(0, 1)
            bw.put(s(0), sbps); bw.put(s(1), sbps)
            bw.put(11, 4) // precision 12
            bw.put(10, 5) // shift
            bw.put(1536, 12); bw.put(512, 12)
            bw.put(0, 2); bw.put(0, 4)
            bw.put(riceParam, 4)
            j = 2
            while (j < blockSize) {
              val pred = (1536 * s(j - 1) + 512 * s(j - 2)) >> 10
              bw.putRice(s(j) - pred, riceParam)
              j += 1
            }
        }
        c += 1
      }
      val sub = bw.bytes
      frame.write(sub, 0, sub.length)
      val fb = frame.toByteArray
      var crc = FlacCrc.crc16(fb, 0, fb.length)
      if (breakCrc && f == nFrames - 1) crc ^= 0xFF
      frame.write((crc >> 8) & 0xFF); frame.write(crc & 0xFF)
      frameParts(f) = frame.toByteArray
      f += 1
    }
    (header, frameParts)
  }
}

/** `flac_audio_stats(payload) → struct<...11 fields>`; see
  * [[FlacAudioKernel.stats]].
  */
case class FlacAudioStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("flac_valid", BooleanType),
    StructField("decode_ok", BooleanType),
    StructField("channels", LongType),
    StructField("bits_per_sample", LongType),
    StructField("n_frames", LongType),
    StructField("n_samples", LongType),
    StructField("sample_sum", LongType),
    StructField("sample_sum_sq", LongType),
    StructField("peak_abs", LongType),
    StructField("crc_ok", BooleanType),
    StructField("matches_streaminfo", BooleanType)))
  override def nullable: Boolean = true
  override def prettyName: String = "flac_audio_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    FlacAudioKernel.stats(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.FlacAudioKernel.stats($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `flac_audio_dhash(payload) → bigint` — the perceptual audio
  * fingerprint over a DECODED FLAC stream; see
  * [[FlacAudioKernel.ahash]].
  */
case class FlacAudioDhash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "flac_audio_dhash"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any = {
    val v = FlacAudioKernel.ahash(d.asInstanceOf[Array[Byte]])
    if (v == null) null else v.longValue()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |java.lang.Long gfh = graft.expressions.FlacAudioKernel.ahash($d);
      |if (gfh == null) { ${ev.isNull} = true; } else { ${ev.value} = gfh.longValue(); }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `flac_audio_synth(doc_id) → binary`; see
  * [[FlacAudioSynthKernel.synth]].
  */
case class FlacAudioSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "flac_audio_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    FlacAudioSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.FlacAudioSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `flac_windowed_synth(key) → binary`; see
  * [[FlacAudioSynthKernel.synthWindowed]] (m = 4, the WAV windowed
  * synth's default).
  */
case class FlacWindowedSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "flac_windowed_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    FlacAudioSynthKernel.synthWindowed(d.asInstanceOf[Long], 4)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.FlacAudioSynthKernel.synthWindowed($d, 4);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
