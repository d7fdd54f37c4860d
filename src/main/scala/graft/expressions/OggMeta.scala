package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** OGG container triage — the THIRTEENTH family: the free-codec
  * audio container (Vorbis, Opus, FLAC-in-Ogg, Theora) a crawled
  * audio/podcast corpus carries alongside MP3. The format is a page
  * stream, so triage IS a page walk: per-page 27-byte headers
  * ("OggS", version 0, continuation/BOS/EOS flags, 64-bit LE granule
  * position, serial, sequence number, CRC), the lacing-value segment
  * table (packets complete at a lacing value < 255, spill across
  * pages at 255), and the first packet's codec ID header — Vorbis
  * (`\x01vorbis`: channels u8, rate u32), Opus (`OpusHead`:
  * channels, 16-bit pre-skip, input rate), and the Ogg-FLAC mapping
  * (`\x7FFLAC` wrapping a real fLaC STREAMINFO whose packed 64 bits
  * this engine already decodes for bare FLAC).
  *
  * Every page CRC is VERIFIED — OGG's CRC-32 (poly 0x04C11DB7,
  * unreflected, init/xorout 0) over the page with the CRC field
  * zeroed — so `crc_ok` is a real integrity verdict, not a parse
  * flag. `consistent` means a simple single-stream file: wall-to-wall
  * pages, one serial, version 0 throughout, sequence numbers
  * 0..n−1, BOS exactly on the first page, EOS on the last, and
  * continuation flags that agree with the lacing state (a page
  * opening mid-packet must carry flag 0x01, and only then).
  *
  * Duration is exact integer arithmetic from the final granule
  * position: PCM samples for Vorbis/FLAC (granule·1000/rate), 48 kHz
  * ticks minus pre-skip for Opus per RFC 7845. Never throws; bounded
  * walk (MaxPages).
  */
object OggMetaKernel {
  val MaxPages = 1 << 16

  /** Strict detection: capture pattern plus stream-structure version
    * 0 — a NUL byte, never printable, so ASCII text that happens to
    * start with "OggS" can NOT route here.
    */
  def isOgg(p: Array[Byte]): Boolean =
    p.length >= 5 && p(0) == 'O' && p(1) == 'g' && p(2) == 'g' &&
      p(3) == 'S' && p(4) == 0

  /** OGG page CRC-32: polynomial 0x04C11DB7, MSB-first (unreflected),
    * init 0, no final xor, CRC field treated as zero.
    */
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  /** CRC over [off, off+len) with the 4 CRC bytes at crcAt read as 0. */
  def pageCrc(p: Array[Byte], off: Int, len: Int, crcAt: Int): Int = {
    var crc = 0
    var i = off
    val end = off + len
    while (i < end) {
      val b = if (i >= crcAt && i < crcAt + 4) 0 else p(i) & 0xFF
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ b) & 0xFF)
      i += 1
    }
    crc
  }

  private def leU32(p: Array[Byte], off: Int): Long =
    (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)

  private def leU64(p: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (p(off + i) & 0xFFL); i -= 1 }
    v
  }

  /** Struct (ogg_valid, codec, sample_rate, channels, pre_skip,
    * n_pages, n_packets, last_granule, duration_ms, crc_ok,
    * consistent) or null for non-OGG bytes / an unwalkable first
    * page.
    */
  def parse(p: Array[Byte]): InternalRow = {
    if (!isOgg(p)) return null
    var at = 0
    var nPages = 0L
    var nPackets = 0L
    var lastGranule = 0L
    var consistent = true
    var crcOk = true
    var serial = 0L
    var sawEos = false
    var open = false // a packet is mid-flight across a page boundary
    var firstPacket: Array[Byte] = null
    while (at < p.length && nPages < MaxPages) {
      if (at + 27 > p.length || p(at) != 'O' || p(at + 1) != 'g' ||
          p(at + 2) != 'g' || p(at + 3) != 'S') {
        consistent = false
        at = p.length // stop: bytes past the last parseable page
      } else {
        if (p(at + 4) != 0) consistent = false
        val hdrType = p(at + 5) & 0xFF
        val granule = leU64(p, at + 6)
        val ser = leU32(p, at + 14)
        val seq = leU32(p, at + 18)
        val storedCrc = leU32(p, at + 22)
        val nSegs = p(at + 26) & 0xFF
        if (at + 27 + nSegs > p.length) { consistent = false; at = p.length }
        else {
          var body = 0
          var lastLacing = -1
          var packetsHere = 0L
          var i = 0
          while (i < nSegs) {
            val l = p(at + 27 + i) & 0xFF
            body += l
            if (l < 255) packetsHere += 1
            lastLacing = l
            i += 1
          }
          val pageLen = 27 + nSegs + body
          if (at + pageLen > p.length) { consistent = false; at = p.length }
          else {
            if (nPages == 0L) {
              serial = ser
              if ((hdrType & 2) == 0) consistent = false // BOS missing
              if ((hdrType & 1) != 0) consistent = false
              // first packet = leading lacing run of the first page
              var pl = 0
              var j = 0
              var doneP = false
              while (j < nSegs && !doneP) {
                val l = p(at + 27 + j) & 0xFF
                pl += l
                if (l < 255) doneP = true
                j += 1
              }
              firstPacket = new Array[Byte](pl)
              System.arraycopy(p, at + 27 + nSegs, firstPacket, 0, pl)
            } else {
              if ((hdrType & 2) != 0) consistent = false // stray BOS
              if (ser != serial) consistent = false // multiplexed/chained
              if (((hdrType & 1) != 0) != open) consistent = false
            }
            if (seq != nPages) consistent = false
            if (sawEos) consistent = false // pages after EOS
            if ((pageCrc(p, at, pageLen, at + 22) & 0xFFFFFFFFL) != storedCrc)
              crcOk = false
            if ((hdrType & 4) != 0) sawEos = true
            open = nSegs > 0 && lastLacing == 255
            lastGranule = granule
            nPages += 1
            nPackets += packetsHere
            at += pageLen
          }
        }
      }
    }
    if (nPages == 0L) return null
    if (!sawEos || open || nPages >= MaxPages) consistent = false
    // codec from the first packet's ID header
    var codec = "unknown"
    var sr = -1L
    var ch = -1L
    var preSkip = -1L
    val f = firstPacket
    if (f != null) {
      if (f.length >= 30 && f(0) == 1 && f(1) == 'v' && f(2) == 'o' &&
          f(3) == 'r' && f(4) == 'b' && f(5) == 'i' && f(6) == 's') {
        codec = "vorbis"
        ch = f(11) & 0xFFL
        sr = leU32(f, 12)
      } else if (f.length >= 19 && f(0) == 'O' && f(1) == 'p' &&
          f(2) == 'u' && f(3) == 's' && f(4) == 'H' && f(5) == 'e' &&
          f(6) == 'a' && f(7) == 'd') {
        codec = "opus"
        ch = f(9) & 0xFFL
        preSkip = (f(10) & 0xFFL) | ((f(11) & 0xFFL) << 8)
        sr = leU32(f, 12)
      } else if (f.length >= 51 && (f(0) & 0xFF) == 0x7F && f(1) == 'F' &&
          f(2) == 'L' && f(3) == 'A' && f(4) == 'C' && f(9) == 'f' &&
          f(10) == 'L' && f(11) == 'a' && f(12) == 'C') {
        // Ogg-FLAC mapping: 9-byte mapping header, then fLaC + the
        // STREAMINFO block — the same packed 64 bits the bare-FLAC
        // kernel decodes (rate in the top 20)
        codec = "flac"
        var bits = 0L
        var i = 0
        while (i < 8) { bits = (bits << 8) | (f(27 + i) & 0xFFL); i += 1 }
        sr = bits >>> 44
        ch = ((bits >>> 41) & 0x7L) + 1
      } else if (f.length >= 7 && (f(0) & 0xFF) == 0x80 && f(1) == 't' &&
          f(2) == 'h' && f(3) == 'e' && f(4) == 'o' && f(5) == 'r' &&
          f(6) == 'a') {
        codec = "theora"
      }
    }
    val durationMs: Any = codec match {
      case "opus" =>
        val s = lastGranule - math.max(preSkip, 0L)
        if (s >= 0) s * 1000L / 48000L else null
      case "vorbis" | "flac" =>
        if (sr > 0 && lastGranule >= 0) lastGranule * 1000L / sr else null
      case _ => null
    }
    new GenericInternalRow(Array[Any](
      true, UTF8String.fromString(codec),
      if (sr >= 0) sr else null, if (ch >= 0) ch else null,
      if (preSkip >= 0) preSkip else null,
      nPages, nPackets, lastGranule, durationMs, crcOk, consistent))
  }
}

/** Deterministic OGG synthesis from a doc_id — the synthesis-side
  * inverse of [[OggMetaKernel]] (the `FlacSynthKernel` convention):
  * real pages with REAL CRCs, rotating codec (Vorbis / Opus /
  * Ogg-FLAC with an embedded STREAMINFO), rate/channels/pre-skip,
  * page counts and granule steps, a 255-lacing comment packet lane
  * and a multi-lacing (300-byte) audio packet lane, plus a
  * flipped-CRC lane — every parsed field recomputable closed-form
  * from doc_id.
  */
object OggSynthKernel {
  def synth(d: Long): Array[Byte] = {
    val codec = (d % 3).toInt // 0 vorbis, 1 opus, 2 ogg-flac
    val sr = 8000L + (d % 5) * 4000L
    val ch = 1 + d % 2
    val preSkip = 120L + (d % 4) * 60L
    val nAudio = (1 + d % 4).toInt
    val g = 960L + (d % 7) * 320L
    val granule0 = if (codec == 1) preSkip else 0L
    val out = new java.io.ByteArrayOutputStream(1024)
    var seq = 0L

    def page(hdrType: Int, granule: Long, packets: Array[Array[Byte]]): Unit = {
      val lacings = new java.io.ByteArrayOutputStream(8)
      val body = new java.io.ByteArrayOutputStream(512)
      var i = 0
      while (i < packets.length) {
        var rem = packets(i).length
        while (rem >= 255) { lacings.write(255); rem -= 255 }
        lacings.write(rem)
        body.write(packets(i), 0, packets(i).length)
        i += 1
      }
      val lac = lacings.toByteArray
      val bod = body.toByteArray
      val pg = new Array[Byte](27 + lac.length + bod.length)
      pg(0) = 'O'; pg(1) = 'g'; pg(2) = 'g'; pg(3) = 'S'
      pg(4) = 0
      pg(5) = hdrType.toByte
      var k = 0
      while (k < 8) { pg(6 + k) = ((granule >>> (8 * k)) & 0xFF).toByte; k += 1 }
      val serial = 0x47524654L // deterministic
      k = 0
      while (k < 4) { pg(14 + k) = ((serial >>> (8 * k)) & 0xFF).toByte; k += 1 }
      k = 0
      while (k < 4) { pg(18 + k) = ((seq >>> (8 * k)) & 0xFF).toByte; k += 1 }
      pg(26) = lac.length.toByte
      System.arraycopy(lac, 0, pg, 27, lac.length)
      System.arraycopy(bod, 0, pg, 27 + lac.length, bod.length)
      val crc = OggMetaKernel.pageCrc(pg, 0, pg.length, 22)
      k = 0
      while (k < 4) { pg(22 + k) = ((crc >>> (8 * k)) & 0xFF).toByte; k += 1 }
      out.write(pg, 0, pg.length)
      seq += 1
    }

    val id: Array[Byte] = codec match {
      case 0 =>
        val b = new Array[Byte](30)
        b(0) = 1; b(1) = 'v'; b(2) = 'o'; b(3) = 'r'; b(4) = 'b'; b(5) = 'i'; b(6) = 's'
        // version u32 = 0 at 7..10
        b(11) = ch.toByte
        var k = 0
        while (k < 4) { b(12 + k) = ((sr >>> (8 * k)) & 0xFF).toByte; k += 1 }
        // bitrates 15..26 zero; blocksizes: 256/2048
        b(27) = ((11 << 4) | 8).toByte
        b(29) = 1 // framing bit
        b
      case 1 =>
        val b = new Array[Byte](19)
        b(0) = 'O'; b(1) = 'p'; b(2) = 'u'; b(3) = 's'
        b(4) = 'H'; b(5) = 'e'; b(6) = 'a'; b(7) = 'd'
        b(8) = 1 // version
        b(9) = ch.toByte
        b(10) = (preSkip & 0xFF).toByte; b(11) = ((preSkip >> 8) & 0xFF).toByte
        var k = 0
        while (k < 4) { b(12 + k) = ((sr >>> (8 * k)) & 0xFF).toByte; k += 1 }
        // output gain 0, mapping family 0
        b
      case _ =>
        // Ogg-FLAC mapping v1.0: 0x7F FLAC 1 0 nHeaders(2 BE), then
        // fLaC + a real STREAMINFO block (last-flag set, len 34)
        val b = new Array[Byte](9 + 4 + 4 + 34)
        b(0) = 0x7F.toByte; b(1) = 'F'; b(2) = 'L'; b(3) = 'A'; b(4) = 'C'
        b(5) = 1; b(6) = 0; b(7) = 0; b(8) = 1
        b(9) = 'f'; b(10) = 'L'; b(11) = 'a'; b(12) = 'C'
        b(13) = 0x80.toByte; b(14) = 0; b(15) = 0; b(16) = 34
        b(17) = 0x10; b(18) = 0 // min block 4096
        b(19) = 0x10; b(20) = 0 // max block 4096
        val total = 1000L + d % 5000
        val bits = (sr << 44) | ((ch - 1) << 41) | (15L << 36) | total
        var k = 0
        while (k < 8) { b(27 + k) = ((bits >>> (56 - 8 * k)) & 0xFF).toByte; k += 1 }
        b
    }
    page(2, granule0, Array(id)) // BOS; granule 0 on header pages (opus: pre-skip convention varies — use granule0 so closed form is exact)

    // comment header packet — content opaque to triage; the d%5==2
    // lane is EXACTLY 255 bytes (lacing [255, 0]), d%5==3 is 300
    // (lacing [255, 45])
    val commentLen = if (d % 5 == 2) 255 else if (d % 5 == 3) 300 else (20 + d % 40).toInt
    val comment = new Array[Byte](commentLen)
    var i = 0
    while (i < commentLen) { comment(i) = ((d * 31 + i * 7) & 0xFF).toByte; i += 1 }
    if (codec == 0) { comment(0) = 3; comment(1) = 'v' }
    if (codec == 1) { comment(0) = 'O'; comment(1) = 'p' }
    page(0, granule0, Array(comment))

    var pIdx = 0
    while (pIdx < nAudio) {
      val audioLen = (40 + d % 30).toInt
      val audio = new Array[Byte](audioLen)
      var j = 0
      while (j < audioLen) { audio(j) = ((d * 13 + pIdx * 29 + j * 3) & 0xFF).toByte; j += 1 }
      val last = pIdx == nAudio - 1
      page(if (last) 4 else 0, granule0 + (pIdx + 1) * g, Array(audio))
      pIdx += 1
    }
    val bytes = out.toByteArray
    if (d % 20 == 7) {
      // flipped-CRC lane: corrupt the LAST page's stored CRC —
      // structure intact, integrity verdict false
      var at = 0
      var lastCrcAt = -1
      while (at + 27 <= bytes.length) {
        val nSegs = bytes(at + 26) & 0xFF
        var body = 0
        var k = 0
        while (k < nSegs) { body += bytes(at + 27 + k) & 0xFF; k += 1 }
        lastCrcAt = at + 22
        at += 27 + nSegs + body
      }
      bytes(lastCrcAt) = (bytes(lastCrcAt) ^ 0xFF).toByte
    }
    bytes
  }
}

/** `ogg_meta(payload) → struct<...11 fields>`; see
  * [[OggMetaKernel.parse]].
  */
case class OggMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("ogg_valid", BooleanType),
    StructField("codec", StringType),
    StructField("sample_rate", LongType),
    StructField("channels", LongType),
    StructField("pre_skip", LongType),
    StructField("n_pages", LongType),
    StructField("n_packets", LongType),
    StructField("last_granule", LongType),
    StructField("duration_ms", LongType),
    StructField("crc_ok", BooleanType),
    StructField("consistent", BooleanType)))
  override def nullable: Boolean = true
  override def prettyName: String = "ogg_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    OggMetaKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.OggMetaKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `ogg_synth(doc_id) → binary`; see [[OggSynthKernel.synth]]. */
case class OggSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "ogg_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    OggSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.OggSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
