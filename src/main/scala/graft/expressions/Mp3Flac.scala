package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MP3 (MPEG audio) container triage — the ELEVENTH family: crawled
  * audio corpora are MP3-first, and until this kernel a `.mp3`
  * payload routed to the null lane. The format is a bare frame
  * stream, so triage IS a frame walk: optional ID3v2 prefix (syncsafe
  * 28-bit size, footer flag), per-frame 4-byte headers (11-bit sync,
  * MPEG version 1/2/2.5, layers I–III, bitrate/sample-rate table
  * indexes, padding), the version×layer frame-length arithmetic,
  * sample-per-frame accounting into an exact integer duration, the
  * Xing/Info VBR tag behind the version/mode-dependent side-info
  * offset, and the legacy 128-byte ID3v1 trailer.
  *
  * `consistent` means wall-to-wall frames: every byte between the
  * ID3v2 prefix and the ID3v1 trailer belongs to a parsed frame. A
  * free-format bitrate (index 0) or reserved field invalidates —
  * frame lengths are then undefined. Never throws; bounded walk.
  */
object Mp3MetaKernel {
  val MaxFrames = 1 << 20

  // bitrate tables, kbps; row: [version][layer] — layer 1/2/3
  private val BrMpeg1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrMpeg1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrMpeg1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrMpeg2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrMpeg2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val SrMpeg1 = Array(44100, 48000, 32000)
  private val SrMpeg2 = Array(22050, 24000, 16000)
  private val SrMpeg25 = Array(11025, 12000, 8000)

  /** Strict detection: the ID3v2 route additionally requires a sane
    * version byte (2-4 — never a printable character, so ASCII text
    * that happens to start with "ID3" can NOT route here), and the
    * bare-frame route a non-reserved version/layer. UTF-8 text can
    * never carry the 0xFF sync byte.
    */
  def isMp3(p: Array[Byte]): Boolean =
    (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3' &&
      p(3) >= 2 && p(3) <= 4) ||
      (p.length >= 4 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xE0) == 0xE0 &&
        ((p(1) >> 3) & 3) != 1 && ((p(1) >> 1) & 3) != 0)

  /** Frame geometry from a 4-byte header at `off`: (frameLen,
    * samplesPerFrame, bitrateKbps, sampleRate, verCode, layer, mode),
    * or null. verCode: 0=MPEG1, 1=MPEG2, 2=MPEG2.5.
    */
  private def frame(p: Array[Byte], off: Int): Array[Int] = {
    if (off + 4 > p.length) return null
    if ((p(off) & 0xFF) != 0xFF || (p(off + 1) & 0xE0) != 0xE0) return null
    val verBits = (p(off + 1) >> 3) & 3
    val layerBits = (p(off + 1) >> 1) & 3
    if (verBits == 1 || layerBits == 0) return null // reserved
    val ver = verBits match { case 3 => 0 case 2 => 1 case _ => 2 }
    val layer = 4 - layerBits // 1, 2, 3
    val brIdx = (p(off + 2) >> 4) & 15
    val srIdx = (p(off + 2) >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return null
    val pad = (p(off + 2) >> 1) & 1
    val mode = (p(off + 3) >> 6) & 3
    val br = (ver, layer) match {
      case (0, 1) => BrMpeg1L1(brIdx)
      case (0, 2) => BrMpeg1L2(brIdx)
      case (0, 3) => BrMpeg1L3(brIdx)
      case (_, 1) => BrMpeg2L1(brIdx)
      case _ => BrMpeg2L23(brIdx)
    }
    val sr = ver match {
      case 0 => SrMpeg1(srIdx)
      case 1 => SrMpeg2(srIdx)
      case _ => SrMpeg25(srIdx)
    }
    val (len, spf) = layer match {
      case 1 => ((12 * br * 1000 / sr + pad) * 4, 384)
      case 2 => (144 * br * 1000 / sr + pad, 1152)
      case _ =>
        if (ver == 0) (144 * br * 1000 / sr + pad, 1152)
        else (72 * br * 1000 / sr + pad, 576)
    }
    if (len < 4) return null
    Array(len, spf, br, sr, ver, layer, mode)
  }

  /** Struct (mp3_valid, has_id3v2, id3v2_bytes, mpeg_version, layer,
    * bitrate_kbps, sample_rate, channel_mode, n_frames, duration_ms,
    * has_id3v1, is_vbr, consistent) or null for non-MP3 bytes.
    */
  def parse(p: Array[Byte]): InternalRow = {
    if (!isMp3(p)) return null
    var off = 0
    var hasId3v2 = false
    var id3v2Bytes = 0L
    if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      // syncsafe 28-bit size; bit 4 of flags = footer (10 more bytes)
      if (((p(6) | p(7) | p(8) | p(9)) & 0x80) != 0) return null
      val size = ((p(6) & 0x7F) << 21) | ((p(7) & 0x7F) << 14) |
        ((p(8) & 0x7F) << 7) | (p(9) & 0x7F)
      val footer = (p(5) & 0x10) != 0
      hasId3v2 = true
      id3v2Bytes = 10L + size + (if (footer) 10 else 0)
      if (id3v2Bytes >= p.length) return null
      off = id3v2Bytes.toInt
    }
    // ID3v1 trailer: fixed 128 bytes at the very end
    var end = p.length
    var hasId3v1 = false
    if (end - off >= 128 && p(end - 128) == 'T' && p(end - 127) == 'A' &&
        p(end - 126) == 'G') {
      hasId3v1 = true
      end -= 128
    }
    val first = frame(p, off)
    if (first == null) return null
    // Xing/Info VBR tag sits after the layer-III side info
    val sideInfo =
      if (first(5) == 3) {
        if (first(4) == 0) { if (first(6) == 3) 17 else 32 }
        else { if (first(6) == 3) 9 else 17 }
      } else -1
    val xingAt = off + 4 + sideInfo
    val isVbr = sideInfo >= 0 && xingAt + 4 <= p.length &&
      ((p(xingAt) == 'X' && p(xingAt + 1) == 'i' && p(xingAt + 2) == 'n' &&
        p(xingAt + 3) == 'g') ||
        (p(xingAt) == 'I' && p(xingAt + 1) == 'n' && p(xingAt + 2) == 'f' &&
          p(xingAt + 3) == 'o'))
    // frame walk
    var nFrames = 0L
    var samples = 0L
    var at = off
    var consistent = true
    var done = false
    while (!done) {
      if (at == end) done = true
      else if (at > end || nFrames >= MaxFrames) { consistent = false; done = true }
      else {
        val f = frame(p, at)
        if (f == null) { consistent = false; done = true }
        else if (at + f(0) > end) { consistent = false; done = true }
        else {
          nFrames += 1
          samples += f(1)
          at += f(0)
        }
      }
    }
    if (nFrames == 0L) return null
    val durationMs = samples * 1000L / first(3)
    new GenericInternalRow(Array[Any](
      true, hasId3v2, if (hasId3v2) id3v2Bytes else null,
      UTF8String.fromString(first(4) match {
        case 0 => "1"
        case 1 => "2"
        case _ => "2.5"
      }),
      first(5).toLong, first(2).toLong, first(3).toLong,
      UTF8String.fromString(first(6) match {
        case 0 => "stereo"
        case 1 => "joint_stereo"
        case 2 => "dual_channel"
        case _ => "mono"
      }),
      nFrames, durationMs, hasId3v1, isVbr, consistent))
  }
}

/** Deterministic MP3 synthesis from a doc_id — the synthesis-side
  * inverse of [[Mp3MetaKernel]] (the `TiffSynthKernel` convention):
  * Layer III CBR frames with correct version×bitrate×sample-rate
  * frame lengths, rotating MPEG1/MPEG2, three bitrate and
  * sample-rate indexes, padding, channel mode, an ID3v2 prefix lane,
  * and an ID3v1 trailer lane — every parsed field recomputable
  * closed-form from doc_id.
  */
object Mp3SynthKernel {
  def synth(d: Long): Array[Byte] = {
    val mpeg1 = d % 2 == 0
    val srIdx = (d % 3).toInt
    val brIdx = (5 + d % 3).toInt
    val pad = if (d % 5 == 1) 1 else 0
    val mode = (d % 4).toInt
    val nFrames = (1 + d % 6).toInt
    val id3v2 = d % 4 == 1
    val id3v1 = d % 8 == 5
    val sr = if (mpeg1) Array(44100, 48000, 32000)(srIdx)
      else Array(22050, 24000, 16000)(srIdx)
    val br = if (mpeg1) Array(64, 80, 96)(brIdx - 5)
      else Array(40, 48, 56)(brIdx - 5)
    val frameLen = (if (mpeg1) 144 else 72) * br * 1000 / sr + pad
    val out = new java.io.ByteArrayOutputStream(256)
    if (id3v2) {
      val size = (20 + d % 30).toInt // syncsafe (< 128 so one byte)
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0) // v2.3.0, no flags
      out.write(0); out.write(0); out.write(0); out.write(size)
      var i = 0
      while (i < size) { out.write(0); i += 1 }
    }
    var f = 0
    while (f < nFrames) {
      out.write(0xFF)
      out.write(0xE0 | ((if (mpeg1) 3 else 2) << 3) | (1 << 1) | 1)
      out.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      out.write(mode << 6)
      var i = 4
      while (i < frameLen) { out.write(0); i += 1 }
      f += 1
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      var i = 3
      while (i < 128) { out.write(0); i += 1 }
    }
    out.toByteArray
  }
}

/** FLAC container triage — the TWELFTH family: the lossless sibling
  * of MP3 in any audio corpus. "fLaC" magic, then a metadata-block
  * chain (1-bit last flag, 7-bit type, 24-bit BE length): STREAMINFO
  * must come first (block sizes, then the packed 64 bits — 20-bit
  * sample rate, 3-bit channels−1, 5-bit bits/sample−1, 36-bit total
  * samples), VORBIS_COMMENT presence is the tag signal, and duration
  * is exact integer arithmetic. `consistent` = STREAMINFO first with
  * length 34 and every declared block in bounds. Never throws.
  */
object FlacMetaKernel {
  val MaxBlocks = 256

  /** Strict detection: the byte after the magic must declare
    * STREAMINFO as the first block ((hdr & 0x7F) == 0 — 0x00 or 0x80,
    * never a printable character), so ASCII text starting "fLaC"
    * cannot route here.
    */
  def isFlac(p: Array[Byte]): Boolean =
    p.length >= 8 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' &&
      p(3) == 'C' && (p(4) & 0x7F) == 0

  private def u16(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xFF) << 8) | (p(off + 1) & 0xFF)

  private def u24(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xFF) << 16) | ((p(off + 1) & 0xFF) << 8) | (p(off + 2) & 0xFF)

  /** Struct (flac_valid, sample_rate, channels, bits_per_sample,
    * total_samples, duration_ms, n_blocks, has_vorbis_comment,
    * min_block_size, max_block_size, consistent) or null.
    */
  def parse(p: Array[Byte]): InternalRow = {
    if (!isFlac(p)) return null
    var at = 4
    var nBlocks = 0L
    var hasVorbis = false
    var consistent = true
    var sr = -1L
    var ch = -1L
    var bps = -1L
    var total = -1L
    var minBlock = -1L
    var maxBlock = -1L
    var last = false
    while (!last && nBlocks < MaxBlocks) {
      if (at + 4 > p.length) { consistent = false; last = true }
      else {
        val hdr = p(at) & 0xFF
        last = (hdr & 0x80) != 0
        val typ = hdr & 0x7F
        val len = u24(p, at + 1)
        if (at + 4 + len > p.length) { consistent = false; last = true }
        else {
          if (nBlocks == 0L) {
            if (typ != 0 || len != 34) { consistent = false; last = true }
            else {
              val b = at + 4
              minBlock = u16(p, b).toLong
              maxBlock = u16(p, b + 2).toLong
              // 64 packed bits at b+10: sr(20) ch-1(3) bps-1(5) total(36)
              var bits = 0L
              var i = 0
              while (i < 8) { bits = (bits << 8) | (p(b + 10 + i) & 0xFFL); i += 1 }
              sr = bits >>> 44
              ch = ((bits >>> 41) & 0x7L) + 1
              bps = ((bits >>> 36) & 0x1FL) + 1
              total = bits & 0xFFFFFFFFFL
            }
          } else if (typ == 4) hasVorbis = true
          if (consistent || nBlocks > 0) {
            nBlocks += 1
            at += 4 + len
          }
        }
      }
    }
    if (!last) consistent = false // block-chain cap hit
    if (sr <= 0) return null // no readable STREAMINFO → not triagable
    val durationMs: Any = if (total >= 0) total * 1000L / sr else null
    new GenericInternalRow(Array[Any](
      true, sr, ch, bps, total, durationMs, nBlocks, hasVorbis,
      minBlock, maxBlock, consistent))
  }
}

/** Deterministic FLAC synthesis from a doc_id — STREAMINFO with
  * packed-bit fields, a VORBIS_COMMENT lane, a PADDING lane, every
  * field recomputable closed-form.
  */
object FlacSynthKernel {
  def synth(d: Long): Array[Byte] = {
    val sr = 8000L + (d % 5) * 4000L
    val ch = 1 + d % 2
    val bps = 8L * (1 + d % 3)
    val total = 1000L + d % 5000
    val vorbis = d % 3 == 1
    val padding = d % 4 == 2
    val out = new java.io.ByteArrayOutputStream(96)
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    def block(typ: Int, isLast: Boolean, body: Array[Byte]): Unit = {
      out.write((if (isLast) 0x80 else 0) | typ)
      out.write((body.length >> 16) & 0xFF)
      out.write((body.length >> 8) & 0xFF)
      out.write(body.length & 0xFF)
      out.write(body, 0, body.length)
    }
    val si = new Array[Byte](34)
    si(0) = 0x10; si(1) = 0 // min block 4096
    si(2) = 0x10; si(3) = 0 // max block 4096
    val bits = (sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    var i = 0
    while (i < 8) { si(10 + i) = ((bits >>> (56 - 8 * i)) & 0xFF).toByte; i += 1 }
    block(0, isLast = !vorbis && !padding, si)
    if (vorbis) block(4, isLast = !padding, new Array[Byte]((8 + d % 16).toInt))
    if (padding) block(1, isLast = true, new Array[Byte]((4 + d % 8).toInt))
    // a few audio-frame filler bytes after the chain
    out.write(0xFF); out.write(0xF8); out.write(0); out.write(0)
    out.toByteArray
  }
}

/** `mp3_meta(payload) → struct<...13 fields>`; see
  * [[Mp3MetaKernel.parse]].
  */
case class Mp3Meta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("mp3_valid", BooleanType),
    StructField("has_id3v2", BooleanType),
    StructField("id3v2_bytes", LongType),
    StructField("mpeg_version", StringType),
    StructField("layer", LongType),
    StructField("bitrate_kbps", LongType),
    StructField("sample_rate", LongType),
    StructField("channel_mode", StringType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType),
    StructField("has_id3v1", BooleanType),
    StructField("is_vbr", BooleanType),
    StructField("consistent", BooleanType)))
  override def nullable: Boolean = true
  override def prettyName: String = "mp3_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    Mp3MetaKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.Mp3MetaKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `mp3_synth(doc_id) → binary`; see [[Mp3SynthKernel.synth]]. */
case class Mp3Synth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "mp3_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    Mp3SynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.Mp3SynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `flac_meta(payload) → struct<...11 fields>`; see
  * [[FlacMetaKernel.parse]].
  */
case class FlacMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("flac_valid", BooleanType),
    StructField("sample_rate", LongType),
    StructField("channels", LongType),
    StructField("bits_per_sample", LongType),
    StructField("total_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("n_blocks", LongType),
    StructField("has_vorbis_comment", BooleanType),
    StructField("min_block_size", LongType),
    StructField("max_block_size", LongType),
    StructField("consistent", BooleanType)))
  override def nullable: Boolean = true
  override def prettyName: String = "flac_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    FlacMetaKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.FlacMetaKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `flac_synth(doc_id) → binary`; see [[FlacSynthKernel.synth]]. */
case class FlacSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "flac_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    FlacSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.FlacSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
