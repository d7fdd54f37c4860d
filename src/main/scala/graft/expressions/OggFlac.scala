package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Ogg-FLAC SAMPLE tier — the decode layer behind the
  * [[OggMetaKernel]] triage row for the one Ogg codec this engine can
  * decode bit-exactly: the Ogg-FLAC mapping (mapping spec v1.0)
  * wraps a bare FLAC stream — a 9-byte mapping header + fLaC +
  * STREAMINFO as the first packet, `nHeaders` further metadata
  * packets, then ONE FLAC FRAME PER PACKET. So the sample tier is
  * container unwrapping composed with the engine's existing
  * [[FlacAudioKernel]] frame decode: walk the pages (verifying every
  * page CRC — OGG's unreflected 0x04C11DB7), reassemble packets
  * across page boundaries (lacing 255 spills, continuation flags),
  * strip the mapping prefix, skip the declared header packets, and
  * feed the reconstituted bare-FLAC bytes to the rice/LPC decoder.
  *
  * Vorbis and Opus sample decode stay OUT of scope by the MP3
  * argument: both are float-valued MDCT codecs whose spec tolerates
  * per-implementation drift, so no closed-form bit-exact oracle can
  * pin them; Ogg-FLAC is integer-exact end to end.
  *
  * Reference behavior: lshrs treats audio payloads as opaque blobs
  * (`io/parquet.py`); the sample tier is part of the
  * beyond-reference multimodal layer. Never throws; bounded
  * (MaxPages, and the frame decode's own frame/sample caps).
  */
object OggFlacKernel {
  /** One page walk collecting reassembled packets. */
  private final class Walk {
    var nPages = 0L
    var crcOk = true
    var consistent = true
    val packets = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
  }

  /** Page walk + packet reassembly — [[OggMetaKernel.parse]]'s
    * structural rules (serial / sequence / BOS / EOS / continuation
    * agreement) with the packet BYTES kept. Returns null for
    * non-Ogg bytes or a zero-page stream.
    */
  private def walk(p: Array[Byte]): Walk = {
    if (!OggMetaKernel.isOgg(p)) return null
    val w = new Walk
    var at = 0
    var serial = 0L
    var sawEos = false
    var open = false
    val cur = new java.io.ByteArrayOutputStream(512)
    while (at < p.length && w.nPages < OggMetaKernel.MaxPages) {
      if (at + 27 > p.length || p(at) != 'O' || p(at + 1) != 'g' ||
          p(at + 2) != 'g' || p(at + 3) != 'S') {
        w.consistent = false
        at = p.length
      } else {
        if (p(at + 4) != 0) w.consistent = false
        val hdrType = p(at + 5) & 0xFF
        var ser = 0L
        var i = 0
        while (i < 4) { ser |= (p(at + 14 + i) & 0xFFL) << (8 * i); i += 1 }
        var seq = 0L
        i = 0
        while (i < 4) { seq |= (p(at + 18 + i) & 0xFFL) << (8 * i); i += 1 }
        var storedCrc = 0L
        i = 0
        while (i < 4) { storedCrc |= (p(at + 22 + i) & 0xFFL) << (8 * i); i += 1 }
        val nSegs = p(at + 26) & 0xFF
        if (at + 27 + nSegs > p.length) { w.consistent = false; at = p.length }
        else {
          var body = 0
          i = 0
          while (i < nSegs) { body += p(at + 27 + i) & 0xFF; i += 1 }
          val pageLen = 27 + nSegs + body
          if (at + pageLen > p.length) { w.consistent = false; at = p.length }
          else {
            if (w.nPages == 0L) {
              serial = ser
              if ((hdrType & 2) == 0) w.consistent = false
              if ((hdrType & 1) != 0) w.consistent = false
            } else {
              if ((hdrType & 2) != 0) w.consistent = false
              if (ser != serial) w.consistent = false
              if (((hdrType & 1) != 0) != open) w.consistent = false
            }
            if (seq != w.nPages) w.consistent = false
            if (sawEos) w.consistent = false
            if ((OggMetaKernel.pageCrc(p, at, pageLen, at + 22) & 0xFFFFFFFFL)
                != storedCrc)
              w.crcOk = false
            if ((hdrType & 4) != 0) sawEos = true
            // reassemble: append each lacing run; a value < 255
            // completes the packet
            var bodyAt = at + 27 + nSegs
            var lastLacing = -1
            i = 0
            while (i < nSegs) {
              val l = p(at + 27 + i) & 0xFF
              cur.write(p, bodyAt, l)
              bodyAt += l
              if (l < 255) { w.packets += cur.toByteArray; cur.reset() }
              lastLacing = l
              i += 1
            }
            open = nSegs > 0 && lastLacing == 255
            w.nPages += 1
            at += pageLen
          }
        }
      }
    }
    if (w.nPages == 0L) return null
    if (!sawEos || open || w.nPages >= OggMetaKernel.MaxPages)
      w.consistent = false
    w
  }

  private def isFlacMapping(f: Array[Byte]): Boolean =
    f != null && f.length >= 51 && (f(0) & 0xFF) == 0x7F && f(1) == 'F' &&
      f(2) == 'L' && f(3) == 'A' && f(4) == 'C' && f(9) == 'f' &&
      f(10) == 'L' && f(11) == 'a' && f(12) == 'C'

  /** Reconstitute the bare FLAC stream: first packet minus the 9-byte
    * mapping prefix, skip the declared header packets, concatenate
    * the frame packets. Null when the stream is not Ogg-FLAC.
    */
  private def reassemble(w: Walk): Array[Byte] = {
    if (w.packets.isEmpty) return null
    val f0 = w.packets(0)
    if (!isFlacMapping(f0)) return null
    val nHeaders = ((f0(7) & 0xFF) << 8) | (f0(8) & 0xFF)
    val out = new java.io.ByteArrayOutputStream(1024)
    out.write(f0, 9, f0.length - 9)
    var i = 1 + nHeaders
    while (i < w.packets.length) {
      val pk = w.packets(i)
      out.write(pk, 0, pk.length)
      i += 1
    }
    out.toByteArray
  }

  /** Struct (oggflac_valid, n_pages, pages_crc_ok, decode_ok,
    * channels, bits_per_sample, n_frames, n_samples, sample_sum,
    * sample_sum_sq, peak_abs, frame_crc_ok, matches_streaminfo) or
    * null for non-Ogg / non-FLAC-mapped bytes (those are the triage
    * row's job, not the sample tier's).
    */
  def stats(p: Array[Byte]): InternalRow = {
    val w = walk(p)
    if (w == null) return null
    val bare = reassemble(w)
    if (bare == null) return null
    if (!w.consistent)
      return new GenericInternalRow(Array[Any](
        false, w.nPages, w.crcOk, false, null, null, null, null, null,
        null, null, null, null))
    val st = FlacAudioKernel.stats(bare)
    if (st == null)
      return new GenericInternalRow(Array[Any](
        false, w.nPages, w.crcOk, false, null, null, null, null, null,
        null, null, null, null))
    // FlacAudioStats layout: (flac_valid, decode_ok, channels,
    // bits_per_sample, n_frames, n_samples, sample_sum,
    // sample_sum_sq, peak_abs, crc_ok, matches_streaminfo)
    def l(i: Int): Any = if (st.isNullAt(i)) null else st.getLong(i)
    def b(i: Int): Any = if (st.isNullAt(i)) null else st.getBoolean(i)
    new GenericInternalRow(Array[Any](
      true, w.nPages, w.crcOk, st.getBoolean(1),
      l(2), l(3), l(4), l(5), l(6), l(7), l(8), b(9), b(10)))
  }

  /** The perceptual audio fingerprint over the DECODED Ogg-wrapped
    * FLAC stream — [[FlacAudioKernel.ahash]] after container
    * unwrapping, so an Ogg-FLAC re-mux of the same samples collides
    * with its WAV and bare-FLAC siblings in `audioDedup`. Null for
    * non-Ogg-FLAC or structurally damaged streams.
    */
  def ahash(p: Array[Byte]): java.lang.Long = {
    val w = walk(p)
    if (w == null || !w.consistent) return null
    val bare = reassemble(w)
    if (bare == null) return null
    FlacAudioKernel.ahash(bare)
  }
}

/** Deterministic Ogg-FLAC synthesis from a doc_id — REAL CRC'd pages
  * wrapping [[FlacAudioSynthKernel]]'s real FLAC frames (one frame
  * per packet, the mapping's convention), so the decoded samples
  * keep the bare-FLAC synth's closed forms and the oracle re-derives
  * every stat from doc_id arithmetic while Spark reassembles and
  * decodes actual bits. Lanes on top of the FLAC synth's own
  * (verbatim/fixed/LPC/rice2 coding, stereo decorrelation, the
  * d%20==5 flipped frame CRC): frames-per-page rotates 1↔2
  * (d%2), the d%5==4 docs split the comment packet across TWO pages
  * (lacing-255 spill + continuation flag — the cross-page
  * reassembly path), and d%20==7 ships a flipped final PAGE CRC
  * (samples decode, `pages_crc_ok` false).
  */
object OggFlacSynthKernel {
  private val Serial = 0x464C4143L // deterministic

  private final class PageOut {
    val out = new java.io.ByteArrayOutputStream(2048)
    var seq = 0L

    def page(hdrType: Int, granule: Long, lacings: Array[Int],
        body: Array[Byte]): Unit = {
      val pg = new Array[Byte](27 + lacings.length + body.length)
      pg(0) = 'O'; pg(1) = 'g'; pg(2) = 'g'; pg(3) = 'S'
      pg(4) = 0
      pg(5) = hdrType.toByte
      var k = 0
      while (k < 8) { pg(6 + k) = ((granule >>> (8 * k)) & 0xFF).toByte; k += 1 }
      k = 0
      while (k < 4) { pg(14 + k) = ((Serial >>> (8 * k)) & 0xFF).toByte; k += 1 }
      k = 0
      while (k < 4) { pg(18 + k) = ((seq >>> (8 * k)) & 0xFF).toByte; k += 1 }
      pg(26) = lacings.length.toByte
      var i = 0
      while (i < lacings.length) { pg(27 + i) = lacings(i).toByte; i += 1 }
      System.arraycopy(body, 0, pg, 27 + lacings.length, body.length)
      val crc = OggMetaKernel.pageCrc(pg, 0, pg.length, 22)
      k = 0
      while (k < 4) { pg(22 + k) = ((crc >>> (8 * k)) & 0xFF).toByte; k += 1 }
      out.write(pg, 0, pg.length)
      seq += 1
    }

    /** Lacing run for whole packets placed on one page. */
    def wholePage(hdrType: Int, granule: Long,
        packets: Array[Array[Byte]]): Unit = {
      val lac = new scala.collection.mutable.ArrayBuffer[Int]()
      val body = new java.io.ByteArrayOutputStream(512)
      var i = 0
      while (i < packets.length) {
        var rem = packets(i).length
        while (rem >= 255) { lac += 255; rem -= 255 }
        lac += rem
        body.write(packets(i), 0, packets(i).length)
        i += 1
      }
      page(hdrType, granule, lac.toArray, body.toByteArray)
    }
  }

  private def wrap(header: Array[Byte], frames: Array[Array[Byte]],
      nPerChannel: Long, framesPerPage: Int, splitComment: Boolean,
      commentLen: Int, seedByte: Long, breakPageCrc: Boolean): Array[Byte] = {
    val po = new PageOut
    // first packet: 9-byte mapping header (v1.0, ONE further header
    // packet) + the bare fLaC+STREAMINFO bytes
    val p0 = new Array[Byte](9 + header.length)
    p0(0) = 0x7F.toByte; p0(1) = 'F'; p0(2) = 'L'; p0(3) = 'A'; p0(4) = 'C'
    p0(5) = 1; p0(6) = 0 // mapping version 1.0
    p0(7) = 0; p0(8) = 1 // one header packet follows
    System.arraycopy(header, 0, p0, 9, header.length)
    po.wholePage(2, 0L, Array(p0)) // BOS
    // the declared header packet: a VORBIS_COMMENT metadata block —
    // content opaque to the sample tier (it is skipped, not parsed)
    val comment = new Array[Byte](commentLen)
    comment(0) = 0x84.toByte // last-flag + type 4
    var i = 1
    while (i < commentLen) {
      comment(i) = ((seedByte * 31 + i * 7) & 0xFF).toByte
      i += 1
    }
    if (splitComment && commentLen > 255) {
      // cross-page packet: first page carries a bare lacing-255 run
      // (packet open), the continuation page closes it
      po.page(0, 0L, Array(255), java.util.Arrays.copyOfRange(comment, 0, 255))
      po.page(1, 0L, Array(commentLen - 255),
        java.util.Arrays.copyOfRange(comment, 255, commentLen))
    } else {
      po.wholePage(0, 0L, Array(comment))
    }
    // audio packets: one FLAC frame per packet, framesPerPage per
    // page; granule = samples per channel completed through the page
    var f = 0
    while (f < frames.length) {
      val upto = math.min(f + framesPerPage, frames.length)
      val group = frames.slice(f, upto)
      val last = upto == frames.length
      val granule = if (last) nPerChannel else math.min(64L * upto, nPerChannel)
      po.wholePage(if (last) 4 else 0, granule, group)
      f = upto
    }
    val bytes = po.out.toByteArray
    if (breakPageCrc) {
      // flip the LAST page's stored CRC: structure intact, integrity
      // verdict false (the OggSynthKernel lane's convention)
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

  def synth(d: Long): Array[Byte] = {
    val (header, frames) = FlacAudioSynthKernel.synthParts(d)
    val n = 96L + (d % 5) * 32L
    val framesPerPage = (1 + d % 2).toInt
    val splitComment = d % 5 == 4
    val commentLen = if (splitComment) 400 else (24 + d % 16).toInt
    wrap(header, frames, n, framesPerPage, splitComment, commentLen,
      seedByte = d, breakPageCrc = d % 20 == 7)
  }

  /** Ogg-FLAC re-mux of the SAME planted 65-window stream the WAV and
    * bare-FLAC windowed synths carry — the third codec member for the
    * perceptual audio-dedup gate (identical decoded samples, a
    * container AND a codec away from the WAV original).
    */
  def synthWindowed(key: Long, m: Int): Array[Byte] = {
    val (header, frames) = FlacAudioSynthKernel.synthWindowedParts(key, m)
    val n = FlacAudioKernel.Windows.toLong * m
    wrap(header, frames, n, framesPerPage = 2, splitComment = false,
      commentLen = 32, seedByte = key, breakPageCrc = false)
  }
}

/** `ogg_flac_stats(payload) → struct<...13 fields>`; see
  * [[OggFlacKernel.stats]].
  */
case class OggFlacStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("oggflac_valid", BooleanType),
    StructField("n_pages", LongType),
    StructField("pages_crc_ok", BooleanType),
    StructField("decode_ok", BooleanType),
    StructField("channels", LongType),
    StructField("bits_per_sample", LongType),
    StructField("n_frames", LongType),
    StructField("n_samples", LongType),
    StructField("sample_sum", LongType),
    StructField("sample_sum_sq", LongType),
    StructField("peak_abs", LongType),
    StructField("frame_crc_ok", BooleanType),
    StructField("matches_streaminfo", BooleanType)))
  override def nullable: Boolean = true
  override def prettyName: String = "ogg_flac_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    OggFlacKernel.stats(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.OggFlacKernel.stats($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `ogg_flac_dhash(payload) → bigint` — the perceptual audio
  * fingerprint over a DECODED Ogg-wrapped FLAC stream; see
  * [[OggFlacKernel.ahash]].
  */
case class OggFlacDhash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ogg_flac_dhash"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any = {
    val v = OggFlacKernel.ahash(d.asInstanceOf[Array[Byte]])
    if (v == null) null else v.longValue()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |java.lang.Long gofh = graft.expressions.OggFlacKernel.ahash($d);
      |if (gofh == null) { ${ev.isNull} = true; } else { ${ev.value} = gofh.longValue(); }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `ogg_flac_synth(doc_id) → binary`; see [[OggFlacSynthKernel.synth]]. */
case class OggFlacSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "ogg_flac_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    OggFlacSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.OggFlacSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `ogg_flac_windowed_synth(key) → binary`; see
  * [[OggFlacSynthKernel.synthWindowed]] (m = 4, the WAV windowed
  * synth's default).
  */
case class OggFlacWindowedSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "ogg_flac_windowed_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    OggFlacSynthKernel.synthWindowed(d.asInstanceOf[Long], 4)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.OggFlacSynthKernel.synthWindowed($d, 4);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
