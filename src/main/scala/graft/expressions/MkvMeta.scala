package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Matroska / WebM container triage — the FOURTEENTH family: the
  * dominant open web-video container (every `<video>` WebM, plus
  * `.mkv` uploads). The format is EBML — self-describing
  * variable-width tag/length/value elements — so triage IS a varint
  * walk: the EBML header (DocType "webm"/"matroska", DocTypeVersion),
  * then the Segment's children — Info (TimecodeScale, the FLOAT
  * Duration in timecode ticks), Tracks (per-TrackEntry type, CodecID,
  * video PixelWidth/PixelHeight, audio SamplingFrequency/Channels),
  * and Cluster counting (the payload bulk a 100 TB corpus actually
  * carries — counted, never materialized).
  *
  * EBML rules honored: element IDs keep their length-marker bit
  * (1-4 bytes), sizes strip it (1-8 bytes), an all-ones size means
  * "unknown — extends to the parent's end" and is legal ONLY on the
  * Segment (the streaming-mux convention); anywhere else it makes the
  * file inconsistent because a skip is impossible. `consistent` =
  * every varint well-formed, every element in bounds, floats 4 or 8
  * bytes, the top-level walk lands exactly on end-of-payload, and no
  * walk cap was hit. Never throws; every loop advances ≥2 bytes per
  * element, so the walk is linear by construction.
  *
  * First video and first audio TrackEntry win (multi-track files keep
  * their counts in `n_tracks`). Duration is rounded to exact integer
  * milliseconds via `duration · timecodeScale / 10⁶`.
  */
object MkvMetaKernel {
  val MaxElements = 1 << 16

  /** Strict detection: the 4-byte EBML magic — 0x1A is a control
    * byte, never printable, so text cannot route here.
    */
  def isMkv(p: Array[Byte]): Boolean =
    p.length >= 4 && p(0) == 0x1A && p(1) == 0x45 &&
      (p(2) & 0xFF) == 0xDF && (p(3) & 0xFF) == 0xA3

  /** Element ID at `at`: (width << 32) | id with the marker bit kept
    * (the 0xAE / 0x4282 / 0x1A45DFA3 notation), or -1.
    */
  private def idAt(p: Array[Byte], at: Int): Long = {
    if (at >= p.length) return -1L
    val b0 = p(at) & 0xFF
    val w = if ((b0 & 0x80) != 0) 1 else if ((b0 & 0x40) != 0) 2
      else if ((b0 & 0x20) != 0) 3 else if ((b0 & 0x10) != 0) 4 else -1
    if (w < 0 || at + w > p.length) return -1L
    var v = 0L
    var i = 0
    while (i < w) { v = (v << 8) | (p(at + i) & 0xFFL); i += 1 }
    (w.toLong << 32) | v
  }

  /** Size varint at `at`: (width << 56) | value with the marker
    * stripped, or -1. All-ones value = unknown size (caller checks
    * against `(1 << 7·width) − 1`).
    */
  private def sizeAt(p: Array[Byte], at: Int): Long = {
    if (at >= p.length) return -1L
    val b0 = p(at) & 0xFF
    var w = 1
    var mask = 0x80
    while (mask != 0 && (b0 & mask) == 0) { w += 1; mask >>= 1 }
    if (mask == 0 || w > 8 || at + w > p.length) return -1L
    var v = (b0 & (mask - 1)).toLong
    var i = 1
    while (i < w) { v = (v << 8) | (p(at + i) & 0xFFL); i += 1 }
    (w.toLong << 56) | v
  }

  private def uintAt(p: Array[Byte], at: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len && i < 8) { v = (v << 8) | (p(at + i) & 0xFFL); i += 1 }
    v
  }

  private def floatAt(p: Array[Byte], at: Int, len: Int): Double =
    if (len == 4) java.lang.Float.intBitsToFloat(uintAt(p, at, 4).toInt).toDouble
    else java.lang.Double.longBitsToDouble(uintAt(p, at, 8))

  private def strAt(p: Array[Byte], at: Int, len: Int): String = {
    val sb = new java.lang.StringBuilder(len)
    var i = 0
    // Matroska strings are ASCII/UTF-8; codec IDs and doctypes are
    // pure ASCII — truncate at a NUL pad if one appears
    var done = false
    while (i < len && !done) {
      val c = p(at + i) & 0xFF
      if (c == 0) done = true else sb.append(c.toChar)
      i += 1
    }
    sb.toString
  }

  /** Struct (mkv_valid, doctype, doctype_version, timecode_scale,
    * duration_ms, n_tracks, video_codec, pixel_width, pixel_height,
    * audio_codec, audio_channels, audio_sample_rate, n_clusters,
    * consistent) or null for non-EBML bytes / an unwalkable header.
    */
  def parse(p: Array[Byte]): InternalRow = {
    if (!isMkv(p)) return null
    var consistent = true
    var elems = 0
    def bust(): Unit = consistent = false

    var docType: String = null
    var docTypeVersion = -1L
    var timecodeScale = 1000000L // EBML default
    var durationTicks = Double.NaN
    var nTracks = 0L
    var videoCodec: String = null
    var pixelW = -1L
    var pixelH = -1L
    var audioCodec: String = null
    var audioCh = -1L
    var audioRate = Double.NaN
    var nClusters = 0L

    // one in-bounds child step: returns the packed (valueOff, valueLen,
    // nextAt) via the shared arrays — avoiding per-element allocation
    // (this kernel runs once per payload on the 100 TB scan path)
    val off = new Array[Int](3)
    def step(at: Int, end: Int, allowUnknown: Boolean): Boolean = {
      if (elems >= MaxElements) { bust(); return false }
      elems += 1
      val id = idAt(p, at)
      if (id < 0) { bust(); return false }
      val idW = (id >>> 32).toInt
      val sz = sizeAt(p, at + idW)
      if (sz < 0) { bust(); return false }
      val szW = (sz >>> 56).toInt
      val szV = sz & 0x00FFFFFFFFFFFFFFL
      val unknown = szV == (1L << (7 * szW)) - 1
      val valueOff = at + idW + szW
      if (unknown) {
        if (!allowUnknown) { bust(); return false }
        off(0) = valueOff; off(1) = end - valueOff; off(2) = end
      } else {
        if (valueOff + szV > end) { bust(); return false }
        off(0) = valueOff; off(1) = szV.toInt; off(2) = (valueOff + szV).toInt
      }
      true
    }
    def idOf(at: Int): Long = idAt(p, at) & 0xFFFFFFFFL

    def parseVideo(from: Int, to: Int): Unit = {
      var at = from
      while (at < to && consistent) {
        val id = idOf(at)
        if (!step(at, to, allowUnknown = false)) return
        id match {
          case 0xB0L => if (pixelW < 0) pixelW = uintAt(p, off(0), off(1))
          case 0xBAL => if (pixelH < 0) pixelH = uintAt(p, off(0), off(1))
          case _ =>
        }
        at = off(2)
      }
    }
    def parseAudio(from: Int, to: Int): Unit = {
      var at = from
      while (at < to && consistent) {
        val id = idOf(at)
        if (!step(at, to, allowUnknown = false)) return
        id match {
          case 0xB5L =>
            if (off(1) != 4 && off(1) != 8) bust()
            else if (audioRate.isNaN) audioRate = floatAt(p, off(0), off(1))
          case 0x9FL => if (audioCh < 0) audioCh = uintAt(p, off(0), off(1))
          case _ =>
        }
        at = off(2)
      }
    }
    def parseTrackEntry(from: Int, to: Int): Unit = {
      var trackType = -1L
      var codec: String = null
      var vFrom = -1
      var vTo = -1
      var aFrom = -1
      var aTo = -1
      var at = from
      while (at < to && consistent) {
        val id = idOf(at)
        if (!step(at, to, allowUnknown = false)) return
        id match {
          case 0x83L => trackType = uintAt(p, off(0), off(1))
          case 0x86L => codec = strAt(p, off(0), off(1))
          case 0xE0L => vFrom = off(0); vTo = off(0) + off(1)
          case 0xE1L => aFrom = off(0); aTo = off(0) + off(1)
          case _ =>
        }
        at = off(2)
      }
      if (!consistent) return
      nTracks += 1
      if (trackType == 1 && videoCodec == null) {
        videoCodec = codec
        if (vFrom >= 0) parseVideo(vFrom, vTo)
      } else if (trackType == 2 && audioCodec == null) {
        audioCodec = codec
        if (aFrom >= 0) parseAudio(aFrom, aTo)
      }
    }
    def parseTracks(from: Int, to: Int): Unit = {
      var at = from
      while (at < to && consistent) {
        val id = idOf(at)
        if (!step(at, to, allowUnknown = false)) return
        if (id == 0xAE) parseTrackEntry(off(0), off(0) + off(1))
        at = off(2)
      }
    }
    def parseInfo(from: Int, to: Int): Unit = {
      var at = from
      while (at < to && consistent) {
        val id = idOf(at)
        if (!step(at, to, allowUnknown = false)) return
        id match {
          case 0x2AD7B1L => timecodeScale = uintAt(p, off(0), off(1))
          case 0x4489L =>
            if (off(1) != 4 && off(1) != 8) bust()
            else durationTicks = floatAt(p, off(0), off(1))
          case _ =>
        }
        at = off(2)
      }
    }
    def parseSegment(from: Int, to: Int): Unit = {
      var at = from
      while (at < to && consistent) {
        val id = idOf(at)
        if (!step(at, to, allowUnknown = false)) return
        id match {
          case 0x1549A966L => parseInfo(off(0), off(0) + off(1))
          case 0x1654AE6BL => parseTracks(off(0), off(0) + off(1))
          case 0x1F43B675L => nClusters += 1
          case _ =>
        }
        at = off(2)
      }
    }
    def parseEbmlHeader(from: Int, to: Int): Unit = {
      var at = from
      while (at < to && consistent) {
        val id = idOf(at)
        if (!step(at, to, allowUnknown = false)) return
        id match {
          case 0x4282L => docType = strAt(p, off(0), off(1))
          case 0x4287L => docTypeVersion = uintAt(p, off(0), off(1))
          case _ =>
        }
        at = off(2)
      }
    }

    // top level: the EBML header element, then Segment(s); only the
    // Segment may carry an unknown size (extends to end-of-payload)
    if (idOf(0) != 0x1A45DFA3L) return null
    if (!step(0, p.length, allowUnknown = false)) return null
    parseEbmlHeader(off(0), off(0) + off(1))
    var at = off(2)
    var sawSegment = false
    while (at < p.length && consistent) {
      val id = idOf(at)
      if (step(at, p.length, allowUnknown = id == 0x18538067L)) {
        if (id == 0x18538067L) { sawSegment = true; parseSegment(off(0), off(0) + off(1)) }
        at = off(2)
      } else at = p.length
    }
    if (!sawSegment) bust()
    if (docType == null) return null // unreadable header → not triagable
    val durationMs: Any =
      if (durationTicks.isNaN || timecodeScale <= 0) null
      else math.round(durationTicks * timecodeScale / 1e6)
    new GenericInternalRow(Array[Any](
      true, UTF8String.fromString(docType),
      if (docTypeVersion >= 0) docTypeVersion else null,
      timecodeScale, durationMs, nTracks,
      if (videoCodec != null) UTF8String.fromString(videoCodec) else null,
      if (pixelW >= 0) pixelW else null,
      if (pixelH >= 0) pixelH else null,
      if (audioCodec != null) UTF8String.fromString(audioCodec) else null,
      if (audioCh >= 0) audioCh else null,
      if (!audioRate.isNaN) math.round(audioRate) else null,
      nClusters, consistent))
  }
}

/** Deterministic Matroska/WebM synthesis from a doc_id — real EBML
  * with rotating doctype, versions, VP8/VP9/AV1 video codecs and
  * dims, an audio-track lane (Opus/Vorbis, float32 vs float64
  * duration widths), cluster counts, and skip-path elements the
  * kernel must step over — every parsed field recomputable
  * closed-form from doc_id.
  */
object MkvSynthKernel {
  def synth(d: Long): Array[Byte] = {
    val webm = d % 2 == 0
    val dtVer = 2 + d % 3
    val durMs = 10000L + d % 5000
    val f32 = d % 4 == 1
    val vCodec = Array("V_VP8", "V_VP9", "V_AV1").apply((d % 3).toInt)
    val w = 320L + 16 * (d % 20)
    val h = 240L + 16 * (d % 15)
    val hasAudio = d % 2 == 1
    val aCodec = if (d % 4 == 1) "A_VORBIS" else "A_OPUS"
    val aRate = if (d % 4 == 1) 44100.0 else 48000.0
    val aCh = 1 + (d % 5) % 2
    val nClusters = (d % 3).toInt

    def el(id: Long, idW: Int, body: Array[Byte]): Array[Byte] = {
      val szW = if (body.length < 127) 1 else 2
      val out = new Array[Byte](idW + szW + body.length)
      var i = 0
      while (i < idW) { out(i) = ((id >>> (8 * (idW - 1 - i))) & 0xFF).toByte; i += 1 }
      if (szW == 1) out(idW) = (0x80 | body.length).toByte
      else {
        out(idW) = (0x40 | (body.length >> 8)).toByte
        out(idW + 1) = (body.length & 0xFF).toByte
      }
      System.arraycopy(body, 0, out, idW + szW, body.length)
      out
    }
    def uint(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >>> (8 * n)) != 0) n += 1
      val b = new Array[Byte](n)
      var i = 0
      while (i < n) { b(i) = ((v >>> (8 * (n - 1 - i))) & 0xFF).toByte; i += 1 }
      b
    }
    def f64(v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      val b = new Array[Byte](8)
      var i = 0
      while (i < 8) { b(i) = ((bits >>> (8 * (7 - i))) & 0xFF).toByte; i += 1 }
      b
    }
    def flt(v: Double): Array[Byte] =
      if (f32) {
        val bits = java.lang.Float.floatToIntBits(v.toFloat)
        val b = new Array[Byte](4)
        var i = 0
        while (i < 4) { b(i) = ((bits >>> (8 * (3 - i))) & 0xFF).toByte; i += 1 }
        b
      } else f64(v)
    def cat(xs: Array[Byte]*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(256)
      xs.foreach(x => out.write(x, 0, x.length))
      out.toByteArray
    }

    val header = el(0x1A45DFA3L, 4, cat(
      el(0x4286, 2, uint(1)), // EBMLVersion — a skip-path element
      el(0x4282, 2, (if (webm) "webm" else "matroska").getBytes("US-ASCII")),
      el(0x4287, 2, uint(dtVer))))
    val info = el(0x1549A966L, 4, cat(
      el(0x2AD7B1L, 3, uint(1000000L)),
      el(0x4489, 2, flt(durMs.toDouble))))
    val videoTrack = el(0xAE, 1, cat(
      el(0xD7, 1, uint(1)),
      el(0x83, 1, uint(1)),
      el(0x86, 1, vCodec.getBytes("US-ASCII")),
      el(0xE0, 1, cat(el(0xB0, 1, uint(w)), el(0xBA, 1, uint(h))))))
    val audioTrack = if (!hasAudio) Array.emptyByteArray else
      el(0xAE, 1, cat(
        el(0xD7, 1, uint(2)),
        el(0x83, 1, uint(2)),
        el(0x86, 1, aCodec.getBytes("US-ASCII")),
        el(0xE1, 1, cat(el(0xB5, 1, f64(aRate)), el(0x9F, 1, uint(aCh))))))
    val tracks = el(0x1654AE6BL, 4, cat(videoTrack, audioTrack))
    val clusters = (0 until nClusters).map { k =>
      el(0x1F43B675L, 4, cat(
        el(0xE7, 1, uint(k * 1000L)),
        el(0xA3, 1, Array.fill(8 + (d % 9).toInt)(((d * 17 + k * 31) & 0xFF).toByte))))
    }
    val segment = el(0x18538067L, 4, cat((Seq(info, tracks) ++ clusters): _*))
    cat(header, segment)
  }
}

/** `mkv_meta(payload) → struct<...14 fields>`; see
  * [[MkvMetaKernel.parse]].
  */
case class MkvMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("mkv_valid", BooleanType),
    StructField("doctype", StringType),
    StructField("doctype_version", LongType),
    StructField("timecode_scale", LongType),
    StructField("duration_ms", LongType),
    StructField("n_tracks", LongType),
    StructField("video_codec", StringType),
    StructField("pixel_width", LongType),
    StructField("pixel_height", LongType),
    StructField("audio_codec", StringType),
    StructField("audio_channels", LongType),
    StructField("audio_sample_rate", LongType),
    StructField("n_clusters", LongType),
    StructField("consistent", BooleanType)))
  override def nullable: Boolean = true
  override def prettyName: String = "mkv_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    MkvMetaKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.MkvMetaKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `mkv_synth(doc_id) → binary`; see [[MkvSynthKernel.synth]]. */
case class MkvSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "mkv_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    MkvSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.MkvSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
