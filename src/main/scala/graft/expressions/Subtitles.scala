package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SRT / WebVTT subtitle parse — the transcript side of a
  * speech/video corpus: every captioned video ships its text as
  * SubRip (`.srt`: integer index line, `HH:MM:SS,mmm --> …` timing,
  * text lines, blank-line blocks) or WebVTT (`.vtt`: `WEBVTT`
  * header, optional cue-identifier lines, dot-millisecond timings
  * with OPTIONAL hours, cue settings after the end stamp, NOTE /
  * STYLE / REGION blocks), and transcript ingest — alignment,
  * dedup, speech-rate stats, subtitle-to-audio pairing — needs the
  * cue grain first. One row per cue: start/end milliseconds and the
  * payload text with inline markup (`<v Speaker>`, `<i>`, `<c.cls>`)
  * stripped and the three VTT-mandated character entities
  * (`&lt; &gt; &amp;` — in that replace order, mirrored by the
  * oracle) decoded.
  *
  * Malformed timing lines skip their block (never a guessed cue);
  * non-subtitle text is null. Bounded (cue/line caps); never
  * throws. Reference scope: lshrs has no subtitle surface —
  * beyond-reference, standard speech-pipeline kit.
  */
object SubtitleCuesKernel {
  val MaxCues = 4096

  /** `HH:MM:SS.mmm` / `MM:SS.mmm` (VTT) / `HH:MM:SS,mmm` (SRT) →
    * milliseconds, or -1.
    */
  private[expressions] def timestampMs(s0: String): Long = {
    val s = s0.trim
    val parts = s.split(":", -1)
    if (parts.length < 2 || parts.length > 3) return -1L
    val sec = parts(parts.length - 1)
    val dot = {
      val i = sec.indexOf('.')
      if (i >= 0) i else sec.indexOf(',')
    }
    if (dot != 2 || sec.length != 6) return -1L
    var i = 0
    while (i < parts.length - 1) {
      val p = parts(i)
      if (p.isEmpty || p.length > 5 || !p.forall(_.isDigit)) return -1L
      i += 1
    }
    val ss = sec.substring(0, 2)
    val mmm = sec.substring(3)
    if (!ss.forall(_.isDigit) || !mmm.forall(_.isDigit)) return -1L
    val hours = if (parts.length == 3) parts(0).toLong else 0L
    val minutes = parts(parts.length - 2).toLong
    hours * 3600000L + minutes * 60000L + ss.toLong * 1000L + mmm.toLong
  }

  /** Strip inline tags, then decode the VTT-mandated entities —
    * EXACTLY the oracle's regexp_replace + replace chain.
    */
  private def cleanText(raw: String): String =
    raw.replaceAll("<[^>]*>", "")
      .replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  private def splitLines(s: String): Array[String] =
    s.split("\r\n|\n|\r", -1)

  /** Struct (kind, cues array<struct(cue_idx, start_ms, end_ms,
    * text)>) or null for non-subtitle bytes.
    */
  def parse(raw: Array[Byte]): InternalRow = {
    if (raw == null || raw.length == 0) return null
    var s = new String(raw, java.nio.charset.StandardCharsets.UTF_8)
    if (s.startsWith("\uFEFF")) s = s.substring(1)
    val lines = splitLines(s)
    var kind: String = null
    var i = 0
    while (i < lines.length && lines(i).trim.isEmpty) i += 1
    if (i < lines.length && lines(i).startsWith("WEBVTT") &&
        (lines(i).length == 6 || lines(i).charAt(6) == ' ' ||
          lines(i).charAt(6) == '\t')) {
      kind = "vtt"
      // header block: skip metadata lines to the first blank
      while (i < lines.length && lines(i).trim.nonEmpty) i += 1
    } else if (i + 1 < lines.length && lines(i).trim.nonEmpty &&
        lines(i).trim.forall(_.isDigit) && lines(i + 1).contains("-->")) {
      kind = "srt"
    } else return null
    val cues = new scala.collection.mutable.ArrayBuffer[Any]()
    while (i < lines.length && cues.length < MaxCues) {
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length) {
        val blockStart = i
        while (i < lines.length && lines(i).trim.nonEmpty) i += 1
        val block = java.util.Arrays.copyOfRange(lines, blockStart, i)
        val head = block(0)
        val isComment = kind == "vtt" &&
          (head == "NOTE" || head.startsWith("NOTE ") ||
            head.startsWith("STYLE") || head.startsWith("REGION"))
        if (!isComment) {
          // timing on line 0, or line 1 behind an SRT index / VTT
          // cue-identifier line
          val t =
            if (head.contains("-->")) 0
            else if (block.length > 1 && block(1).contains("-->")) 1
            else -1
          if (t >= 0) {
            val tl = block(t)
            val arrow = tl.indexOf("-->")
            val startMs = timestampMs(tl.substring(0, arrow))
            // VTT cue settings follow the end stamp after whitespace
            var endStr = tl.substring(arrow + 3).trim
            val sp = {
              val a = endStr.indexOf(' ')
              val b = endStr.indexOf('\t')
              if (a < 0) b else if (b < 0) a else math.min(a, b)
            }
            if (sp >= 0) endStr = endStr.substring(0, sp)
            val endMs = timestampMs(endStr)
            if (startMs >= 0 && endMs >= 0) {
              val text = cleanText(
                block.drop(t + 1).mkString("\n"))
              cues += InternalRow(cues.length.toLong, startMs, endMs,
                UTF8String.fromString(text))
            }
          }
        }
      }
    }
    if (kind == "srt" && cues.isEmpty) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(kind), new GenericArrayData(cues.toArray)))
  }
}

/** Deterministic subtitle files from (doc_id, doc text): SRT on even
  * docs, WebVTT on odd. `2 + d%3` cues; the LAST cue's payload is
  * the first 60 characters of the doc's REAL text
  * (newlines → spaces), so the oracle match proves live data rode
  * the wire. Cue 0 carries inline markup the parse must strip
  * (`<v Speaker>` on VTT, `<i>` on SRT); cue 1 (when not last) is
  * two text lines with planted `&amp;`/`&lt;`/`&gt;` entities. VTT
  * lanes additionally rotate: a `NOTE` comment block (always), a
  * header-metadata line (d%4==1), the hour-less `MM:SS.mmm` stamp
  * form (d%3==1), cue settings after the end stamp (d%4==2), and a
  * cue-identifier line before cue 1 (d%3==2).
  */
object SubtitleSynthKernel {

  private def stamp(ms: Long, vtt: Boolean, short: Boolean): String = {
    val h = ms / 3600000L
    val m = (ms % 3600000L) / 60000L
    val ss = (ms % 60000L) / 1000L
    val mmm = ms % 1000L
    val sep = if (vtt) "." else ","
    if (vtt && short) f"$m%02d:$ss%02d$sep$mmm%03d"
    else f"$h%02d:$m%02d:$ss%02d$sep$mmm%03d"
  }

  def synth(d: Long, text: String): Array[Byte] = {
    val vtt = d % 2 == 1
    val n = (2 + d % 3).toInt
    val short = vtt && d % 3 == 1
    val sb = new StringBuilder
    if (vtt) {
      sb.append("WEBVTT")
      if (d % 4 == 1) sb.append(" meta synth")
      sb.append("\n\n")
      sb.append(s"NOTE synth $d\n\n")
    }
    val splice = text.substring(0, math.min(60, text.length))
      .replace('\r', ' ').replace('\n', ' ')
    var j = 0
    while (j < n) {
      val start = j * 2000L + (d % 7) * 100L
      val end = start + 1500L + (d % 5) * 20L
      if (!vtt) sb.append(j + 1).append('\n')
      else if (j == 1 && d % 3 == 2) sb.append(s"id-$d-$j\n")
      sb.append(stamp(start, vtt, short)).append(" --> ")
        .append(stamp(end, vtt, short))
      if (vtt && d % 4 == 2) sb.append(" align:start")
      sb.append('\n')
      val body =
        if (j == n - 1) splice
        else if (j == 0)
          if (vtt) s"<v Speaker $d>Cue 0 of doc $d</v>"
          else s"<i>Cue 0 of doc $d</i>"
        else if (j == 1) s"line one of $d\na &amp; b &lt;c&gt;"
        else s"cue $j of doc $d"
      sb.append(body).append("\n\n")
      j += 1
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** `subtitle_cues(raw) → struct<kind, cues array<struct<cue_idx,
  * start_ms, end_ms, text>>>`; see [[SubtitleCuesKernel.parse]].
  */
case class SubtitleCues(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("kind", StringType),
    StructField("cues", ArrayType(StructType(Seq(
      StructField("cue_idx", LongType),
      StructField("start_ms", LongType),
      StructField("end_ms", LongType),
      StructField("text", StringType))), containsNull = false))))
  override def nullable: Boolean = true
  override def prettyName: String = "subtitle_cues"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    SubtitleCuesKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.SubtitleCuesKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `subtitle_synth(doc_id, text) → binary`; see
  * [[SubtitleSynthKernel.synth]].
  */
case class SubtitleSynth(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "subtitle_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, string) input, got $other")
    }

  override def nullSafeEval(d: Any, t: Any): Any =
    SubtitleSynthKernel.synth(d.asInstanceOf[Long], t.toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, t) => s"""
      |${ev.value} = graft.expressions.SubtitleSynthKernel.synth($d,
      |  $t.toString());
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}
