package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MIME message decode (RFC 2045/2046) — the step between the mbox
  * envelope split and any text operator on an email corpus: real
  * mail bodies are multipart trees whose leaves arrive
  * content-transfer-encoded. The kernel parses the header block
  * (folded continuation lines, case-insensitive names), the
  * Content-Type with its parameters (quoted or bare boundary /
  * charset / name), walks multipart bodies by boundary-line scan
  * (the CRLF preceding a boundary belongs to the DELIMITER, not the
  * part — the classic off-by-two; preamble and epilogue skipped;
  * nested multiparts recursed, depth-capped), and decodes each leaf:
  * quoted-printable (`=XX`, soft line breaks) and base64 (the JDK's
  * MIME decoder — whitespace-tolerant) to exact bytes; 7bit / 8bit /
  * binary pass through.
  *
  * One row per LEAF part in document order: content type, charset,
  * encoding, attachment disposition + filename, decoded byte count,
  * the decoded text for text-typed leaves, and a byte sum for binary
  * leaves (the closed-form handle a SQL oracle can verify a real
  * base64 decode against). Null (never a throw) when the bytes
  * carry no parseable header block or no Content-Type.
  */
object MimePartsKernel {
  val MaxParts = 64
  val MaxDepth = 4
  val MaxBytes: Int = 1 << 24

  private case class Part(
    contentType: String, charset: String, encoding: String,
    attachment: Boolean, filename: String, decoded: Array[Byte],
    isText: Boolean)

  /** Byte-preserving structural view: latin-1 chars map 1:1 to bytes. */
  private def l1(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)

  private def l1b(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Split a message (or part) into (headers, body) at the first
    * blank line; returns null if there is none. Headers are unfolded.
    * Shared with the header-decode tier ([[MailHeadersKernel]]).
    */
  private[expressions] def splitHeaders(s: String): (Seq[String], String) = {
    var i = 0
    var hdrEnd = -1
    var bodyStart = -1
    while (hdrEnd < 0 && i < s.length) {
      // a blank line: \r\n\r\n or \n\n (tolerate mixed)
      if (s.startsWith("\r\n\r\n", i)) { hdrEnd = i; bodyStart = i + 4 }
      else if (s.startsWith("\n\n", i)) { hdrEnd = i; bodyStart = i + 2 }
      else i += 1
    }
    if (hdrEnd < 0) return null
    val raw = s.substring(0, hdrEnd)
    val lines = raw.split("\r\n|\n", -1)
    val folded = new scala.collection.mutable.ArrayBuffer[String]()
    lines.foreach { line =>
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')
          && folded.nonEmpty)
        folded(folded.length - 1) = folded.last + " " + line.trim
      else folded += line
    }
    (folded.toSeq, s.substring(bodyStart))
  }

  private[expressions] def header(hs: Seq[String], name: String): String = {
    val p = name.toLowerCase(java.util.Locale.ROOT) + ":"
    hs.find(_.toLowerCase(java.util.Locale.ROOT).startsWith(p))
      .map(h => h.substring(h.indexOf(':') + 1).trim).orNull
  }

  /** `value; p1=v1; p2="v 2"` → (value-lowercased, param map). */
  private def parseParams(v: String): (String, Map[String, String]) = {
    if (v == null) return (null, Map.empty)
    val parts = new scala.collection.mutable.ArrayBuffer[String]()
    var cur = new StringBuilder
    var inQ = false
    v.foreach { c =>
      if (c == '"') { inQ = !inQ; cur.append(c) }
      else if (c == ';' && !inQ) { parts += cur.toString; cur = new StringBuilder }
      else cur.append(c)
    }
    parts += cur.toString
    val value = parts.head.trim.toLowerCase(java.util.Locale.ROOT)
    val params = parts.tail.flatMap { pr =>
      val eq = pr.indexOf('=')
      if (eq < 0) None
      else {
        val k = pr.substring(0, eq).trim.toLowerCase(java.util.Locale.ROOT)
        var pv = pr.substring(eq + 1).trim
        if (pv.length >= 2 && pv.startsWith("\"") && pv.endsWith("\""))
          pv = pv.substring(1, pv.length - 1)
        Some(k -> pv)
      }
    }.toMap
    (value, params)
  }

  private def decodeQp(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=') {
        if (s.startsWith("=\r\n", i)) i += 3 // soft break
        else if (s.startsWith("=\n", i)) i += 2 // soft break, bare LF
        else if (i + 2 < s.length) {
          val hex = s.substring(i + 1, i + 3)
          try { out.write(Integer.parseInt(hex, 16)); i += 3 }
          catch { case _: NumberFormatException => out.write('='); i += 1 }
        } else { out.write('='); i += 1 }
      } else { out.write(c.toInt & 0xFF); i += 1 }
    }
    out.toByteArray
  }

  private def decodeBody(body: String, encoding: String): Array[Byte] =
    encoding match {
      case "base64" =>
        try java.util.Base64.getMimeDecoder.decode(l1b(body))
        catch { case _: IllegalArgumentException => null }
      case "quoted-printable" => decodeQp(body)
      case _ => l1b(body) // 7bit / 8bit / binary / unknown → identity
    }

  /** Part slices between boundary delimiter lines, byte-exact on the
    * raw string: the line terminator BEFORE a delimiter belongs to
    * the DELIMITER (RFC 2046 §5.1.1), trailing whitespace on a
    * delimiter line is ignored, preamble (before the first
    * delimiter) and epilogue (after the closing `--`) are skipped.
    */
  private def splitMultipartRaw(body: String, boundary: String): Seq[String] = {
    val delim = "--" + boundary
    val parts = new scala.collection.mutable.ArrayBuffer[String]()
    var curStart = -1
    var i = 0
    var closed = false
    while (i <= body.length && !closed) {
      val lineEnd0 = body.indexOf('\n', i)
      val lineEnd = if (lineEnd0 < 0) body.length else lineEnd0
      var lineStop = lineEnd
      if (lineStop > i && body.charAt(lineStop - 1) == '\r') lineStop -= 1
      var t = lineStop
      while (t > i && (body.charAt(t - 1) == ' ' || body.charAt(t - 1) == '\t'))
        t -= 1
      val trimmed = body.substring(i, t)
      if (trimmed == delim || trimmed == delim + "--") {
        if (curStart >= 0) {
          var pEnd = i
          if (pEnd >= 2 && body.startsWith("\r\n", pEnd - 2)) pEnd -= 2
          else if (pEnd >= 1 && body.charAt(pEnd - 1) == '\n') pEnd -= 1
          parts += body.substring(curStart, math.max(curStart, pEnd))
        }
        if (trimmed == delim + "--") closed = true
        else curStart = lineEnd + 1
      }
      i = lineEnd + 1
      if (lineEnd0 < 0) i = body.length + 1
    }
    parts.toSeq
  }

  private def walk(s: String, depth: Int,
      out: scala.collection.mutable.ArrayBuffer[Part]): Boolean = {
    if (out.length >= MaxParts || depth > MaxDepth) return false
    val split = splitHeaders(s)
    if (split == null) return false
    val (hs, body) = split
    val (ctype, params) = parseParams(header(hs, "content-type"))
    if (ctype == null) return false
    if (ctype.startsWith("multipart/")) {
      val boundary = params.getOrElse("boundary", null)
      if (boundary == null || boundary.isEmpty) return false
      val parts = splitMultipartRaw(body, boundary)
      if (parts.isEmpty) return false
      parts.forall(p => walk(p, depth + 1, out))
    } else {
      val encoding = Option(header(hs, "content-transfer-encoding"))
        .map(_.trim.toLowerCase(java.util.Locale.ROOT)).getOrElse("7bit")
      val decoded = decodeBody(body, encoding)
      if (decoded == null || decoded.length > MaxBytes) return false
      val (disp, dparams) = parseParams(header(hs, "content-disposition"))
      val isText = ctype.startsWith("text/")
      out += Part(ctype, params.getOrElse("charset", null), encoding,
        disp == "attachment",
        dparams.getOrElse("filename", null), decoded, isText)
      true
    }
  }

  /** Array of leaf-part structs, or null for non-MIME bytes. */
  def parse(raw: Array[Byte]): ArrayData = {
    if (raw == null || raw.length == 0) return null
    val s = l1(raw)
    val split = splitHeaders(s)
    if (split == null) return null
    if (header(split._1, "content-type") == null) return null
    val parts = new scala.collection.mutable.ArrayBuffer[Part]()
    if (!walk(s, 0, parts) || parts.isEmpty) return null
    var sumCap = 0L
    val rows = parts.zipWithIndex.map { case (p, i) =>
      var bs = 0L
      var j = 0
      while (j < p.decoded.length) { bs += p.decoded(j) & 0xFF; j += 1 }
      sumCap += p.decoded.length
      if (sumCap > MaxBytes) return null
      new GenericInternalRow(Array[Any](
        i.toLong,
        UTF8String.fromString(p.contentType),
        if (p.charset == null) null else UTF8String.fromString(p.charset),
        UTF8String.fromString(p.encoding),
        p.attachment,
        if (p.filename == null) null else UTF8String.fromString(p.filename),
        p.decoded.length.toLong,
        if (p.isText) null else java.lang.Long.valueOf(bs),
        if (p.isText) UTF8String.fromBytes(p.decoded) else null))
    }
    new GenericArrayData(rows.toArray[Any])
  }
}

/** Deterministic MIME synthesis: a multipart/mixed message whose
  * leaves rotate the decode lanes — quoted-printable text (soft
  * line breaks, `=XX` escapes incl. multibyte UTF-8), base64 text
  * carrying a slice of the doc's own text column, a base64 binary
  * attachment with closed-form bytes, and (on `d%3==2` docs) a
  * nested multipart/alternative with 7bit plain + html leaves.
  * Header-case and param-quoting lanes: lowercase `content-type:` on
  * `d%7==3`, quoted boundary on `d%5==2`, uppercase `BASE64` on
  * `d%4==1`. Preamble and epilogue always present.
  */
object MimeSynthKernel {
  private val CRLF = "\r\n"

  def encodeQp(body: Array[Byte]): String = {
    val sb = new StringBuilder
    var line = 0
    var i = 0
    while (i < body.length) {
      if (line >= 40) { sb.append("=").append(CRLF); line = 0 }
      val b = body(i) & 0xFF
      if (b == '='.toInt || b < 32 || b > 126) {
        sb.append(f"=${b}%02X")
        line += 3
      } else {
        sb.append(b.toChar)
        line += 1
      }
      i += 1
    }
    sb.toString
  }

  def synth(d: Long, text: String): Array[Byte] = {
    val b = s"b$d"
    val boundary = if (d % 5 == 2) "\"" + b + "\"" else b
    val ctName = if (d % 7 == 3) "content-type" else "Content-Type"
    val b64Name = if (d % 4 == 1) "BASE64" else "base64"
    val sb = new StringBuilder
    def b64(v: String): String =
      java.util.Base64.getEncoder.encodeToString(v.getBytes("UTF-8"))
    // From lanes (RFC 2047 encoded-word display names on d%4 ∈ {2,3})
    val addr = s"sender$d@example.com"
    val from = (d % 4) match {
      case 0 => addr
      case 1 => s"Sender $d <$addr>"
      case 2 => s"=?UTF-8?B?${b64(s"Señor $d")}?= <$addr>"
      case _ => s"=?utf-8?Q?Se=C3=B1or_$d?= <$addr>"
    }
    // Subject lanes: plain / B / Q / two ADJACENT encoded words
    // (their separating space drops per RFC 2047 §6.2) / mixed
    val subject = (d % 5) match {
      case 0 => s"doc $d plain"
      case 1 => s"=?UTF-8?B?${b64(s"Tema $d año")}?="
      case 2 => s"=?utf-8?Q?Tema_${d}_a=C3=B1o?="
      case 3 => s"=?UTF-8?B?${b64(s"Tema $d ")}?= =?UTF-8?B?${b64("año")}?="
      case _ => s"plain then =?UTF-8?Q?a=C3=B1o?="
    }
    sb.append(s"From: $from").append(CRLF)
    sb.append(s"To: rcpt$d@example.org").append(CRLF)
    sb.append(s"Subject: $subject").append(CRLF)
    sb.append(s"Date: Mon, ${d % 28 + 1} Jan 2026 00:00:00 +0000")
      .append(CRLF)
    sb.append(s"Message-ID: <m$d@example.com>").append(CRLF)
    sb.append("MIME-Version: 1.0").append(CRLF)
    sb.append(s"$ctName: multipart/mixed; boundary=$boundary").append(CRLF)
    sb.append(CRLF)
    sb.append("preamble, ignored by MIME readers").append(CRLF)
    // part 0: quoted-printable utf-8 text
    val p0 = s"part0 doc $d: caffè 100% =sign, tail y${d % 7}"
    sb.append(s"--$b").append(CRLF)
    sb.append("Content-Type: text/plain; charset=utf-8").append(CRLF)
    sb.append("Content-Transfer-Encoding: quoted-printable").append(CRLF)
    sb.append(CRLF)
    sb.append(encodeQp(p0.getBytes("UTF-8"))).append(CRLF)
    // part 1: base64 text carrying the doc's own text
    val take = (40 + d % 40).toInt
    val slice = if (text.length <= take) text else text.substring(0, take)
    val p1 = s"b64 doc $d :: $slice"
    val enc = java.util.Base64.getMimeEncoder(76, CRLF.getBytes)
    sb.append(s"--$b").append(CRLF)
    sb.append("Content-Type: text/plain; charset=\"us-ascii\"").append(CRLF)
    sb.append(s"Content-Transfer-Encoding: $b64Name").append(CRLF)
    sb.append(CRLF)
    sb.append(enc.encodeToString(p1.getBytes("UTF-8"))).append(CRLF)
    val nP = 2 + d % 3
    if (nP >= 3) {
      // part 2: base64 binary attachment, closed-form bytes
      val len = (30 + d % 50).toInt
      val bin = new Array[Byte](len)
      var j = 0
      while (j < len) { bin(j) = ((d * 7 + j * 3) % 256).toByte; j += 1 }
      sb.append(s"--$b").append(CRLF)
      sb.append("Content-Type: application/octet-stream").append(CRLF)
      sb.append("Content-Transfer-Encoding: base64").append(CRLF)
      sb.append(s"""Content-Disposition: attachment; filename="f$d.bin"""")
        .append(CRLF)
      sb.append(CRLF)
      sb.append(enc.encodeToString(bin)).append(CRLF)
    }
    if (nP == 4) {
      // part 3: nested multipart/alternative, two 7bit leaves
      val c = s"c$d"
      sb.append(s"--$b").append(CRLF)
      sb.append(s"Content-Type: multipart/alternative; boundary=$c")
        .append(CRLF)
      sb.append(CRLF)
      sb.append(s"--$c").append(CRLF)
      sb.append("Content-Type: text/plain").append(CRLF)
      sb.append(CRLF)
      sb.append(s"plain alt doc $d").append(CRLF)
      sb.append(s"--$c").append(CRLF)
      sb.append("Content-Type: text/html").append(CRLF)
      sb.append(CRLF)
      sb.append(s"<b>alt html doc $d</b>").append(CRLF)
      sb.append(s"--$c--").append(CRLF)
    }
    sb.append(s"--$b--").append(CRLF)
    sb.append("epilogue, also ignored").append(CRLF)
    sb.toString.getBytes("UTF-8")
  }
}

/** `mime_parts(raw) → array<struct<...9 fields>>`; see
  * [[MimePartsKernel.parse]].
  */
case class MimeParts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("part_idx", LongType),
    StructField("content_type", StringType),
    StructField("charset", StringType),
    StructField("encoding", StringType),
    StructField("is_attachment", BooleanType),
    StructField("filename", StringType),
    StructField("decoded_bytes", LongType),
    StructField("byte_sum", LongType),
    StructField("decoded_text", StringType))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mime_parts"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    MimePartsKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.MimePartsKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `mime_synth(doc_id, text) → binary`; see
  * [[MimeSynthKernel.synth]].
  */
case class MimeSynth(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mime_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, string), got $other")
    }

  override def nullSafeEval(d: Any, t: Any): Any =
    MimeSynthKernel.synth(d.asInstanceOf[Long],
      t.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, t) => s"""
      |${ev.value} = graft.expressions.MimeSynthKernel.synth($d, $t.toString());
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
