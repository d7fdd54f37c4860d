package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mail HEADER decode (RFC 5322 + RFC 2047) — the other half of the
  * email-corpus step [[MimePartsKernel]] covers for bodies: header
  * values carry non-ASCII as ENCODED-WORDS (`=?charset?B?base64?=` /
  * `=?charset?Q?quoted?=`, the Q form with `_` for space), and RFC
  * 2047 §6.2's merge rule drops the whitespace BETWEEN two adjacent
  * encoded words (a long display name splits across words without
  * gaining spaces). The kernel reuses the shared folded-header
  * parse, decodes From / To / Subject, and splits the From mailbox
  * into display name + angle-addr.
  *
  * Null (never a throw) for bytes without a parseable header block
  * or without a From header; malformed encoded-words pass through
  * verbatim (the RFC's own fallback).
  */
object MailHeadersKernel {

  /** RFC 2047 decode over one header value: encoded-words decoded
    * (B = base64, Q = `_`-space quoted-printable), adjacent
    * encoded-words merged with their separating whitespace dropped,
    * everything else verbatim.
    */
  private[expressions] def decodeWords(v: String): String = {
    if (v == null) return null
    val sb = new StringBuilder
    var i = 0
    var prevWasWord = false
    var pendingWs = ""
    while (i < v.length) {
      if (v.startsWith("=?", i)) {
        val c1 = v.indexOf('?', i + 2)
        val c2 = if (c1 < 0) -1 else v.indexOf('?', c1 + 1)
        val end = if (c2 < 0) -1 else v.indexOf("?=", c2 + 1)
        val decoded: String =
          if (c1 < 0 || c2 < 0 || end < 0 || c2 != c1 + 2) null
          else {
            val enc = v.charAt(c1 + 1)
            val payload = v.substring(c2 + 1, end)
            try {
              if (enc == 'B' || enc == 'b')
                new String(java.util.Base64.getMimeDecoder.decode(payload),
                  "UTF-8")
              else if (enc == 'Q' || enc == 'q') {
                val out = new java.io.ByteArrayOutputStream(payload.length)
                var j = 0
                while (j < payload.length) {
                  val c = payload.charAt(j)
                  if (c == '_') { out.write(' '); j += 1 }
                  else if (c == '=' && j + 2 < payload.length) {
                    out.write(Integer.parseInt(
                      payload.substring(j + 1, j + 3), 16))
                    j += 3
                  } else { out.write(c.toInt & 0xFF); j += 1 }
                }
                new String(out.toByteArray, "UTF-8")
              } else null
            } catch {
              case _: IllegalArgumentException => null
              case _: NumberFormatException => null
            }
          }
        if (decoded != null) {
          // RFC 2047 §6.2: whitespace between ADJACENT encoded words
          // is dropped; before a first word it stays
          if (!prevWasWord) sb.append(pendingWs)
          sb.append(decoded)
          prevWasWord = true
          pendingWs = ""
          i = end + 2
        } else {
          sb.append(pendingWs).append("=?")
          prevWasWord = false
          pendingWs = ""
          i += 2
        }
      } else {
        val c = v.charAt(i)
        if (c == ' ' || c == '\t') pendingWs += c
        else {
          sb.append(pendingWs).append(c)
          pendingWs = ""
          prevWasWord = false
        }
        i += 1
      }
    }
    sb.append(pendingWs)
    sb.toString
  }

  /** (addr, displayName-or-null) from an RFC 5322 mailbox. */
  private def mailbox(v: String): (String, String) = {
    if (v == null) return (null, null)
    val lt = v.indexOf('<')
    val gt = v.indexOf('>', lt + 1)
    if (lt >= 0 && gt > lt) {
      var name = v.substring(0, lt).trim
      if (name.length >= 2 && name.startsWith("\"") && name.endsWith("\""))
        name = name.substring(1, name.length - 1)
      (v.substring(lt + 1, gt).trim,
        if (name.isEmpty) null else decodeWords(name))
    } else (v.trim, null)
  }

  private def str(v: String): UTF8String =
    if (v == null) null else UTF8String.fromString(v)

  /** Struct (from_addr, from_name, to_addr, subject, date_raw,
    * message_id) or null.
    */
  def parse(raw: Array[Byte]): InternalRow = {
    if (raw == null || raw.length == 0) return null
    val s = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    val split = MimePartsKernel.splitHeaders(s)
    if (split == null) return null
    val hs = split._1
    val from = MimePartsKernel.header(hs, "from")
    if (from == null) return null
    val (fromAddr, fromName) = mailbox(from)
    val (toAddr, _) = mailbox(MimePartsKernel.header(hs, "to"))
    new GenericInternalRow(Array[Any](
      str(fromAddr), str(fromName), str(toAddr),
      str(decodeWords(MimePartsKernel.header(hs, "subject"))),
      str(MimePartsKernel.header(hs, "date")),
      str(MimePartsKernel.header(hs, "message-id"))))
  }
}

/** `mail_headers(raw) → struct<...6 fields>`; see
  * [[MailHeadersKernel.parse]].
  */
case class MailHeaders(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("from_addr", StringType),
    StructField("from_name", StringType),
    StructField("to_addr", StringType),
    StructField("subject", StringType),
    StructField("date_raw", StringType),
    StructField("message_id", StringType)))
  override def nullable: Boolean = true
  override def prettyName: String = "mail_headers"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    MailHeadersKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.MailHeadersKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
