package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass HTML character-reference decoder shared by interpreted
  * eval and generated code — the decode step of
  * [[graft.text.Html.extractText]].
  *
  * Why a kernel and not `regexp_replace`: NUMERIC references
  * (`&#233;`, `&#x2019;` — ubiquitous on a real crawl, where they
  * otherwise survive extraction as literal junk tokens feeding
  * dedup/search/quality) require COMPUTING a codepoint from the
  * digits, which no replace function can express. One left-to-right
  * pass decodes both forms plus the named table in a single scan —
  * the HTML-correct single-decode semantics fall out for free:
  * `&amp;lt;` consumes `&amp;` first and emits the literal text
  * `&lt;`, never a double decode.
  *
  * Numeric validity (HTML5 §13.2.5.80 essentials): decimal `&#N;` and
  * hex `&#xH;`/`&#XH;`, 1–7 digits, codepoint in 1..0x10FFFF and not
  * a surrogate. Supplementary planes emit as surrogate pairs. Any
  * invalid reference (zero digits, overlong, out of range, surrogate,
  * missing `;`) stays LITERAL — null-not-guess, byte-preserving.
  */
object HtmlEntityKernel {
  /** The named table — same set as `graft.text.Html.Entities` (the
    * ordered oracle list); matching here is positional so order is
    * irrelevant. Spelled locally to keep the expressions package free
    * of a text-package dependency; `HtmlEntitySyncSpec` pins the two
    * lists equal.
    */
  val Named: Array[(String, Char)] = Array(
    "&lt;" -> '<', "&gt;" -> '>', "&quot;" -> '"',
    "&#39;" -> '\'', "&apos;" -> '\'', "&nbsp;" -> ' ',
    "&amp;" -> '&')

  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = str.indexOf('&')
    if (i < 0) return s
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    sb.append(str, 0, i)
    while (i < n) {
      val c = str.charAt(i)
      if (c != '&') {
        sb.append(c)
        i += 1
      } else {
        var consumed = 0
        if (i + 2 < n && str.charAt(i + 1) == '#') {
          val hex = str.charAt(i + 2) == 'x' || str.charAt(i + 2) == 'X'
          var j = i + (if (hex) 3 else 2)
          var cp = 0L
          var d = 0
          var go = true
          while (go && j < n && d < 8) {
            val ch = str.charAt(j)
            val v =
              if (ch >= '0' && ch <= '9') ch - '0'
              else if (hex && ch >= 'a' && ch <= 'f') ch - 'a' + 10
              else if (hex && ch >= 'A' && ch <= 'F') ch - 'A' + 10
              else -1
            if (v < 0) go = false
            else {
              cp = cp * (if (hex) 16 else 10) + v
              d += 1
              j += 1
            }
          }
          if (d > 0 && d < 8 && j < n && str.charAt(j) == ';' &&
              cp > 0 && cp <= 0x10FFFF &&
              !(cp >= 0xD800 && cp <= 0xDFFF)) {
            sb.appendCodePoint(cp.toInt)
            consumed = j + 1 - i
          }
        }
        if (consumed == 0) {
          var k = 0
          while (consumed == 0 && k < Named.length) {
            if (str.startsWith(Named(k)._1, i)) {
              sb.append(Named(k)._2)
              consumed = Named(k)._1.length
            }
            k += 1
          }
        }
        if (consumed == 0) {
          sb.append('&')
          consumed = 1
        }
        i += consumed
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `html_entity_decode(string) → string` — named + numeric HTML
  * character references in one codegen pass; see
  * [[HtmlEntityKernel.decode]].
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_entity_decode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    HtmlEntityKernel.decode(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HtmlEntityKernel.decode($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlEntityDecode =
    copy(child = newChild)
}
