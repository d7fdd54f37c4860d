package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Charset detection + decode — the step a crawl ingest runs BEFORE
  * any text operator: fetched bytes arrive unlabeled (or mislabeled)
  * and every downstream stage (tokenize, dedup, quality, langid)
  * assumes correct Unicode. Detection order mirrors the WHATWG
  * encoding sniff a browser runs: BOM first (UTF-8 / UTF-16LE /
  * UTF-16BE), then strict UTF-8 VALIDATION (a full RFC 3629 scan —
  * continuation-byte shapes, overlong rejection, surrogate-range
  * rejection, max U+10FFFF), then a NUL-distribution heuristic for
  * BOM-less UTF-16 (ASCII-heavy text interleaves NULs at a parity:
  * odd positions → LE, even → BE), and finally the Latin-1 fallback
  * every browser applies (all 256 byte values map 1:1 to U+00-U+FF,
  * so the fallback never fails — text is always produced, the
  * charset label says how trustworthy it is).
  *
  * Reference behavior: lshrs assumes decoded text in its documents
  * table; byte-level charset handling is part of the
  * beyond-reference ingest tier. Never throws; the decode output is
  * capped (MaxChars) against decompression-bomb-sized inputs.
  */
object CharsetDetectKernel {
  val MaxBytes: Int = 1 << 24

  /** Strict RFC 3629 UTF-8 validation over [from, len). */
  def isValidUtf8(p: Array[Byte], from: Int): Boolean = {
    var i = from
    val n = p.length
    while (i < n) {
      val b = p(i) & 0xFF
      if (b < 0x80) i += 1
      else if (b < 0xC2) return false // continuation or overlong lead
      else if (b < 0xE0) { // 2-byte
        if (i + 1 >= n || (p(i + 1) & 0xC0) != 0x80) return false
        i += 2
      } else if (b < 0xF0) { // 3-byte
        if (i + 2 >= n) return false
        val b1 = p(i + 1) & 0xFF
        if ((b1 & 0xC0) != 0x80 || (p(i + 2) & 0xC0) != 0x80) return false
        if (b == 0xE0 && b1 < 0xA0) return false // overlong
        if (b == 0xED && b1 >= 0xA0) return false // surrogates
        i += 3
      } else if (b < 0xF5) { // 4-byte
        if (i + 3 >= n) return false
        val b1 = p(i + 1) & 0xFF
        if ((b1 & 0xC0) != 0x80 || (p(i + 2) & 0xC0) != 0x80 ||
            (p(i + 3) & 0xC0) != 0x80) return false
        if (b == 0xF0 && b1 < 0x90) return false // overlong
        if (b == 0xF4 && b1 >= 0x90) return false // > U+10FFFF
        i += 4
      } else return false
    }
    true
  }

  /** Struct (charset, had_bom, confident, text) — never null: the
    * Latin-1 fallback always decodes. charset ∈ utf-8 / utf-16le /
    * utf-16be / latin-1; `confident` is false only on the fallback
    * and the BOM-less UTF-16 heuristic.
    */
  def detect(p: Array[Byte]): InternalRow = {
    if (p.length > MaxBytes) return null
    // BOMs
    if (p.length >= 3 && (p(0) & 0xFF) == 0xEF && (p(1) & 0xFF) == 0xBB &&
        (p(2) & 0xFF) == 0xBF) {
      val ok = isValidUtf8(p, 3)
      val text =
        if (ok) new String(p, 3, p.length - 3, "UTF-8")
        else latin1(p, 0)
      return row(if (ok) "utf-8" else "latin-1", hadBom = ok, confident = ok, text)
    }
    if (p.length >= 2 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xFE)
      return row("utf-16le", hadBom = true, confident = true,
        utf16(p, 2, le = true))
    if (p.length >= 2 && (p(0) & 0xFF) == 0xFE && (p(1) & 0xFF) == 0xFF)
      return row("utf-16be", hadBom = true, confident = true,
        utf16(p, 2, le = false))
    // BOM-less UTF-16 heuristic BEFORE UTF-8 validation: NUL bytes
    // are LEGAL UTF-8 (U+0000), so ASCII-as-UTF-16 would pass the
    // validator — but real text never carries NULs, and ASCII-heavy
    // UTF-16 puts them all on one parity. Require a strong one-sided
    // majority on even length.
    if (p.length >= 8 && p.length % 2 == 0) {
      var oddNul = 0
      var evenNul = 0
      var i = 0
      while (i < p.length) {
        if (p(i) == 0) { if (i % 2 == 1) oddNul += 1 else evenNul += 1 }
        i += 1
      }
      val half = p.length / 2
      if (oddNul * 10 >= half * 8 && evenNul == 0)
        return row("utf-16le", hadBom = false, confident = false,
          utf16(p, 0, le = true))
      if (evenNul * 10 >= half * 8 && oddNul == 0)
        return row("utf-16be", hadBom = false, confident = false,
          utf16(p, 0, le = false))
    }
    if (isValidUtf8(p, 0))
      return row("utf-8", hadBom = false, confident = true,
        new String(p, "UTF-8"))
    row("latin-1", hadBom = false, confident = false, latin1(p, 0))
  }

  private def utf16(p: Array[Byte], from: Int, le: Boolean): String = {
    val n = (p.length - from) / 2
    val chars = new Array[Char](n)
    var i = 0
    while (i < n) {
      val b0 = p(from + 2 * i) & 0xFF
      val b1 = p(from + 2 * i + 1) & 0xFF
      chars(i) = (if (le) b0 | (b1 << 8) else (b0 << 8) | b1).toChar
      i += 1
    }
    new String(chars)
  }

  private def latin1(p: Array[Byte], from: Int): String = {
    val chars = new Array[Char](p.length - from)
    var i = 0
    while (i < chars.length) { chars(i) = (p(from + i) & 0xFF).toChar; i += 1 }
    new String(chars)
  }

  private def row(charset: String, hadBom: Boolean, confident: Boolean,
      text: String): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(charset), hadBom, confident,
      UTF8String.fromString(text)))
}

/** `charset_decode(payload) → struct<charset, had_bom, confident,
  * text>`; see [[CharsetDetectKernel.detect]].
  */
case class CharsetDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("charset", StringType),
    StructField("had_bom", BooleanType),
    StructField("confident", BooleanType),
    StructField("text", StringType)))
  override def nullable: Boolean = true
  override def prettyName: String = "charset_decode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    CharsetDetectKernel.detect(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.CharsetDetectKernel.detect($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
