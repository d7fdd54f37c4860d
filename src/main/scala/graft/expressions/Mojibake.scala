package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake detection + repair — the classic corpus-cleaning pass
  * (ftfy's core heuristic, reimplemented from the public idea): web
  * text is full of UTF-8 that was decoded as Windows-1252 and
  * re-encoded, turning `é` into `Ã©` and `’` into `â€™` — sometimes
  * TWICE. The repair inverts exactly that: encode the string back to
  * cp1252 bytes (strict — any unmappable char aborts) and strictly
  * decode those bytes as UTF-8; accept only when the decode is valid
  * AND changes the string. Pure ASCII and legitimately-accented text
  * round-trip to themselves or fail the strict decode, so the pass
  * is a no-op on clean input — the no-false-positive property the
  * spec pins on a `café é` lane. Depth-capped (double mojibake needs
  * two passes; three is pathology).
  *
  * Reference scope: lshrs normalizes text but never repairs
  * encoding damage — beyond-reference, standard data-cleaning kit.
  */
object MojibakeKernel {
  val MaxDepth = 3

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  /** "Sloppy" Windows-1252 (ftfy's public trick): byte → char via
    * cp1252, with the five UNDEFINED bytes (0x81 0x8D 0x8F 0x90
    * 0x9D) falling back to their C1 controls instead of U+FFFD —
    * because that's what lenient real-world decoders emit, and a
    * strict cp1252 would turn `”`-damage (…0x9D) into an
    * unrecoverable replacement char.
    */
  private val SloppyForward: Array[Char] = Array.tabulate(256) { b =>
    val c = new String(Array(b.toByte), Cp1252).charAt(0)
    if (c == '\uFFFD') b.toChar else c
  }
  private val SloppyInverse: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte]()
    var b = 0
    while (b < 256) {
      m.put(Character.valueOf(SloppyForward(b)), java.lang.Byte.valueOf(b.toByte))
      b += 1
    }
    m
  }

  /** One inverse pass: sloppy-cp1252-encode strictly (any unmappable
    * char aborts), UTF-8-decode strictly; null when the string is
    * not mojibake-shaped.
    */
  private[expressions] def repairOnce(s: String): String = {
    // cheap gate: pure ASCII can never repair
    var hasHigh = false
    var i = 0
    while (!hasHigh && i < s.length) {
      if (s.charAt(i) >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return null
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) {
      val b = SloppyInverse.get(Character.valueOf(s.charAt(i)))
      if (b == null) return null
      bytes(i) = b.byteValue()
      i += 1
    }
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out == s) null else out
    } catch {
      case _: java.nio.charset.CharacterCodingException => null
    }
  }

  /** Struct (fixed_text, had_mojibake, depth). */
  def repair(text: UTF8String): InternalRow = {
    if (text == null) return null
    var s = text.toString
    var depth = 0
    var next = repairOnce(s)
    while (next != null && depth < MaxDepth) {
      s = next
      depth += 1
      next = repairOnce(s)
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(s), depth > 0, depth.toLong))
  }

  /** Forward damage (encode UTF-8, decode SLOPPY cp1252 — the same
    * lenient table the repair inverts) — the synth side.
    */
  private[graft] def mojibake(s: String): String = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) { sb.append(SloppyForward(b(i) & 0xFF)); i += 1 }
    sb.toString
  }
}

/** Deterministic mojibake-bearing strings from (doc_id, doc text):
  * each doc is `substring(text, 1, 40)` + ` | ` + a d%5 payload lane —
  * clean ASCII / clean accented (the no-false-positive lane) /
  * single mojibake of `café d` / DOUBLE mojibake of `é d` / single
  * mojibake of cp1252-special `€ ’ ™ d` (the bytes only a
  * Windows-1252 — not Latin-1 — inverse recovers). The oracle holds
  * the REPAIRED closed forms.
  */
object MojibakeSynthKernel {
  import MojibakeKernel.mojibake

  def synth(d: Long, text: String): String = {
    val prefix = text.substring(0, math.min(40, text.length))
      .replace('\r', ' ').replace('\n', ' ')
    val payload = (d % 5) match {
      case 0 => s"plain $d"
      case 1 => s"café é $d"
      case 2 => mojibake(s"café $d")
      case 3 => mojibake(mojibake(s"é $d"))
      case _ => mojibake(s"€ ’ ™ $d")
    }
    prefix + " | " + payload
  }
}

/** `mojibake_repair(text) → struct<fixed_text, had_mojibake,
  * depth>`; see [[MojibakeKernel.repair]].
  */
case class MojibakeRepair(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("fixed_text", StringType),
    StructField("had_mojibake", BooleanType),
    StructField("depth", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "mojibake_repair"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    MojibakeKernel.repair(d.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.MojibakeKernel.repair($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `mojibake_synth(doc_id, text) → string`; see
  * [[MojibakeSynthKernel.synth]].
  */
case class MojibakeSynth(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "mojibake_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, string) input, got $other")
    }

  override def nullSafeEval(d: Any, t: Any): Any =
    UTF8String.fromString(
      MojibakeSynthKernel.synth(d.asInstanceOf[Long], t.toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, t) => s"""
      |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
      |  graft.expressions.MojibakeSynthKernel.synth($d, $t.toString()));
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}
