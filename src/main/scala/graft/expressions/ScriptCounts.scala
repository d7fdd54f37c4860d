package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document Unicode script histogram — ONE native pass per row,
  * the routing stage a multilingual crawl runs BEFORE language ID
  * (script narrows the language family: Cyrillic → ru/uk/bg…, Han →
  * zh/ja, Hangul → ko; langid's n-gram markers only make sense within
  * a script). Counts, per codepoint:
  *
  *   - index 0: total letters (`\p{L}` — the five letter categories,
  *     `Character.isLetter`);
  *   - index 1..11: codepoints whose Unicode SCRIPT property is each
  *     of [[ScriptCounts.Scripts]] (latin, cyrillic, greek, arabic,
  *     hebrew, han, hiragana, katakana, hangul, devanagari, thai —
  *     fixed order, shared with the oracle generator). Script counts
  *     are by script property alone (combining marks and script-local
  *     digits count toward their script), which is exactly what the
  *     RE2 class `\p{Latin}` etc. matches — so DuckDB mirrors each
  *     count as `len(regexp_extract_all(s, '[\p{X}]'))`.
  *
  * Both engines assign the script property from UnicodeData; the
  * planted corpora use only long-stable codepoints (no Unicode-15
  * additions), so the counts are integer-exact cross-engine.
  */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "script_counts"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"script_counts expects a string column, got ${child.dataType.catalogString}")

  def compute(v: Any): ArrayData = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    val counts = new Array[Long](1 + ScriptCounts.Scripts.size)
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp < 0x80) {
        // ASCII fast path: crawl corpora are ASCII-dominated and
        // UnicodeScript.of is a binary search per call
        if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) {
          counts(0) += 1; counts(1) += 1
        }
      } else {
        if (Character.isLetter(cp)) counts(0) += 1
        val idx = ScriptCounts.indexOf(Character.UnicodeScript.of(cp))
        if (idx >= 0) counts(idx + 1) += 1
      }
      i += Character.charCount(cp)
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scriptCountsExpr", this, classOf[ScriptCounts].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ScriptCounts {
  import Character.UnicodeScript
  import Character.UnicodeScript._

  /** Tracked scripts, FIXED order (ties in the dominant-script argmax
    * break toward the earlier entry in both engines). `name` is both
    * the output label and, capitalized, the RE2 script class the
    * DuckDB oracle uses (`\p{Latin}`…).
    */
  val Scripts: Seq[(String, UnicodeScript)] = Seq(
    "latin" -> LATIN, "cyrillic" -> CYRILLIC, "greek" -> GREEK,
    "arabic" -> ARABIC, "hebrew" -> HEBREW, "han" -> HAN,
    "hiragana" -> HIRAGANA, "katakana" -> KATAKANA, "hangul" -> HANGUL,
    "devanagari" -> DEVANAGARI, "thai" -> THAI)

  /** Column/label names in counts order. */
  val Names: Seq[String] = Scripts.map(_._1)

  private val index: java.util.EnumMap[UnicodeScript, Integer] = {
    val m = new java.util.EnumMap[UnicodeScript, Integer](classOf[UnicodeScript])
    Scripts.zipWithIndex.foreach { case ((_, sc), i) => m.put(sc, i) }
    m
  }

  def indexOf(sc: UnicodeScript): Int = {
    val v = index.get(sc)
    if (v == null) -1 else v.intValue()
  }
}
