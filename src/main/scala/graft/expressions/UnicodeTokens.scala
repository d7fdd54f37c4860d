package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-aware word tokenizer — one native pass per row (r11 verdict
  * item #1: the previous `split(lower(s), "[^a-z0-9]+")` form tokenized
  * every non-ASCII document to ZERO tokens, silently blinding every
  * token-keyed operator — dedup shingles/minhash, BM25/search, hash
  * embeddings, quality/Gopher signals, langid features, word
  * blocklists — to CJK/Cyrillic/Arabic/Greek/accented-Latin text).
  *
  * Semantics, chosen to be EXACTLY mirrorable in RE2-based engines
  * (the DuckDB oracle):
  *
  *   1. lowercase per codepoint (`Character.toLowerCase(int)` — the
  *      simple 1:1 UnicodeData mapping, which is what DuckDB's
  *      `lower()` applies; deliberately NOT `String.toLowerCase`,
  *      whose contextual rules — final sigma, Turkish dotted I
  *      expansion — diverge across engines);
  *   2. every Han / Hiragana / Katakana codepoint is its own token
  *      (the standard per-codepoint fallback for unspaced CJK — a
  *      CJK "word" segmenter is corpus-specific, per-char unigrams
  *      are the portable shingle/BM25 unit);
  *   3. remaining runs of letters and digits (`\p{L}\p{N}` — all five
  *      letter categories plus decimal/letter/other numbers) are
  *      tokens; everything else separates.
  *
  * DuckDB equivalent (RE2 classes; `\p{Han}` etc. are script names):
  * {{{
  * list_filter(string_split_regex(
  *   regexp_replace(lower(s), '([\p{Han}\p{Hiragana}\p{Katakana}])',
  *                  ' \1 ', 'g'),
  *   '[^\p{L}\p{N}]+'), x -> x <> '')
  * }}}
  *
  * On pure-ASCII input the output is IDENTICAL to the old
  * `split(lower(s),'[^a-z0-9]+')` form (ASCII letters/digits are the
  * `\p{L}\p{N}` subset of ASCII), so every existing oracle stays
  * hash-exact. Combining marks (`\p{M}`) separate tokens in BOTH
  * engines — run NFC normalization ([[NfcNormalize]]) first on
  * decomposed text, which is the documented multilingual pre-pass.
  */
case class UnicodeTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unicode_tokens"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unicode_tokens expects a string column, got ${child.dataType.catalogString}")

  def compute(v: Any): ArrayData = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    val out = new java.util.ArrayList[Any]()
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      if (UnicodeTokens.isCjk(cp)) {
        if (sb.length > 0) { out.add(UTF8String.fromString(sb.toString)); sb.setLength(0) }
        out.add(UTF8String.fromString(new String(Character.toChars(lc))))
      } else if (UnicodeTokens.isWordCp(lc)) {
        sb.appendCodePoint(lc)
      } else if (sb.length > 0) {
        out.add(UTF8String.fromString(sb.toString)); sb.setLength(0)
      }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out.add(UTF8String.fromString(sb.toString))
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokensExpr", this, classOf[UnicodeTokens].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object UnicodeTokens {
  /** `\p{L}` ∪ `\p{N}` by general category — the RE2 class the oracle
    * regex uses (Character.isLetter covers Lu/Ll/Lt/Lm/Lo exactly).
    */
  def isWordCp(cp: Int): Boolean = {
    if (Character.isLetter(cp)) true
    else {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }
  }

  /** Han / Hiragana / Katakana — the scripts tokenized per codepoint.
    * ASCII fast-path first: crawl corpora are letter-dominated and
    * `UnicodeScript.of` is a binary search per call.
    */
  def isCjk(cp: Int): Boolean =
    cp >= 0x2E80 && {
      val sc = Character.UnicodeScript.of(cp)
      sc == Character.UnicodeScript.HAN || sc == Character.UnicodeScript.HIRAGANA ||
        sc == Character.UnicodeScript.KATAKANA
    }
}
