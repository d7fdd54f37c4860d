package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static NFC kernel shared by interpreted eval and generated code.
  * `java.text.Normalizer` implements UAX #15 canonical composition —
  * the same algorithm DuckDB's `nfc_normalize` (utf8proc) and
  * Python's `unicodedata` implement, which is what makes the
  * normalization cross-engine oracle-checkable. The fast path is the
  * JDK's own `isNormalized` quick-check: ASCII and already-composed
  * text (the overwhelming share of a real crawl) never allocates.
  */
object NfcKernel {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(string) → string` — Unicode canonical composition
  * (NFC), the normalization step a multilingual corpus needs before
  * any hash-keyed operator: the SAME visible text arrives from the
  * web in composed and decomposed encodings (é vs e+◌́), and every
  * fingerprint/minhash/token hash in this engine is byte-keyed, so
  * un-normalized variants silently escape deduplication. Spark ships
  * no normalization function; this codegen kernel keeps the pass a
  * narrow whole-stage-codegen map — no UDF, no shuffle.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    NfcKernel.normalize(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.NfcKernel.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
