package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE segmentation of a word-token array with a LEARNED merge list
  * (Sennrich et al. 2016): each word starts as its character sequence
  * and every merge rule is applied greedily left-to-right, in training
  * order — the exact fold [[graft.text.Bpe.train]]'s distributed merge
  * step performs, so encoding the training vocabulary reproduces the
  * trained symbol table bit-for-bit (spec'd). Output is the flattened
  * subword sequence across words, in order.
  *
  * The merge table is baked into the expression instance (≤ a few
  * hundred rules — plan-literal scale, the classifier-weights
  * pattern); codegen goes through [[computeEncode]] like
  * [[WordShingles]] — one native call per row inside whole-stage
  * codegen, no UDF serialization boundary.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  // merge parts as UTF8String once per executor instance, not per row
  @transient private lazy val mergeParts: Array[(UTF8String, UTF8String, UTF8String)] =
    merges.map { case (a, b) =>
      (UTF8String.fromString(a), UTF8String.fromString(b), UTF8String.fromString(a + b))
    }.toArray

  /** Greedy left-to-right application of one merge rule to a symbol
    * buffer (in place, returns new length). The fold: a window
    * (last == a, next == b) collapses to ab; the collapsed symbol is
    * immediately eligible as the `a` of the SAME rule again only via a
    * fresh window — exactly the list-fold semantics of the training
    * step.
    */
  private def applyMerge(syms: Array[UTF8String], n: Int,
      a: UTF8String, b: UTF8String, ab: UTF8String): Int = {
    var w = 0; var r = 0
    while (r < n) {
      if (w > 0 && syms(w - 1) == a && syms(r) == b) {
        syms(w - 1) = ab
      } else {
        syms(w) = syms(r); w += 1
      }
      r += 1
    }
    w
  }

  def computeEncode(v: Any): ArrayData = {
    val toks = v.asInstanceOf[ArrayData]
    val nWords = toks.numElements()
    val out = new java.util.ArrayList[Any](nWords * 2)
    var wi = 0
    while (wi < nWords) {
      val word = toks.getUTF8String(wi)
      val nc = word.numChars()
      var syms = new Array[UTF8String](nc)
      var i = 0
      while (i < nc) { syms(i) = word.substring(i, i + 1); i += 1 }
      var n = nc
      var m = 0
      while (m < mergeParts.length && n > 1) {
        val (a, b, ab) = mergeParts(m)
        n = applyMerge(syms, n, a, b, ab)
        m += 1
      }
      i = 0
      while (i < n) { out.add(syms(i)); i += 1 }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = computeEncode(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeExpr", this, classOf[BpeEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.computeEncode($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
