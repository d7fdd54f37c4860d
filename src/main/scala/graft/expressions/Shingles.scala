package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct w-token shingles (word n-grams joined by single spaces) in
  * first-occurrence order — semantically `array_distinct(transform(...,
  * slice + array_join))` but one native pass per row instead of four
  * interpreted per-element lambda trees (measured ~50µs/shingle → ~1µs).
  */
case class WordShingles(child: Expression, width: Int, distinct: Boolean = true)
    extends UnaryExpression {
  require(width > 0, "shingle width must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")

  def computeShingles(v: Any): ArrayData = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < width) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet for set semantics; plain list keeps the positional
    // sequence (winnowing needs every occurrence in order)
    val seen: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String](math.max(16, n))
      else new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i <= n - width) {
      val parts = new Array[UTF8String](2 * width - 1)
      var j = 0
      while (j < width) {
        parts(2 * j) = toks.getUTF8String(i + j)
        if (j < width - 1) parts(2 * j + 1) = space
        j += 1
      }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = computeShingles(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shinglesExpr", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.computeShingles($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
