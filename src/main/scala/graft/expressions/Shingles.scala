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

/** Winnowing fingerprints of a positional shingle sequence: hash every
  * shingle with EXACTLY `hex64(concat("wn|", s))` (= the first 15 hex
  * chars of the md5 as a bigint — the oracle's formula, see
  * `OracleSql.winnowFpCte`), slide a `window`-wide minimum, return the
  * distinct minima sorted ascending. One native pass per document
  * instead of a per-element `transform(hex64)` lambda plus
  * `array_min(slice(...))` allocations per window position (the
  * [[WordShingles]] / HammingDistance interpreted-HOF lesson — the
  * lambda form measured text_containment at 3.3× its window-form
  * cost; this one-pass kernel is what makes the window-free winnow
  * also the FAST winnow).
  *
  * Fewer shingles than `window` → empty array (no full window exists),
  * matching the windowed formulation's `pos <= n_sh - (window-1)`
  * filter.
  */
case class WinnowFingerprints(child: Expression, window: Int)
    extends UnaryExpression {
  require(window > 0, "winnow window must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  def compute(v: Any): ArrayData = {
    val sh = v.asInstanceOf[ArrayData]
    val n = sh.numElements()
    if (n < window) return new GenericArrayData(Array.empty[Any])
    val md = WinnowFingerprints.md5.get()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(WinnowFingerprints.Prefix)
      md.update(sh.getUTF8String(i).getBytes)
      val d = md.digest()
      // first 60 bits of the digest, unsigned = conv(substring(hex,1,15),16,10)
      hs(i) = java.nio.ByteBuffer.wrap(d).getLong >>> 4
      i += 1
    }
    val m = n - window + 1
    val mins = new Array[Long](m)
    i = 0
    while (i < m) {
      var mn = hs(i)
      var j = 1
      while (j < window) {
        val h = hs(i + j)
        if (h < mn) mn = h
        j += 1
      }
      mins(i) = mn
      i += 1
    }
    java.util.Arrays.sort(mins)
    val out = new Array[Any](m)
    var k = 0
    i = 0
    while (i < m) {
      if (k == 0 || mins(i) != out(k - 1).asInstanceOf[Long]) {
        out(k) = mins(i)
        k += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], k))
  }

  override def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowExpr", this, classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WinnowFingerprints {
  private val Prefix: Array[Byte] = "wn|".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}
