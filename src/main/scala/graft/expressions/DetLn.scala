package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Deterministic natural log, DEFINED (not borrowed from a libm):
  *
  *   k = clamp(floor(log₂ x), −64, 64)   (exponent extraction)
  *   m = x / 2ᵏ ∈ [1, 2)                 (exact power-of-two scaling)
  *   t = (m−1)/(m+1), u = t²             (t < 1/3)
  *   ln m ≈ 2t·Σ u^i/(2i+1), 25 terms    (atanh series, Horner)
  *   ln x = k·LN2 + ln m
  *
  * Why: libm implementations legitimately differ in the last ulp —
  * JVM `Math.log`, JVM `StrictMath.log` and glibc/DuckDB `ln` each
  * disagree on SOME arguments, so no native log can be hash-compared
  * across engines. This formulation uses only IEEE-defined basic ops
  * (+,−,×,÷, comparisons) in a fixed association order, so the SAME
  * algorithm generated as SQL ([[graft.OracleSql.detLn]]) is
  * bit-identical on any IEEE platform. Truncation error < 3⁻⁵¹;
  * total error vs true ln ≤ a few ulp — a deterministic score, not a
  * correctly-rounded libm replacement.
  *
  * Positive arguments must lie in [2⁻⁶⁴, 2⁶⁴] (count ratios always
  * do); outside that the clamp makes the result a consistent
  * extrapolation on both sides. Non-positive arguments yield NULL in
  * [[DetLnExpr]] and in the generated SQL alike.
  */
object DetLn {
  val MaxK = 64
  val LN2: Double = 0.6931471805599453
  val Coefs: Array[Double] = Array.tabulate(25)(i => 1.0 / (2 * i + 1))

  def ln(x: Double): Double = {
    var k = java.lang.Math.getExponent(x)
    if (k < -MaxK) k = -MaxK else if (k > MaxK) k = MaxK
    val m = x / java.lang.Math.scalb(1.0, k)
    val t = (m - 1.0) / (m + 1.0)
    val u = t * t
    var s = Coefs(Coefs.length - 1)
    var i = Coefs.length - 2
    while (i >= 0) { s = Coefs(i) + u * s; i -= 1 }
    k * LN2 + 2.0 * t * s
  }
}

case class DetLnExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "det_ln"

  // analysis-time type contract: a non-double child would otherwise
  // ClassCastException in interpreted eval but silently widen in codegen
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"det_ln requires DOUBLE input, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    if (x > 0) java.lang.Double.valueOf(DetLn.ln(x)) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c > 0) {
         |  ${ev.value} = graft.expressions.DetLn.ln($c);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
