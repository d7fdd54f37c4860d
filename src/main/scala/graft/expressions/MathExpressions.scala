package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Natural log via `java.lang.Math.log` (the platform-intrinsic libm),
  * NOT Spark's built-in `log`, which routes through `StrictMath.log`
  * (fdlibm) and disagrees with C libm — and therefore with the DuckDB
  * oracle — by 1 ulp on some arguments. Operators whose oracle SQL uses
  * `ln` (e.g. BM25's idf) must use this expression for bit-exact
  * cross-engine comparison.
  */
case class IeeeLn(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ieee_ln"

  override def nullSafeEval(v: Any): Any = java.lang.Math.log(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = java.lang.Math.log($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
