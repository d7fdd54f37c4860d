package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.lsh.RandomProjection

/** Johnson-Lindenstrauss Gaussian random projection to `outDim`
  * dimensions: `y_r = (1/√outDim) · Σ_j G(r,j)·x_j` with the SAME
  * seeded deterministic plane family as
  * [[LshBandSignatures]] (band 0, rowsPerBand = outDim) — the planes
  * are a pure function of (seed, row, j), so every executor
  * materializes them with no broadcast, and the DuckDB oracle embeds
  * them as literals with the identical left-to-right accumulation
  * order (bit-exact doubles; the sign-LSH signature IS this projection
  * with the magnitudes discarded).
  *
  * Dot accumulation is j = 0..dim−1 in order, then one scale multiply
  * — mirrored exactly by `OracleSql.dotSql`.
  */
case class GaussianProjectExpr(child: Expression, outDim: Int, dim: Int, seed: Long)
    extends UnaryExpression {

  require(outDim > 0 && dim > 0, "projection dims must be positive")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "gaussian_project"

  @transient private lazy val et = VecUtil.elementType(child.dataType)
  @transient private lazy val planes: Array[Double] =
    RandomProjection.bandPlanes(seed, 0, outDim, dim)
  private val invSqrt = 1.0 / math.sqrt(outDim.toDouble)

  def computeProjection(v: Any): ArrayData = {
    val a = v.asInstanceOf[ArrayData]
    VecUtil.requireSameDim(prettyName, a.numElements(), dim)
    val x = new Array[Double](dim)
    var j = 0
    while (j < dim) { x(j) = VecUtil.get(et, a, j); j += 1 }
    val out = new Array[Any](outDim)
    var r = 0
    while (r < outDim) {
      var dot = 0.0
      val off = r * dim
      var i = 0
      while (i < dim) { dot += planes(off + i) * x(i); i += 1 }
      out(r) = dot * invSqrt
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = computeProjection(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gaussianProjectExpr", this,
      classOf[GaussianProjectExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.computeProjection($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
