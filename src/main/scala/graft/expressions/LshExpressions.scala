package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.lsh.RandomProjection

/** Banded sign-random-projection LSH signatures (reference:
  * lshrs/hash/lsh.py:96 hash_vector / :171 _project_and_pack).
  *
  * Input: `array<float|double>` vector of length `dim`.
  * Output: `array<long>` of `numBands` band signatures; bit i of a
  * band's long is `plane_i · v > 0` (the reference packs bits
  * little-endian into bytes — an int64 is the same thing capped at 64
  * rows/band, which covers every precomputed reference config).
  *
  * Planes are a pure function of (seed, band, row, j) — each executor
  * materializes them lazily once per JVM; nothing is shipped with the
  * plan and map tasks need no shuffle or broadcast. Codegen emits a
  * single virtual call per row into the tight matmul loop below, so
  * the operator stays inside whole-stage codegen.
  */
case class LshBandSignatures(
    child: Expression,
    numBands: Int,
    rowsPerBand: Int,
    dim: Int,
    seed: Long)
  extends UnaryExpression {

  require(numBands > 0 && rowsPerBand > 0 && dim > 0, "LSH params must be positive")
  require(rowsPerBand <= 64, "rowsPerBand must fit an int64 signature")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_signatures"

  @transient private lazy val et = VecUtil.elementType(child.dataType)
  @transient private lazy val planes: Array[Array[Double]] =
    RandomProjection.planes(seed, numBands, rowsPerBand, dim)

  /** Tight loop shared by interpreted eval and generated code. */
  def computeSignature(v: Any): ArrayData = {
    val a = v.asInstanceOf[ArrayData]
    // a vector that disagrees with the configured dim is a data error —
    // the reference raises on dim mismatch rather than hash garbage
    VecUtil.requireSameDim(prettyName, a.numElements(), dim)
    val n = dim
    // materialize the vector once (ArrayData getters are megamorphic)
    val x = new Array[Double](n)
    var j = 0
    while (j < n) { x(j) = VecUtil.get(et, a, j); j += 1 }
    val sigs = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      val p = planes(b)
      var sig = 0L
      var r = 0
      while (r < rowsPerBand) {
        var dot = 0.0
        val off = r * dim
        var i = 0
        while (i < n) { dot += p(off + i) * x(i); i += 1 }
        if (dot > 0.0) sig |= (1L << r)
        r += 1
      }
      sigs(b) = sig
      b += 1
    }
    new GenericArrayData(sigs)
  }

  override def nullSafeEval(v: Any): Any = computeSignature(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshExpr", this, classOf[LshBandSignatures].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.computeSignature($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Arbitrary-width band signatures: the same banded sign projection as
  * [[LshBandSignatures]], packed little-endian into `ceil(r/8)` BYTES
  * per band (`array<binary>`) — the reference's exact signature layout
  * (lshrs/hash/lsh.py:171 `_project_and_pack`: bit i of the band →
  * byte i/8, bit position i%8), with no 64-row cap. This closes the
  * one parameter-domain difference vs the reference: `rowsPerBand > 64`
  * configs hash here instead of being rejected. For r ≤ 64 the long
  * variant stays the serving default (an int64 groups/joins cheaper
  * than bytes); bit-for-bit agreement between the two packings is
  * spec-pinned in LshSpec.
  */
case class LshBandSignaturesWide(
    child: Expression,
    numBands: Int,
    rowsPerBand: Int,
    dim: Int,
    seed: Long)
  extends UnaryExpression {

  require(numBands > 0 && rowsPerBand > 0 && dim > 0, "LSH params must be positive")

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "lsh_band_signatures_wide"

  @transient private lazy val et = VecUtil.elementType(child.dataType)
  @transient private lazy val planes: Array[Array[Double]] =
    RandomProjection.planes(seed, numBands, rowsPerBand, dim)

  /** Tight loop shared by interpreted eval and generated code. */
  def computeSignature(v: Any): ArrayData = {
    val a = v.asInstanceOf[ArrayData]
    VecUtil.requireSameDim(prettyName, a.numElements(), dim)
    val n = dim
    val x = new Array[Double](n)
    var j = 0
    while (j < n) { x(j) = VecUtil.get(et, a, j); j += 1 }
    val nBytes = (rowsPerBand + 7) / 8
    val sigs = new Array[Any](numBands)
    var b = 0
    while (b < numBands) {
      val p = planes(b)
      val bytes = new Array[Byte](nBytes)
      var r = 0
      while (r < rowsPerBand) {
        var dot = 0.0
        val off = r * dim
        var i = 0
        while (i < n) { dot += p(off + i) * x(i); i += 1 }
        if (dot > 0.0) bytes(r >> 3) = (bytes(r >> 3) | (1 << (r & 7))).toByte
        r += 1
      }
      sigs(b) = bytes
      b += 1
    }
    new GenericArrayData(sigs)
  }

  override def nullSafeEval(v: Any): Any = computeSignature(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshWideExpr", this, classOf[LshBandSignaturesWide].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.computeSignature($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
