package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Expand a 72-entry tile grid (9×8 tiles of 8×8 pixels) into the
  * 72×64 row-major pixel raster the image-dedup gate corpus plants —
  * as ONE codegen kernel call instead of a 4608-element interpreted
  * `transform` lambda per row (the mm_png_pixels lesson from r13:
  * Catalyst HOFs run interpreted, and a per-pixel HOF in a synth
  * column dominates the driver row's cost). `argb = 1` emits opaque
  * gray ARGB words (the VP8L encoder's input); `argb = 0` raw gray
  * values (the TIFF encoder's input).
  */
object TileExpandKernel {
  val GridW = 9
  val GridH = 8
  val Tile = 8
  val W: Int = GridW * Tile
  val H: Int = GridH * Tile

  def expand(tiles: ArrayData, argb: Int): ArrayData = {
    if (tiles == null || tiles.numElements() < GridW * GridH) return null
    val out = new Array[Any](W * H)
    var i = 0
    while (i < W * H) {
      val tileIdx = (i / (W * Tile)) * GridW + (i / Tile) % GridW
      val v = tiles.getInt(tileIdx) & 0xFF
      out(i) =
        if (argb != 0) 0xFF000000 | (v << 16) | (v << 8) | v
        else v
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `tile_expand(tiles, argb) → array<int>`; see
  * [[TileExpandKernel.expand]].
  */
case class TileExpand(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "tile_expand"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, int) input, got $other")
    }

  override def nullSafeEval(t: Any, a: Any): Any =
    TileExpandKernel.expand(t.asInstanceOf[ArrayData], a.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a) => s"""
      |${ev.value} = graft.expressions.TileExpandKernel.expand($t, $a);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}
