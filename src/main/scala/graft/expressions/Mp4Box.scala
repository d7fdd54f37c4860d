package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** ISO BMFF (MP4/MOV) box-walk kernel — the video-container sibling
  * of [[JpegKernel.sofOffset]]: boxes are `[u32 BE size][4cc type]`
  * headers, nested (`moov` contains `mvhd`, …), with two size escape
  * hatches (size 1 → a 64-bit extended size follows; size 0 → box
  * runs to EOF). Like the JPEG walk, the kernel ONLY locates — it
  * hops O(#boxes) headers down one path and returns the 1-based
  * offset of the matched box's size field; every field read after is
  * a fixed RELATIVE offset done declaratively (`substr`+`conv` BE
  * reads), so the parse stays one codegen projection.
  *
  * -1 (→ NULL) when the payload is not BMFF-shaped at the walk's
  * level, the path is absent, or any header is truncated/overruns.
  */
object Mp4BoxKernel {
  /** 1-based offset of the box addressed by `path` (e.g. "moov/mvhd"),
    * or -1.
    */
  def boxOffset(p: Array[Byte], path: String): Long = {
    var lo = 0L
    var hi = p.length.toLong
    val parts = path.split('/')
    var depth = 0
    while (depth < parts.length) {
      val want = parts(depth)
      var pos = lo
      var found = -1L
      while (found < 0 && pos + 8 <= hi) {
        var size = ((p(pos.toInt) & 0xFFL) << 24) |
          ((p(pos.toInt + 1) & 0xFFL) << 16) |
          ((p(pos.toInt + 2) & 0xFFL) << 8) | (p(pos.toInt + 3) & 0xFFL)
        val t = new String(p, pos.toInt + 4, 4, "ISO-8859-1")
        var header = 8L
        if (size == 1L) { // 64-bit largesize
          if (pos + 16 > hi) return -1L
          size = 0L
          var i = 0
          while (i < 8) {
            size = (size << 8) | (p(pos.toInt + 8 + i) & 0xFFL)
            i += 1
          }
          header = 16L
        } else if (size == 0L) { // to end of enclosing scope
          size = hi - pos
        }
        if (size < header || pos + size > hi) return -1L
        if (t == want) {
          if (depth == parts.length - 1) return pos + 1
          found = pos
          // descend: children start after the header
          lo = pos + header
          hi = pos + size
        } else {
          pos += size
        }
      }
      if (found < 0 && depth == parts.length) return -1L
      if (found < 0) return -1L
      depth += 1
    }
    -1L
  }

  /** Number of top-level boxes, or -1 on a malformed walk. */
  def topLevelCount(p: Array[Byte]): Long = {
    var pos = 0L
    var n = 0L
    while (pos + 8 <= p.length) {
      var size = ((p(pos.toInt) & 0xFFL) << 24) |
        ((p(pos.toInt + 1) & 0xFFL) << 16) |
        ((p(pos.toInt + 2) & 0xFFL) << 8) | (p(pos.toInt + 3) & 0xFFL)
      if (size == 1L) {
        if (pos + 16 > p.length) return -1L
        size = 0L
        var i = 0
        while (i < 8) {
          size = (size << 8) | (p(pos.toInt + 8 + i) & 0xFFL)
          i += 1
        }
        if (size < 16L) return -1L
      } else if (size == 0L) {
        size = p.length - pos
      } else if (size < 8L) return -1L
      if (pos + size > p.length) return -1L
      pos += size
      n += 1
    }
    if (pos != p.length || n == 0) -1L else n
  }
}

/** `mp4_box_offset(payload) → bigint` for an operator-constant path;
  * see [[Mp4BoxKernel.boxOffset]].
  */
case class Mp4BoxOffset(child: Expression, path: String)
    extends UnaryExpression {
  require(path.nonEmpty && path.split('/').forall(_.length == 4),
    s"BMFF path segments must be 4cc codes: '$path'")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "mp4_box_offset"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any = {
    val off = Mp4BoxKernel.boxOffset(d.asInstanceOf[Array[Byte]], path)
    if (off < 0) null else off
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("mp4path", path, "java.lang.String")
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.Mp4BoxKernel.boxOffset($d, $pathRef);
      |if (${ev.value} < 0) { ${ev.isNull} = true; }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `mp4_top_boxes(payload) → bigint` — top-level box count of a
  * cleanly-partitioned BMFF stream; see [[Mp4BoxKernel.topLevelCount]].
  */
case class Mp4TopBoxes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "mp4_top_boxes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any = {
    val n = Mp4BoxKernel.topLevelCount(d.asInstanceOf[Array[Byte]])
    if (n < 0) null else n
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.Mp4BoxKernel.topLevelCount($d);
      |if (${ev.value} < 0) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
