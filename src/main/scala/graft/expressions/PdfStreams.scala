package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** PDF stream-object slicer — the same length-driven-split discipline
  * as the WARC kernel, one level down: a PDF content stream's bytes
  * are arbitrary (FlateDecode output contains anything, including the
  * literal `endstream`), so slicing MUST follow the dictionary's
  * declared `/Length`, never pattern-match inside the data. The walk
  * is byte-level because casting the payload to a string corrupts
  * offsets past the first non-UTF-8 byte.
  *
  * Emits the raw (still-compressed) bytes of each stream object in
  * order; decompression composes with `zlib_inflate` downstream. Null
  * (never a throw) on a malformed length, a stream overrunning the
  * payload, or a missing `endstream` terminator.
  */
object PdfStreamsKernel {
  val MaxStreams = 4096

  private val Len = "/Length ".getBytes("US-ASCII")
  private val Stream = "stream".getBytes("US-ASCII")
  private val EndStream = "endstream".getBytes("US-ASCII")

  private def indexOf(p: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val last = p.length - pat.length
    while (i <= last) {
      var j = 0
      while (j < pat.length && p(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  def streams(p: Array[Byte]): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var pos = 0
    while (pos < p.length) {
      val lenAt = indexOf(p, Len, pos)
      if (lenAt < 0) {
        return new GenericArrayData(out.toArray[Any])
      }
      var i = lenAt + Len.length
      var n = 0L
      var digits = 0
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        n = n * 10 + (p(i) - '0')
        digits += 1
        if (n > Int.MaxValue) return null
        i += 1
      }
      if (digits == 0) return null
      val kw = indexOf(p, Stream, i)
      if (kw < 0) return null
      var ds = kw + Stream.length
      // EOL after the keyword: CRLF or LF (ISO 32000 §7.3.8.1)
      if (ds < p.length && p(ds) == '\r') ds += 1
      if (ds >= p.length || p(ds) != '\n') return null
      ds += 1
      val de = ds + n
      if (de > p.length) return null
      // `endstream` after the declared bytes (optional EOL between)
      var es = de.toInt
      if (es < p.length && p(es) == '\r') es += 1
      if (es < p.length && p(es) == '\n') es += 1
      if (indexOf(p, EndStream, es) != es) return null
      if (out.length >= MaxStreams) return null
      out += java.util.Arrays.copyOfRange(p, ds.toInt, de.toInt)
      pos = es + EndStream.length
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `pdf_streams(payload) → array<binary>` — declared-`/Length` slices
  * of every stream object; see [[PdfStreamsKernel.streams]].
  */
case class PdfStreams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pdf_streams"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    PdfStreamsKernel.streams(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.PdfStreamsKernel.streams($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
