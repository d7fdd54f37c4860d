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
  *
  * `/Length` may be an INDIRECT reference (`/Length 5 0 R` — ISO
  * 32000 §7.3.10, extremely common in write-once producers that
  * stream the data before knowing its size): the referenced integer
  * lives in its own `5 0 obj` body elsewhere in the SAME file, so the
  * kernel resolves it with a boundary-checked scan for `N G obj` and
  * slices with the resolved value. An unresolvable reference (corrupt
  * file) skips THAT stream object — resuming after its `endstream` —
  * instead of nulling the whole blob.
  */
object PdfStreamsKernel {
  val MaxStreams = 4096

  private val Len = "/Length ".getBytes("US-ASCII")
  private val Stream = "stream".getBytes("US-ASCII")
  private val EndStream = "endstream".getBytes("US-ASCII")

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\r' || b == '\n' || b == '\f' || b == 0

  /** Value of the integer object `obj gen obj … endobj`, or -1. */
  private def resolveIndirect(p: Array[Byte], obj: Long, gen: Long): Long = {
    val pat = (obj.toString + " " + gen.toString + " obj").getBytes("US-ASCII")
    var from = 0
    while (from <= p.length - pat.length) {
      val at = indexOf(p, pat, from)
      if (at < 0) return -1L
      // digit boundary before the match: `15 0 obj` must not resolve
      // a lookup for object 5
      if (at == 0 || p(at - 1) < '0' || p(at - 1) > '9') {
        var i = at + pat.length
        while (i < p.length && isWs(p(i))) i += 1
        var v = 0L
        var d = 0
        while (i < p.length && p(i) >= '0' && p(i) <= '9') {
          v = v * 10 + (p(i) - '0')
          d += 1
          if (v > Int.MaxValue) return -1L
          i += 1
        }
        return if (d > 0) v else -1L
      }
      from = at + 1
    }
    -1L
  }

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
      // indirect form `/Length N G R`: the digits we just read are an
      // object number — look ahead for `G R`, resolve N's own integer
      // object, and slice with the resolved length
      var skipTo = -1L // ≥ 0: skip this stream object, resume there
      locally {
        var j = i
        while (j < p.length && isWs(p(j))) j += 1
        var g = 0L
        var gd = 0
        while (j < p.length && p(j) >= '0' && p(j) <= '9') {
          g = g * 10 + (p(j) - '0')
          gd += 1
          if (g > Int.MaxValue) return null
          j += 1
        }
        if (gd > 0) {
          var m = j
          while (m < p.length && isWs(p(m))) m += 1
          if (m < p.length && p(m) == 'R' &&
              (m + 1 >= p.length || isWs(p(m + 1)) || p(m + 1) == '/' ||
                p(m + 1) == '>')) {
            val resolved = resolveIndirect(p, n, g)
            if (resolved >= 0) {
              n = resolved
              i = m + 1
            } else {
              // unresolvable reference: drop this object only,
              // resuming after its endstream (or end the walk)
              val kw2 = indexOf(p, Stream, m + 1)
              val es2 =
                if (kw2 < 0) -1 else indexOf(p, EndStream, kw2 + Stream.length)
              skipTo = if (es2 < 0) p.length.toLong
                       else (es2 + EndStream.length).toLong
            }
          }
        }
      }
      if (skipTo >= 0) {
        pos = skipTo.toInt
      } else {
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
