package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** WARC stream splitter — the record walk a crawl-archive ingest runs
  * before anything else: records are delimited by their declared
  * `Content-Length`, NEVER by pattern matching (a body may legally
  * contain the literal `WARC/1.0`), so the split is an offset walk:
  * magic → header block (terminated by CRLFCRLF) → Content-Length →
  * skip body + the two record-trailing CRLFs → next record.
  *
  * Null (never a throw) on structural violations: bad magic, missing
  * header terminator, absent/negative Content-Length, a record
  * overrunning the payload, or more than [[MaxRecords]] records.
  */
object WarcSplitKernel {
  val MaxRecords = 65536

  private val Magic = "WARC/".getBytes("US-ASCII")
  private val Clen = "\r\nContent-Length:".getBytes("US-ASCII")

  private def indexOf(p: Array[Byte], pat: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    val last = until - pat.length
    while (i <= last) {
      var j = 0
      while (j < pat.length && p(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  /** Split a concatenated WARC stream into its records (each record =
    * header block + CRLFCRLF + body, trailing record separator
    * dropped), or null.
    */
  def split(p: Array[Byte]): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var pos = 0
    while (pos < p.length) {
      if (out.length >= MaxRecords) return null
      if (indexOf(p, Magic, pos, math.min(p.length, pos + Magic.length)) != pos)
        return null
      // header block ends at the first CRLFCRLF
      val he = indexOf(p, "\r\n\r\n".getBytes("US-ASCII"), pos, p.length)
      if (he < 0) return null
      // Content-Length within the header block
      val cl = indexOf(p, Clen, pos, he)
      if (cl < 0) return null
      var i = cl + Clen.length
      while (i < he && p(i) == ' ') i += 1
      var n = 0L
      var digits = 0
      while (i < he && p(i) >= '0' && p(i) <= '9') {
        n = n * 10 + (p(i) - '0')
        digits += 1
        if (n > Int.MaxValue) return null
        i += 1
      }
      if (digits == 0) return null
      val bodyEnd = he + 4 + n
      if (bodyEnd + 4 > p.length) return null // body + the two CRLFs
      if (!(p(bodyEnd.toInt) == '\r' && p(bodyEnd.toInt + 1) == '\n' &&
          p(bodyEnd.toInt + 2) == '\r' && p(bodyEnd.toInt + 3) == '\n'))
        return null
      out += java.util.Arrays.copyOfRange(p, pos, bodyEnd.toInt)
      pos = bodyEnd.toInt + 4
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `warc_split(payload) → array<binary>` of records — see
  * [[WarcSplitKernel.split]].
  */
case class WarcSplit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "warc_split"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    WarcSplitKernel.split(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.WarcSplitKernel.split($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
