package graft.expressions

import java.util.zip.{DataFormatException, Deflater, Inflater}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** zlib (RFC 1950) round-trip kernels — the wrapped-stream siblings of
  * [[DeflateKernel]] (which is raw-DEFLATE and sizes only): PNG IDAT,
  * HTTP deflate bodies, and most stored-compressed corpus formats are
  * zlib-wrapped, so DECODING them inside a projection needs a real
  * inflate. One native stream per thread, reset between rows; output
  * hard-capped so a malicious bomb payload cannot balloon an executor
  * (the cap is part of the operator contract — an over-cap stream
  * returns null, the triage signal for "too big to decode inline").
  */
object ZlibKernel {
  val Level = 6

  private val defl: ThreadLocal[Deflater] = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(Level, false)
  }
  private val infl: ThreadLocal[Inflater] = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater(false)
  }
  private val buf: ThreadLocal[Array[Byte]] = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** zlib-compress `bytes` at the fixed level (deterministic for a
    * given input — zlib's output is a pure function of
    * (input, level, strategy, wrap)).
    */
  def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = defl.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val b = buf.get()
    val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length / 2))
    while (!d.finished()) {
      val n = d.deflate(b)
      out.write(b, 0, n)
    }
    out.toByteArray
  }

  /** Inflate a zlib stream, or null when the stream is corrupt,
    * truncated, or would exceed `maxLen` bytes (bomb guard).
    */
  def inflate(bytes: Array[Byte], maxLen: Int): Array[Byte] = {
    val inf = infl.get()
    inf.reset()
    inf.setInput(bytes)
    val b = buf.get()
    val out = new java.io.ByteArrayOutputStream(math.min(maxLen, 8192))
    try {
      while (!inf.finished()) {
        if (inf.needsInput()) return null // truncated stream
        val n = inf.inflate(b)
        if (n == 0 && !inf.finished()) return null // stalled (corrupt)
        if (out.size() + n > maxLen) return null // bomb guard
        out.write(b, 0, n)
      }
      out.toByteArray
    } catch {
      case _: DataFormatException => null
    }
  }
}

/** `zlib_deflate(binary|string) → binary` — deterministic zlib
  * compression at the fixed kernel level. The synthesis-side inverse
  * of [[ZlibInflate]] (test corpora with REAL compressed payloads),
  * and the at-rest compaction primitive for blob columns.
  */
case class ZlibDeflate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "zlib_deflate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary input, got $other")
  }

  override def nullSafeEval(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => ZlibKernel.deflate(s.getBytes)
    case b: Array[Byte] => ZlibKernel.deflate(b)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val conv = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case _ => (c: String) => c
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ZlibKernel.deflate(${conv(c)});")
  }

  override protected def withNewChildInternal(newChild: Expression): ZlibDeflate =
    copy(child = newChild)
}

/** `zlib_inflate(binary, maxLen) → binary` — decode a zlib stream
  * inside a projection; NULL (never an exception, never unbounded
  * memory) on corrupt/truncated/over-`maxLen` input. `maxLen` is a
  * plan literal: the decode budget is part of the operator, visible
  * in the plan, not runtime-data-controlled.
  */
case class ZlibInflate(child: Expression, maxLen: Int) extends UnaryExpression {
  require(maxLen > 0, s"maxLen=$maxLen must be positive")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "zlib_inflate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ZlibKernel.inflate(v.asInstanceOf[Array[Byte]], maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.expressions.ZlibKernel.inflate($c, $maxLen);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ZlibInflate =
    copy(child = newChild)
}
