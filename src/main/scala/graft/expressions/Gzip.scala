package graft.expressions

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Multi-member gzip (RFC 1952) kernels — the archive framing
  * web-scale corpora actually ship in: Common Crawl's `.warc.gz`
  * concatenates ONE gzip member per WARC record precisely so archives
  * can be split and records random-accessed without decompressing the
  * whole file. Ingest therefore needs a member walk (header with
  * optional FEXTRA/FNAME/FCOMMENT/FHCRC fields → raw-DEFLATE body →
  * CRC32 + ISIZE trailer), not a single-stream gunzip — JDK
  * GZIPInputStream hides member boundaries, and the boundary IS the
  * record boundary.
  *
  * One native Inflater per thread, reset between members; per-member
  * output hard-capped (bomb guard); CRC32 and ISIZE verified — a
  * corrupt member nulls the whole blob (never a throw, never a
  * silent truncation).
  */
object GzipKernel {
  val MaxMembers = 65536

  private val defl: ThreadLocal[Deflater] = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(ZlibKernel.Level, true)
  }
  private val infl: ThreadLocal[Inflater] = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater(true)
  }
  private val buf: ThreadLocal[Array[Byte]] = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** One deterministic gzip member: fixed 10-byte header (FLG 0,
    * MTIME 0, XFL 0, OS 255 "unknown"), raw DEFLATE at the fixed
    * kernel level, CRC32 + ISIZE trailer. Pure function of the input.
    */
  def compress(bytes: Array[Byte]): Array[Byte] = {
    val d = defl.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val b = buf.get()
    val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length / 2))
    out.write(0x1F); out.write(0x8B); out.write(8); out.write(0)
    out.write(0); out.write(0); out.write(0); out.write(0) // MTIME
    out.write(0); out.write(0xFF) // XFL, OS=unknown
    while (!d.finished()) {
      val n = d.deflate(b)
      out.write(b, 0, n)
    }
    val crc = new CRC32()
    crc.update(bytes, 0, bytes.length)
    val c = crc.getValue
    val isize = bytes.length.toLong & 0xFFFFFFFFL
    var i = 0
    while (i < 4) { out.write(((c >>> (8 * i)) & 0xFF).toInt); i += 1 }
    i = 0
    while (i < 4) { out.write(((isize >>> (8 * i)) & 0xFF).toInt); i += 1 }
    out.toByteArray
  }

  private def u16le(p: Array[Byte], off: Int): Int =
    (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)

  private def u32le(p: Array[Byte], off: Int): Long =
    (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)

  /** Split a concatenated multi-member gzip blob into its members'
    * decompressed contents, or null on any structural violation:
    * bad magic, non-DEFLATE CM, reserved FLG bits, truncated optional
    * fields, corrupt stream, CRC/ISIZE mismatch, a member exceeding
    * `maxLen`, or more than [[MaxMembers]] members.
    */
  def members(p: Array[Byte], maxLen: Int): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var pos = 0
    while (pos < p.length) {
      if (out.length >= MaxMembers) return null
      if (pos + 10 > p.length) return null
      if ((p(pos) & 0xFF) != 0x1F || (p(pos + 1) & 0xFF) != 0x8B) return null
      if ((p(pos + 2) & 0xFF) != 8) return null // CM must be DEFLATE
      val flg = p(pos + 3) & 0xFF
      if ((flg & 0xE0) != 0) return null // reserved bits
      var q = pos + 10
      if ((flg & 4) != 0) { // FEXTRA
        if (q + 2 > p.length) return null
        q += 2 + u16le(p, q)
        if (q > p.length) return null
      }
      if ((flg & 8) != 0) { // FNAME: zero-terminated
        while (q < p.length && p(q) != 0) q += 1
        if (q >= p.length) return null
        q += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (q < p.length && p(q) != 0) q += 1
        if (q >= p.length) return null
        q += 1
      }
      if ((flg & 2) != 0) { // FHCRC: 2-byte header CRC (not verified)
        q += 2
        if (q > p.length) return null
      }
      // raw-DEFLATE body
      val inf = infl.get()
      inf.reset()
      inf.setInput(p, q, p.length - q)
      val b = buf.get()
      val body = new java.io.ByteArrayOutputStream(math.min(maxLen, 8192))
      try {
        while (!inf.finished()) {
          if (inf.needsInput()) return null // truncated member
          val n = inf.inflate(b)
          if (n == 0 && !inf.finished()) return null // stalled (corrupt)
          if (body.size() + n > maxLen) return null // bomb guard
          body.write(b, 0, n)
        }
      } catch {
        case _: DataFormatException => return null
      }
      val consumed = (p.length - q) - inf.getRemaining
      val trailer = q + consumed
      if (trailer + 8 > p.length) return null
      val bytes = body.toByteArray
      val crc = new CRC32()
      crc.update(bytes, 0, bytes.length)
      if (u32le(p, trailer) != crc.getValue) return null
      if (u32le(p, trailer + 4) != (bytes.length.toLong & 0xFFFFFFFFL)) return null
      out += bytes
      pos = trailer + 8
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Inflate ALL members and return the concatenated contents — the
    * single-logical-stream view: a `.tgz` shard is ONE tar stream
    * that may ship as one gzip member or split at arbitrary byte
    * boundaries across many (pigz/bgzf emit per-block members), and
    * the tar walk needs the reassembled bytes. Same verdicts as
    * [[members]] (null on any structural violation); `maxLen` caps
    * the TOTAL output.
    */
  def concatMembers(p: Array[Byte], maxLen: Int): Array[Byte] = {
    val arr = members(p, maxLen)
    if (arr == null) return null
    var total = 0L
    var i = 0
    while (i < arr.numElements()) {
      total += arr.getBinary(i).length
      if (total > maxLen) return null
      i += 1
    }
    val out = new Array[Byte](total.toInt)
    var off = 0
    i = 0
    while (i < arr.numElements()) {
      val m = arr.getBinary(i)
      System.arraycopy(m, 0, out, off, m.length)
      off += m.length
      i += 1
    }
    out
  }
}

/** `gzip_compress(binary|string) → binary` — one deterministic gzip
  * member; the synthesis-side inverse of [[GzipMembers]] and the
  * member writer for `.warc.gz`-shaped archive sinks.
  */
case class GzipCompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_compress"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary input, got $other")
  }

  override def nullSafeEval(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => GzipKernel.compress(s.getBytes)
    case b: Array[Byte] => GzipKernel.compress(b)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val conv = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case _ => (c: String) => c
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.GzipKernel.compress(${conv(c)});")
  }

  override protected def withNewChildInternal(c: Expression): GzipCompress =
    copy(child = c)
}

/** `gzip_members(binary, maxLen) → array<binary>` — decompressed
  * member contents of a concatenated multi-member gzip blob; NULL on
  * corrupt/truncated/over-`maxLen` input. `maxLen` is a plan literal:
  * the per-member decode budget is part of the operator, visible in
  * the plan, not runtime-data-controlled.
  */
case class GzipMembers(child: Expression, maxLen: Int) extends UnaryExpression {
  require(maxLen > 0, s"maxLen=$maxLen must be positive")
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gzip_members"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    GzipKernel.members(v.asInstanceOf[Array[Byte]], maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.expressions.GzipKernel.members($c, $maxLen);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): GzipMembers =
    copy(child = c)
}

/** `gzip_concat(blob) → binary` — all members inflated and
  * concatenated; see [[GzipKernel.concatMembers]].
  */
case class GzipConcat(child: Expression, maxLen: Int) extends UnaryExpression {
  require(maxLen > 0, s"maxLen=$maxLen must be positive")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gzip_concat"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    GzipKernel.concatMembers(v.asInstanceOf[Array[Byte]], maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.expressions.GzipKernel.concatMembers($c, $maxLen);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): GzipConcat =
    copy(child = c)
}
