package graft.expressions

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ZIP (APPNOTE) archive kernels — the container office documents,
  * epubs, jars and many dataset dumps actually arrive in. The walk
  * goes through the CENTRAL DIRECTORY, never by scanning local
  * headers: local headers may defer sizes to data descriptors and
  * their extra fields legally differ from the central record's, so
  * the only authoritative map is EOCD → central directory → per-entry
  * local-header offset (the same declared-length discipline as the
  * WARC/PDF walks). Entries decompress inline (stored, or raw-DEFLATE
  * through one native Inflater per thread) with the central record's
  * CRC32 verified — a corrupt entry nulls the whole blob, never a
  * throw, never a silent truncation. Per-entry output is
  * bomb-guarded by a plan-literal budget.
  */
object ZipKernel {
  val MaxEntries = 65536

  private val infl: ThreadLocal[Inflater] = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater(true)
  }
  private val defl: ThreadLocal[Deflater] = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(ZlibKernel.Level, true)
  }
  private val buf: ThreadLocal[Array[Byte]] = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  private def u16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
  private def u32(p: Array[Byte], off: Int): Long =
    (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)

  /** Decompressed `(name, data)` rows for every entry, or null. */
  def entries(p: Array[Byte], maxLen: Int): ArrayData = {
    // EOCD: scan backward (the comment field makes the tail variable)
    if (p.length < 22) return null
    var eocd = -1
    var i = p.length - 22
    val lo = math.max(0, p.length - 22 - 65535)
    while (eocd < 0 && i >= lo) {
      if (p(i) == 'P' && p(i + 1) == 'K' && p(i + 2) == 5 && p(i + 3) == 6 &&
          22 + u16(p, i + 20) == p.length - i) eocd = i
      else i -= 1
    }
    if (eocd < 0) return null
    val n = u16(p, eocd + 10)
    val cdOff = u32(p, eocd + 16)
    // the 46-byte central-record minimum only applies when there ARE
    // entries — a structurally valid EMPTY archive (EOCD only, n = 0,
    // cdOff == eocd offset, cdSize 0) must yield an empty array, not
    // null; the per-entry loop re-checks pos + 46 for every record
    if (n > MaxEntries || cdOff > p.length ||
      (n > 0 && cdOff + 46L > p.length)) return null
    val out = new Array[Any](n)
    var pos = cdOff.toInt
    var e = 0
    while (e < n) {
      if (pos + 46 > p.length) return null
      if (!(p(pos) == 'P' && p(pos + 1) == 'K' && p(pos + 2) == 1 && p(pos + 3) == 2))
        return null
      val method = u16(p, pos + 10)
      val crc = u32(p, pos + 16)
      val csize = u32(p, pos + 20)
      val usize = u32(p, pos + 24)
      val nameLen = u16(p, pos + 28)
      val extraLen = u16(p, pos + 30)
      val commentLen = u16(p, pos + 32)
      val lhOff = u32(p, pos + 42)
      if (usize > maxLen || csize > Int.MaxValue) return null
      if (pos + 46 + nameLen > p.length) return null
      val name = new String(p, pos + 46, nameLen, "UTF-8")
      // local header: its OWN name/extra lengths position the data
      if (lhOff + 30 > p.length) return null
      val lh = lhOff.toInt
      if (!(p(lh) == 'P' && p(lh + 1) == 'K' && p(lh + 2) == 3 && p(lh + 3) == 4))
        return null
      val dataOff = lh + 30 + u16(p, lh + 26) + u16(p, lh + 28)
      if (dataOff + csize > p.length) return null
      val data: Array[Byte] = method match {
        case 0 => // stored
          if (csize != usize) return null
          java.util.Arrays.copyOfRange(p, dataOff, (dataOff + csize).toInt)
        case 8 => // deflate
          val inf = infl.get()
          inf.reset()
          inf.setInput(p, dataOff, csize.toInt)
          val b = buf.get()
          val bos = new java.io.ByteArrayOutputStream(
            math.min(maxLen, math.max(64, usize.toInt)))
          try {
            while (!inf.finished()) {
              if (inf.needsInput()) return null
              val k = inf.inflate(b)
              if (k == 0 && !inf.finished()) return null
              if (bos.size() + k > maxLen) return null
              bos.write(b, 0, k)
            }
          } catch {
            case _: DataFormatException => return null
          }
          bos.toByteArray
        case _ => return null // unsupported method
      }
      if (data.length.toLong != usize) return null
      val c = new CRC32()
      c.update(data, 0, data.length)
      if (c.getValue != crc) return null
      out(e) = InternalRow(UTF8String.fromString(name), data)
      pos += 46 + nameLen + extraLen + commentLen
      e += 1
    }
    new GenericArrayData(out)
  }

  /** One deterministic archive: entries in order (method 0 stored or
    * 8 raw-DEFLATE at the fixed kernel level), local headers with
    * real sizes, a central directory, and the EOCD. The writer face /
    * synthesis device — `entries ∘ build` is identity.
    */
  def build(names: Array[Array[Byte]], datas: Array[Array[Byte]],
      methods: Array[Int]): Array[Byte] = {
    require(names.length == datas.length && names.length == methods.length)
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    val offsets = new Array[Long](names.length)
    val crcs = new Array[Long](names.length)
    val comps = new Array[Array[Byte]](names.length)
    var e = 0
    while (e < names.length) {
      val data = datas(e)
      val c = new CRC32(); c.update(data, 0, data.length)
      crcs(e) = c.getValue
      comps(e) = methods(e) match {
        case 0 => data
        case 8 =>
          val d = defl.get()
          d.reset(); d.setInput(data); d.finish()
          val b = buf.get()
          val bos = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
          while (!d.finished()) bos.write(b, 0, d.deflate(b))
          bos.toByteArray
        case m => throw new IllegalArgumentException(s"method $m")
      }
      offsets(e) = out.size().toLong
      out.write('P'); out.write('K'); out.write(3); out.write(4)
      w16(20); w16(0); w16(methods(e)); w16(0); w16(0)
      w32(crcs(e)); w32(comps(e).length.toLong); w32(data.length.toLong)
      w16(names(e).length); w16(0)
      out.write(names(e)); out.write(comps(e))
      e += 1
    }
    val cdStart = out.size().toLong
    e = 0
    while (e < names.length) {
      out.write('P'); out.write('K'); out.write(1); out.write(2)
      w16(20); w16(20); w16(0); w16(methods(e)); w16(0); w16(0)
      w32(crcs(e)); w32(comps(e).length.toLong); w32(datas(e).length.toLong)
      w16(names(e).length); w16(0); w16(0); w16(0); w16(0)
      w32(0); w32(offsets(e))
      out.write(names(e))
      e += 1
    }
    val cdSize = out.size() - cdStart
    out.write('P'); out.write('K'); out.write(5); out.write(6)
    w16(0); w16(0); w16(names.length); w16(names.length)
    w32(cdSize); w32(cdStart); w16(0)
    out.toByteArray
  }
}

/** `zip_entries(blob, maxLen) → array<struct<name string, data
  * binary>>` — CRC-verified decompressed entries; see
  * [[ZipKernel.entries]].
  */
case class ZipEntries(child: Expression, maxLen: Int) extends UnaryExpression {
  require(maxLen > 0, s"maxLen=$maxLen must be positive")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("data", BinaryType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "zip_entries"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    ZipKernel.entries(d.asInstanceOf[Array[Byte]], maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.ZipKernel.entries($d, $maxLen);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `zip_build(array<string> names, array<binary> datas, array<int>
  * methods) → binary` — see [[ZipKernel.build]].
  */
case class ZipBuild(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "zip_build"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(BinaryType, _),
          ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<binary>, array<int>), got $other")
    }

  override def nullSafeEval(n: Any, d: Any, m: Any): Any = {
    val na = n.asInstanceOf[ArrayData]
    val names = Array.tabulate(na.numElements())(i => na.getUTF8String(i).getBytes)
    val da = d.asInstanceOf[ArrayData]
    val datas = Array.tabulate(da.numElements())(i => da.getBinary(i))
    ZipKernel.build(names, datas, m.asInstanceOf[ArrayData].toIntArray())
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, d, m) => s"""
      |byte[][] gzn = new byte[$n.numElements()][];
      |for (int gi = 0; gi < $n.numElements(); gi++) {
      |  gzn[gi] = $n.getUTF8String(gi).getBytes();
      |}
      |byte[][] gzd = new byte[$d.numElements()][];
      |for (int gi = 0; gi < $d.numElements(); gi++) {
      |  gzd[gi] = $d.getBinary(gi);
      |}
      |${ev.value} = graft.expressions.ZipKernel.build(gzn, gzd, $m.toIntArray());
      |""".stripMargin)

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}
