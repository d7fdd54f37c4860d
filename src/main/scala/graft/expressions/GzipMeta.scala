package graft.expressions

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Gzip container TRIAGE — the EIGHTEENTH family: where
  * [[GzipKernel.members]] extracts bodies for ingest (all-or-nothing,
  * a corrupt member nulls the blob), the triage tier walks the same
  * RFC 1952 member chain EMITTING VERDICTS — member count,
  * uncompressed byte total, FNAME-carrying member count, the first
  * member's MTIME (the field a crawl audit keys freshness on),
  * per-member CRC32 and ISIZE checks folded into `crc_ok` /
  * `isize_ok` integrity lanes (damage reported, not swallowed), and
  * wall-to-wall `consistent`. Detection is strict: 0x1F 0x8B 0x08 —
  * two control bytes plus the DEFLATE method id, text cannot route
  * here.
  *
  * Reference behavior: beyond-reference (lshrs reads parquet only);
  * gzip is the wire framing of `.warc.gz` / `.jsonl.gz` corpora.
  * Never throws; per-member and total output bomb-capped.
  */
object GzipMetaKernel {
  val MaxMembers = 65536
  val MaxTotalBytes: Long = 1L << 28
  val MaxMemberBytes: Int = 1 << 24

  def isGzip(p: Array[Byte]): Boolean =
    p.length >= 18 && (p(0) & 0xFF) == 0x1F && (p(1) & 0xFF) == 0x8B &&
      (p(2) & 0xFF) == 8

  private def u16le(p: Array[Byte], off: Int): Int =
    (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)

  private def u32le(p: Array[Byte], off: Int): Long =
    (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)

  /** Struct (gzip_valid, n_members, uncompressed_bytes, n_named,
    * first_mtime, crc_ok, isize_ok, consistent) or null for
    * non-gzip bytes.
    */
  def parse(p: Array[Byte]): InternalRow = {
    if (!isGzip(p)) return null
    var pos = 0
    var nMembers = 0L
    var total = 0L
    var nNamed = 0L
    var firstMtime = -1L
    var crcOk = true
    var isizeOk = true
    var consistent = true
    val inf = new Inflater(true)
    val b = new Array[Byte](8192)
    try {
      while (pos < p.length && consistent && nMembers < MaxMembers) {
        if (pos + 10 > p.length || (p(pos) & 0xFF) != 0x1F ||
            (p(pos + 1) & 0xFF) != 0x8B || (p(pos + 2) & 0xFF) != 8) {
          consistent = false
        } else {
          val flg = p(pos + 3) & 0xFF
          if ((flg & 0xE0) != 0) { consistent = false }
          else {
            if (nMembers == 0L) firstMtime = u32le(p, pos + 4)
            var q = pos + 10
            var broken = false
            if ((flg & 4) != 0) {
              if (q + 2 > p.length) broken = true
              else {
                q += 2 + u16le(p, q)
                if (q > p.length) broken = true
              }
            }
            if (!broken && (flg & 8) != 0) {
              nNamed += 1
              while (q < p.length && p(q) != 0) q += 1
              if (q >= p.length) broken = true else q += 1
            }
            if (!broken && (flg & 16) != 0) {
              while (q < p.length && p(q) != 0) q += 1
              if (q >= p.length) broken = true else q += 1
            }
            if (!broken && (flg & 2) != 0) {
              q += 2
              if (q > p.length) broken = true
            }
            if (broken) consistent = false
            else {
              inf.reset()
              inf.setInput(p, q, p.length - q)
              val crc = new CRC32()
              var mBytes = 0L
              var bodyBroken = false
              try {
                while (!inf.finished() && !bodyBroken) {
                  if (inf.needsInput()) bodyBroken = true
                  else {
                    val n = inf.inflate(b)
                    if (n == 0 && !inf.finished()) bodyBroken = true
                    else {
                      crc.update(b, 0, n)
                      mBytes += n
                      if (mBytes > MaxMemberBytes ||
                          total + mBytes > MaxTotalBytes) bodyBroken = true
                    }
                  }
                }
              } catch {
                case _: DataFormatException => bodyBroken = true
              }
              if (bodyBroken) consistent = false
              else {
                val consumed = (p.length - q) - inf.getRemaining
                val trailer = q + consumed
                if (trailer + 8 > p.length) consistent = false
                else {
                  if (u32le(p, trailer) != crc.getValue) crcOk = false
                  if (u32le(p, trailer + 4) != (mBytes & 0xFFFFFFFFL))
                    isizeOk = false
                  total += mBytes
                  nMembers += 1
                  pos = trailer + 8
                }
              }
            }
          }
        }
      }
    } finally inf.end()
    if (nMembers == 0L) return null
    if (nMembers >= MaxMembers) consistent = false
    new GenericInternalRow(Array[Any](
      true, nMembers, total, nNamed, firstMtime, crcOk, isizeOk, consistent))
  }
}

/** Deterministic multi-member gzip synthesis from a doc_id — REAL
  * RFC 1952 members whose DEFLATE bodies are STORED (NO_COMPRESSION)
  * so the byte length stays closed-form for the mixed-triage oracle:
  * member i of 1-3 carries 20+(d+i)%30 closed-form content bytes
  * (compressed size = 5 + len), an FNAME ("m<i>", 2 chars + NUL)
  * every (d+i)%4==0 member, MTIME = 1600000000 + d on every header,
  * and a d%20==3 lane with the LAST member's stored CRC32 flipped
  * (body decodes, `crc_ok` false — the family's integrity lane).
  */
object GzipMetaSynthKernel {
  def synth(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    val nM = (1 + d % 3).toInt
    val mtime = 1600000000L + d
    var i = 0
    while (i < nM) {
      val len = (20 + (d + i) % 30).toInt
      val content = new Array[Byte](len)
      var j = 0
      while (j < len) {
        content(j) = ((d * 7 + i * 11 + j * 3) % 256).toByte
        j += 1
      }
      val named = (d + i) % 4 == 0
      out.write(0x1F); out.write(0x8B); out.write(8)
      out.write(if (named) 8 else 0) // FLG
      var k = 0
      while (k < 4) { out.write(((mtime >>> (8 * k)) & 0xFF).toInt); k += 1 }
      out.write(0); out.write(255) // XFL, OS=unknown
      if (named) { out.write('m'); out.write('0' + i); out.write(0) }
      // STORED raw deflate: closed-form 5 + len
      val defl = new Deflater(Deflater.NO_COMPRESSION, true)
      defl.setInput(content)
      defl.finish()
      val buf = new Array[Byte](len + 16)
      val body = new java.io.ByteArrayOutputStream(len + 8)
      while (!defl.finished()) {
        val n = defl.deflate(buf)
        body.write(buf, 0, n)
      }
      defl.end()
      val bb = body.toByteArray
      out.write(bb, 0, bb.length)
      val crc = new CRC32()
      crc.update(content, 0, content.length)
      var c = crc.getValue
      if (d % 20 == 3 && i == nM - 1) c ^= 0xFFL // flipped-CRC lane
      k = 0
      while (k < 4) { out.write(((c >>> (8 * k)) & 0xFF).toInt); k += 1 }
      k = 0
      while (k < 4) { out.write(((len >>> (8 * k)) & 0xFF)); k += 1 }
      i += 1
    }
    out.toByteArray
  }
}

/** `gzip_meta(payload) → struct<...8 fields>`; see
  * [[GzipMetaKernel.parse]].
  */
case class GzipMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("gzip_valid", BooleanType),
    StructField("n_members", LongType),
    StructField("uncompressed_bytes", LongType),
    StructField("n_named", LongType),
    StructField("first_mtime", LongType),
    StructField("crc_ok", BooleanType),
    StructField("isize_ok", BooleanType),
    StructField("consistent", BooleanType)))
  override def nullable: Boolean = true
  override def prettyName: String = "gzip_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    GzipMetaKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.GzipMetaKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `gzip_meta_synth(doc_id) → binary`; see
  * [[GzipMetaSynthKernel.synth]].
  */
case class GzipMetaSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gzip_meta_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    GzipMetaSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.GzipMetaSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
