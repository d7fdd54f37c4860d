package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ORC footer triage — the SEVENTEENTH family, completing the lake
  * trio (Avro = varints, Parquet = thrift compact, ORC = PROTOBUF):
  * `ORC` magic at the head; at the tail, a protobuf PostScript whose
  * LAST byte is its own length, pointing back at a (possibly
  * compressed) protobuf Footer. So triage is a protobuf wire walk —
  * varint keys packing (fieldNumber << 3 | wireType), varint /
  * 64-bit / length-delimited / 32-bit wire types, packed repeated
  * scalars — with generic skip for unknown fields.
  *
  * The PostScript yields footer/metadata lengths, the compression
  * kind, the writer version, and the trailing `ORC` magic (field
  * 8000 — validity requires it, so a text document that happens to
  * start with "ORC" cannot parse). The Footer is decoded for NONE
  * ALL FIVE ORC codecs (chunks carry 3-byte (len<<1)|isOriginal
  * headers; raw deflate for ZLIB, snappy-java for SNAPPY, zstd-jni
  * for ZSTD, and aircompressor — the pure-Java library orc-core
  * itself uses, also on every Spark classpath — for LZO and LZ4;
  * r15 widened this from ZLIB-only, the "no codec" claim was
  * stale). Unknown kinds report
  * PostScript-grain fields with `footer_decoded` false (no codec in
  * the JDK — documented, same posture as MP3 samples). From the
  * Footer: declared row count, stripe count + Σ per-stripe rows
  * (`stripe_rows_match` is the family's integrity verdict), type
  * count, root-struct column count, content length.
  *
  * Reference behavior: beyond-reference (lshrs reads parquet only).
  * Never throws; bounded (footer size cap, element caps, depth cap).
  */
object OrcMetaKernel {
  val MaxFooterBytes = 1 << 22
  val MaxElems = 1 << 20
  val MaxDepth = 16

  def isOrc(p: Array[Byte]): Boolean =
    p.length >= 16 && p(0) == 'O' && p(1) == 'R' && p(2) == 'C'

  private final class Reader(p: Array[Byte], var pos: Int, val end: Int) {
    var failed = false

    def u8(): Int = {
      if (failed || pos >= end) { failed = true; return 0 }
      val b = p(pos) & 0xFF
      pos += 1
      b
    }

    def varint(): Long = {
      var u = 0L
      var shift = 0
      while (shift < 64) {
        val b = u8()
        if (failed) return 0L
        u |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return u
        shift += 7
      }
      failed = true
      0L
    }

    def skip(wt: Int, depth: Int): Unit = {
      if (failed || depth > MaxDepth) { failed = true; return }
      wt match {
        case 0 => varint()
        case 1 => skipBytes(8)
        case 2 => skipBytes(varint())
        case 5 => skipBytes(4)
        case _ => failed = true
      }
    }

    def skipBytes(n: Long): Unit = {
      if (n < 0 || pos + n > end) { failed = true; return }
      pos += n.toInt
    }
  }

  /** Decompress an ORC zlib stream: 3-byte LE chunk headers,
    * (len << 1) | isOriginal, raw-deflate bodies. Null on damage.
    */
  /** Chunked ORC decompression ((len<<1)|isOriginal 3-byte headers)
    * for every codec on the Spark classpath: ZLIB (raw deflate),
    * SNAPPY (snappy-java — the r15 upgrade; the "no codec in the
    * JDK" refusal was stale, snappy-java ships with Spark), and
    * ZSTD (zstd-jni). LZO/LZ4 remain honest refusals.
    */
  private def orcInflate(p: Array[Byte], from: Int, until: Int,
      codec: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    var at = from
    while (at < until) {
      if (at + 3 > until) return null
      val hdr = (p(at) & 0xFF) | ((p(at + 1) & 0xFF) << 8) |
        ((p(at + 2) & 0xFF) << 16)
      val isOriginal = (hdr & 1) == 1
      val clen = hdr >>> 1
      at += 3
      if (clen <= 0 || at + clen > until) return null
      if (isOriginal) out.write(p, at, clen)
      else codec match {
        case 1 =>
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(p, at, clen)
          val buf = new Array[Byte](4096)
          try {
            while (!inf.finished() && !inf.needsInput()) {
              val n = inf.inflate(buf)
              if (n == 0 && !inf.finished()) return null
              out.write(buf, 0, n)
              if (out.size() > MaxFooterBytes) return null
            }
            if (!inf.finished()) return null
          } catch {
            case _: java.util.zip.DataFormatException => return null
          } finally inf.end()
        case 2 =>
          val body = java.util.Arrays.copyOfRange(p, at, at + clen)
          val dec =
            try org.xerial.snappy.Snappy.uncompress(body)
            catch { case _: java.io.IOException => null }
          if (dec == null || out.size() + dec.length > MaxFooterBytes)
            return null
          out.write(dec, 0, dec.length)
        case 5 =>
          try {
            val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
              new java.io.ByteArrayInputStream(p, at, clen))
            try {
              val buf = new Array[Byte](4096)
              var n = in.read(buf)
              while (n >= 0) {
                out.write(buf, 0, n)
                if (out.size() > MaxFooterBytes) return null
                n = in.read(buf)
              }
            } finally in.close()
          } catch { case _: java.io.IOException => return null }
        case 3 | 4 =>
          // aircompressor — the pure-Java LZO/LZ4 ORC itself uses
          val dec: io.airlift.compress.Decompressor =
            if (codec == 3L) new io.airlift.compress.lzo.LzoDecompressor()
            else new io.airlift.compress.lz4.Lz4Decompressor()
          val buf = new Array[Byte](MaxFooterBytes)
          val n =
            try dec.decompress(p, at, clen, buf, 0, buf.length)
            catch { case _: io.airlift.compress.MalformedInputException =>
              return null }
          if (out.size() + n > MaxFooterBytes) return null
          out.write(buf, 0, n)
        case _ => return null
      }
      at += clen
      if (out.size() > MaxFooterBytes) return null
    }
    out.toByteArray
  }

  private val CompressionNames =
    Array("none", "zlib", "snappy", "lzo", "lz4", "zstd")

  /** Struct (orc_valid, compression, footer_decoded, num_rows,
    * n_stripes, stripe_rows, n_types, n_cols, content_length,
    * writer_version, footer_bytes, metadata_bytes, stripe_rows_match)
    * or null for non-ORC / unwalkable-PostScript bytes.
    */
  def parse(p: Array[Byte]): InternalRow = {
    if (!isOrc(p)) return null
    val psLen = p(p.length - 1) & 0xFF
    val psStart = p.length - 1 - psLen
    if (psLen < 4 || psStart < 3) return null
    // PostScript protobuf
    val ps = new Reader(p, psStart, p.length - 1)
    var footerLen = -1L
    var compression = 0L
    var metadataLen = 0L
    var writerVersion = -1L
    var magicOk = false
    while (ps.pos < ps.end && !ps.failed) {
      val key = ps.varint()
      if (!ps.failed) {
        val field = key >>> 3
        val wt = (key & 7).toInt
        field match {
          case 1 if wt == 0 => footerLen = ps.varint()
          case 2 if wt == 0 => compression = ps.varint()
          case 5 if wt == 0 => metadataLen = ps.varint()
          case 6 if wt == 0 => writerVersion = ps.varint()
          case 8000 if wt == 2 =>
            val l = ps.varint()
            if (l == 3 && ps.pos + 3 <= ps.end &&
                p(ps.pos) == 'O' && p(ps.pos + 1) == 'R' && p(ps.pos + 2) == 'C')
              magicOk = true
            ps.skipBytes(l)
          case _ => ps.skip(wt, 0)
        }
      }
    }
    if (ps.failed || !magicOk || footerLen <= 0 || compression < 0 ||
        compression > 5) return null
    val footerEnd = psStart
    val footerStart = footerEnd - footerLen
    if (footerStart < 3 || footerLen > MaxFooterBytes) return null
    val compName = CompressionNames(compression.toInt)
    def psOnly(decoded: Boolean) = new GenericInternalRow(Array[Any](
      true, UTF8String.fromString(compName), decoded, null, null, null,
      null, null, null,
      if (writerVersion >= 0) writerVersion else null,
      footerLen, metadataLen, null))
    val footerBytes: Array[Byte] = compression match {
      case 0 =>
        val b = new Array[Byte](footerLen.toInt)
        System.arraycopy(p, footerStart.toInt, b, 0, footerLen.toInt)
        b
      case c if c >= 1 && c <= 5 =>
        orcInflate(p, footerStart.toInt, footerEnd, compression)
      case _ => null
    }
    if (footerBytes == null) return psOnly(false)
    // Footer protobuf
    val f = new Reader(footerBytes, 0, footerBytes.length)
    var numRows = -1L
    var nStripes = 0L
    var stripeRows = 0L
    var nTypes = 0L
    var nCols = -1L
    var contentLen = -1L
    while (f.pos < f.end && !f.failed) {
      val key = f.varint()
      if (!f.failed) {
        val field = key >>> 3
        val wt = (key & 7).toInt
        field match {
          case 2 if wt == 0 => contentLen = f.varint()
          case 3 if wt == 2 =>
            // StripeInformation
            val l = f.varint()
            val send = f.pos + l
            if (l < 0 || send > f.end) f.failed = true
            else {
              while (f.pos < send && !f.failed) {
                val sk = f.varint()
                val sf = sk >>> 3
                val swt = (sk & 7).toInt
                if (sf == 5 && swt == 0) stripeRows += f.varint()
                else f.skip(swt, 1)
              }
              if (f.pos != send) f.failed = true
              nStripes += 1
              if (nStripes > MaxElems) f.failed = true
            }
          case 4 if wt == 2 =>
            // Type — the FIRST one is the root; its subtypes count is
            // the column count (packed or unpacked repeated uint32)
            val l = f.varint()
            val tend = f.pos + l
            if (l < 0 || tend > f.end) f.failed = true
            else {
              var subCount = 0L
              while (f.pos < tend && !f.failed) {
                val tk = f.varint()
                val tf = tk >>> 3
                val twt = (tk & 7).toInt
                if (tf == 2 && twt == 2) {
                  val pl = f.varint()
                  val pend = f.pos + pl
                  if (pl < 0 || pend > f.end) f.failed = true
                  else while (f.pos < pend && !f.failed) {
                    f.varint()
                    subCount += 1
                  }
                } else if (tf == 2 && twt == 0) {
                  f.varint()
                  subCount += 1
                } else f.skip(twt, 1)
              }
              if (f.pos != tend) f.failed = true
              if (nTypes == 0L) nCols = subCount
              nTypes += 1
              if (nTypes > MaxElems) f.failed = true
            }
          case 6 if wt == 0 => numRows = f.varint()
          case _ => f.skip(wt, 0)
        }
      }
    }
    if (f.failed || numRows < 0) return psOnly(false)
    new GenericInternalRow(Array[Any](
      true, UTF8String.fromString(compName), true, numRows, nStripes,
      stripeRows, nTypes, if (nCols >= 0) nCols else null,
      if (contentLen >= 0) contentLen else null,
      if (writerVersion >= 0) writerVersion else null,
      footerLen, metadataLen, stripeRows == numRows))
  }
}

/** Deterministic ORC synthesis from a doc_id — REAL protobuf
  * postscripts and footers between real magics: 1-3 stripes with
  * per-stripe row counts, a root STRUCT type with packed subtypes +
  * field names and 1-5 leaf types, content length, row-index stride,
  * writer fields; even docs store the footer RAW (compression NONE),
  * odd docs in a real ORC ZLIB chunk (stored-deflate body so the
  * byte length stays closed-form: 3-byte chunk header + 5-byte
  * deflate framing + raw length); the d%20==17 lane declares one
  * row more than the stripes carry (`stripe_rows_match` false — the
  * integrity lane). All varint widths pinned by value ranges; the
  * total byte length's only break is the footerLength varint at 128
  * (the MKV convention, spec-pinned).
  */
object OrcSynthKernel {
  private final class W {
    val out = new java.io.ByteArrayOutputStream(256)
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def varint(v0: Long): Unit = {
      var v = v0
      do {
        val b = (v & 0x7F).toInt
        v >>>= 7
        u8(if (v != 0) b | 0x80 else b)
      } while (v != 0)
    }
    def key(field: Int, wt: Int): Unit = varint((field.toLong << 3) | wt)
    def bytes: Array[Byte] = out.toByteArray
  }

  def synth(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    out.write('O'); out.write('R'); out.write('C')
    // body stand-in: 5 closed-form bytes
    var k = 0
    while (k < 5) { out.write(((d * 11 + k * 3) % 256).toInt); k += 1 }
    val nS = (1 + d % 3).toInt
    val nC = (1 + d % 5).toInt
    var totalRows = 0L
    val fw = new W
    fw.key(1, 0); fw.varint(3L) // headerLength
    fw.key(2, 0); fw.varint(5L) // contentLength
    var s = 0
    while (s < nS) {
      val rows = 10 + (d + s) % 30
      totalRows += rows
      val sw = new W
      sw.key(1, 0); sw.varint(8 + 12L * s) // offset
      sw.key(2, 0); sw.varint(4L) // indexLength
      sw.key(3, 0); sw.varint(16 + (d + s) % 16) // dataLength
      sw.key(4, 0); sw.varint(6L) // footerLength
      sw.key(5, 0); sw.varint(rows)
      val sb = sw.bytes
      fw.key(3, 2); fw.varint(sb.length.toLong)
      fw.out.write(sb, 0, sb.length)
      s += 1
    }
    // root struct type: kind 12, packed subtypes 1..nC, field names
    val rt = new W
    rt.key(1, 0); rt.varint(12L)
    rt.key(2, 2); rt.varint(nC.toLong)
    var c = 0
    while (c < nC) { rt.varint((c + 1).toLong); c += 1 }
    c = 0
    while (c < nC) {
      rt.key(3, 2); rt.varint(2L)
      rt.u8('c'); rt.u8('0' + c)
      c += 1
    }
    val rtb = rt.bytes
    fw.key(4, 2); fw.varint(rtb.length.toLong)
    fw.out.write(rtb, 0, rtb.length)
    c = 0
    while (c < nC) {
      // leaf types: kinds rotate long/string/double
      val kind = Array(4L, 7L, 6L).apply(c % 3)
      fw.key(4, 2); fw.varint(2L)
      fw.key(1, 0); fw.varint(kind)
      c += 1
    }
    val declaredRows = totalRows + (if (d % 20 == 17) 1 else 0)
    fw.key(6, 0); fw.varint(declaredRows)
    fw.key(8, 0); fw.varint(100L) // rowIndexStride
    fw.key(9, 0); fw.varint(1L) // writer
    val raw = fw.bytes
    val zlib = d % 2 == 1
    val stored: Array[Byte] =
      if (!zlib) raw
      else {
        // one real ORC zlib chunk: 3-byte LE header, raw-deflate
        // STORED body (closed-form length: 5 + raw)
        val defl = new java.util.zip.Deflater(
          java.util.zip.Deflater.NO_COMPRESSION, true)
        defl.setInput(raw)
        defl.finish()
        val body = new java.io.ByteArrayOutputStream(raw.length + 16)
        val buf = new Array[Byte](256)
        while (!defl.finished()) {
          val n = defl.deflate(buf)
          body.write(buf, 0, n)
        }
        defl.end()
        val bb = body.toByteArray
        val chunk = new Array[Byte](3 + bb.length)
        val hdr = bb.length << 1 // isOriginal = 0
        chunk(0) = (hdr & 0xFF).toByte
        chunk(1) = ((hdr >> 8) & 0xFF).toByte
        chunk(2) = ((hdr >> 16) & 0xFF).toByte
        System.arraycopy(bb, 0, chunk, 3, bb.length)
        chunk
      }
    out.write(stored, 0, stored.length)
    val pw = new W
    pw.key(1, 0); pw.varint(stored.length.toLong)
    pw.key(2, 0); pw.varint(if (zlib) 1L else 0L)
    pw.key(3, 0); pw.varint(64L) // compressionBlockSize
    pw.key(5, 0); pw.varint(0L) // metadataLength
    pw.key(6, 0); pw.varint(1 + d % 5) // writerVersion
    pw.key(8000, 2); pw.varint(3L)
    pw.u8('O'); pw.u8('R'); pw.u8('C')
    val psb = pw.bytes
    out.write(psb, 0, psb.length)
    out.write(psb.length)
    out.toByteArray
  }
}

/** `orc_meta(payload) → struct<...13 fields>`; see
  * [[OrcMetaKernel.parse]].
  */
case class OrcMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("orc_valid", BooleanType),
    StructField("compression", StringType),
    StructField("footer_decoded", BooleanType),
    StructField("num_rows", LongType),
    StructField("n_stripes", LongType),
    StructField("stripe_rows", LongType),
    StructField("n_types", LongType),
    StructField("n_cols", LongType),
    StructField("content_length", LongType),
    StructField("writer_version", LongType),
    StructField("footer_bytes", LongType),
    StructField("metadata_bytes", LongType),
    StructField("stripe_rows_match", BooleanType)))
  override def nullable: Boolean = true
  override def prettyName: String = "orc_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    OrcMetaKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.OrcMetaKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `orc_synth(doc_id) → binary`; see [[OrcSynthKernel.synth]]. */
case class OrcSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "orc_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    OrcSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.OrcSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
