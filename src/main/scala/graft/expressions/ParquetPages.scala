package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parquet DATA-PAGE decode tier — past the footer
  * ([[ParquetMetaKernel]]) and into the bytes a 100 TB lake is
  * actually made of: the walk follows each row group's column chunks
  * to their `data_page_offset`, reads the thrift-compact PageHeader
  * chain (data / dictionary / v2 pages, page-level CRC fields
  * skipped generically), decompresses each page body through the
  * REAL codec — UNCOMPRESSED, SNAPPY (snappy-java), GZIP (the
  * RFC 1952 member walk), ZSTD (zstd-jni), and LZ4_RAW
  * (aircompressor), all on every Spark classpath — and PLAIN-decodes INT64 chunks to a value sum,
  * the closed-form handle a SQL oracle verifies the whole chain
  * against.
  *
  * Honest refusals, never lies: dictionary-encoded chunks report
  * their dictionary page and skip the value decode (the dictionary
  * indirection is Spark's own reader's job); v2 data pages and
  * level-bearing pages (uncompressed size ≠ values × 8) are counted
  * but not decoded; LZO/BROTLI/hadoop-framed-LZ4 report the codec
  * name with the pages walked from header arithmetic alone. `values_match` is the
  * integrity verdict: Σ data-page num_values must equal each chunk's
  * declared num_values.
  *
  * Reference behavior: lshrs reads parquet via pandas
  * (`io/parquet.py:47`) but never inspects pages; beyond-reference.
  * Bounded (page/chunk caps, decompress caps); never throws.
  */
object ParquetPagesKernel {
  val MaxChunks = 4096
  val MaxPagesPerChunk = 4096
  val MaxPageBytes: Int = 1 << 24

  private val CodecNames = Map(
    0L -> "uncompressed", 1L -> "snappy", 2L -> "gzip", 3L -> "lzo",
    4L -> "brotli", 5L -> "lz4", 6L -> "zstd", 7L -> "lz4_raw")

  private case class Chunk(typ: Long, codec: Long, numValues: Long,
    dataPageOffset: Long, dictPageOffset: Long, totalCompressed: Long)

  import ParquetMetaKernel.Reader

  /** Footer walk collecting per-chunk metadata (offsets, codec,
    * type, declared values); null when unwalkable.
    */
  private def chunks(p: Array[Byte]): Seq[Chunk] = {
    if (!ParquetMetaKernel.isParquet(p)) return null
    val fLen = ((p(p.length - 8) & 0xFFL) | ((p(p.length - 7) & 0xFFL) << 8) |
      ((p(p.length - 6) & 0xFFL) << 16) | ((p(p.length - 5) & 0xFFL) << 24))
    val fStart = p.length - 8 - fLen
    if (fLen <= 0 || fStart < 4) return null
    val r = new Reader(p, p.length - 8)
    r.pos = fStart.toInt
    val out = new scala.collection.mutable.ArrayBuffer[Chunk]()
    var fid = 0L
    var stop = false
    while (!stop && !r.failed) {
      val hdr = r.u8()
      if (hdr == 0) stop = true
      else {
        val delta = (hdr >> 4) & 0x0F
        val t = hdr & 0x0F
        fid = if (delta == 0) r.zigzag() else fid + delta
        if (fid == 4 && t == 9) {
          // row_groups: list<RowGroup>
          val (n, et) = r.listHeader()
          if (et != 12) r.failed = true
          var i = 0L
          while (i < n && !r.failed) {
            var gfid = 0L
            var gstop = false
            while (!gstop && !r.failed) {
              val gh = r.u8()
              if (gh == 0) gstop = true
              else {
                val gd = (gh >> 4) & 0x0F
                val gt = gh & 0x0F
                gfid = if (gd == 0) r.zigzag() else gfid + gd
                if (gfid == 1 && gt == 9) {
                  // columns: list<ColumnChunk>
                  val (cn, cet) = r.listHeader()
                  if (cet != 12) r.failed = true
                  var ci = 0L
                  while (ci < cn && !r.failed) {
                    if (out.length >= MaxChunks) { r.failed = true }
                    else {
                      var cfid = 0L
                      var cstop = false
                      var typ = -1L
                      var codec = -1L
                      var nv = -1L
                      var dpo = -1L
                      var dico = -1L
                      var tcs = -1L
                      while (!cstop && !r.failed) {
                        val ch = r.u8()
                        if (ch == 0) cstop = true
                        else {
                          val cd = (ch >> 4) & 0x0F
                          val ct = ch & 0x0F
                          cfid = if (cd == 0) r.zigzag() else cfid + cd
                          if (cfid == 3 && ct == 12) {
                            // meta_data: ColumnMetaData
                            var mfid = 0L
                            var mstop = false
                            while (!mstop && !r.failed) {
                              val mh = r.u8()
                              if (mh == 0) mstop = true
                              else {
                                val md = (mh >> 4) & 0x0F
                                val mt = mh & 0x0F
                                mfid = if (md == 0) r.zigzag() else mfid + md
                                mfid match {
                                  case 1 if mt == 5 => typ = r.zigzag()
                                  case 4 if mt == 5 => codec = r.zigzag()
                                  case 5 if mt == 6 => nv = r.zigzag()
                                  case 7 if mt == 6 => tcs = r.zigzag()
                                  case 9 if mt == 6 => dpo = r.zigzag()
                                  case 11 if mt == 6 => dico = r.zigzag()
                                  case _ => r.skip(mt, 2)
                                }
                              }
                            }
                          } else r.skip(ct, 2)
                        }
                      }
                      if (typ >= 0 && codec >= 0 && nv >= 0 && dpo >= 0 &&
                          tcs >= 0)
                        out += Chunk(typ, codec, nv, dpo, dico, tcs)
                      else r.failed = true
                    }
                    ci += 1
                  }
                } else r.skip(gt, 1)
              }
            }
            i += 1
          }
        } else r.skip(t, 0)
      }
    }
    if (r.failed || out.isEmpty) null else out.toSeq
  }

  private def inflate(p: Array[Byte], off: Int, len: Int, codec: Long,
      uncompressed: Int): Array[Byte] = {
    if (uncompressed < 0 || uncompressed > MaxPageBytes) return null
    val body = java.util.Arrays.copyOfRange(p, off, off + len)
    codec match {
      case 0 => body
      case 1 =>
        try org.xerial.snappy.Snappy.uncompress(body)
        catch { case _: java.io.IOException => null }
      case 2 => GzipKernel.concatMembers(body, MaxPageBytes)
      case 6 =>
        try {
          val out = new java.io.ByteArrayOutputStream(uncompressed)
          val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
            new java.io.ByteArrayInputStream(body))
          try {
            val buf = new Array[Byte](8192)
            var n = in.read(buf)
            while (n >= 0 && out.size() <= MaxPageBytes) {
              out.write(buf, 0, n); n = in.read(buf)
            }
          } finally in.close()
          out.toByteArray
        } catch { case _: java.io.IOException => null }
      case 7 =>
        // LZ4_RAW: plain lz4 block, decoded by aircompressor (the
        // pure-Java library parquet's own java readers lean on)
        val buf = new Array[Byte](uncompressed)
        try {
          val n = new io.airlift.compress.lz4.Lz4Decompressor()
            .decompress(body, 0, body.length, buf, 0, buf.length)
          if (n != uncompressed) null else buf
        } catch {
          case _: io.airlift.compress.MalformedInputException => null
        }
      case _ => null // lzo / brotli / hadoop-framed lz4: refused
    }
  }

  /** Struct of 12 fields (see [[ParquetPages.dataType]]) or null for
    * non-parquet framing / an unwalkable footer.
    */
  def parse(p: Array[Byte]): InternalRow = {
    val cs = chunks(p)
    if (cs == null) return null
    var nPages = 0L
    var nData = 0L
    var nDict = 0L
    var pageValues = 0L
    var valuesMatch = true
    var nDecoded = 0L
    var sum = 0L
    var anyDecoded = false
    var unBytes = 0L
    var coBytes = 0L
    var ok = true
    cs.foreach { c =>
      if (ok) {
        val chunkStart = if (c.dictPageOffset >= 0)
          math.min(c.dictPageOffset, c.dataPageOffset) else c.dataPageOffset
        val chunkEnd = chunkStart + c.totalCompressed
        var pos = chunkStart
        if (pos < 4 || chunkEnd > p.length - 8) ok = false
        var seen = 0L
        var chunkPages = 0
        var hasDict = false
        var allPlain = true
        var chunkSum = 0L
        val chunkDecodable = c.typ == 2 // INT64
        // the walk is SIZE-bounded (total_compressed_size is the
        // authoritative extent; parquet-mr relies on it the same
        // way) — a num_values lie then shows up in values_match
        // instead of derailing the walk
        while (ok && pos < chunkEnd && chunkPages < MaxPagesPerChunk) {
          // PageHeader: thrift-compact struct at pos
          val r = new Reader(p, p.length)
          r.pos = pos.toInt
          var fid = 0L
          var stop = false
          var ptype = -1L
          var unSize = -1L
          var coSize = -1L
          var numValues = -1L
          var encoding = -1L
          var isV2 = false
          while (!stop && !r.failed) {
            val hdr = r.u8()
            if (hdr == 0) stop = true
            else {
              val d = (hdr >> 4) & 0x0F
              val t = hdr & 0x0F
              fid = if (d == 0) r.zigzag() else fid + d
              fid match {
                case 1 if t == 5 => ptype = r.zigzag()
                case 2 if t == 5 => unSize = r.zigzag()
                case 3 if t == 5 => coSize = r.zigzag()
                case 5 if t == 12 =>
                  // DataPageHeader: 1 num_values, 2 encoding
                  var sfid = 0L
                  var sstop = false
                  while (!sstop && !r.failed) {
                    val sh = r.u8()
                    if (sh == 0) sstop = true
                    else {
                      val sd = (sh >> 4) & 0x0F
                      val st = sh & 0x0F
                      sfid = if (sd == 0) r.zigzag() else sfid + sd
                      sfid match {
                        case 1 if st == 5 => numValues = r.zigzag()
                        case 2 if st == 5 => encoding = r.zigzag()
                        case _ => r.skip(st, 1)
                      }
                    }
                  }
                case 7 if t == 12 =>
                  // DictionaryPageHeader
                  r.skipStruct(1)
                  hasDict = true
                case 8 if t == 12 =>
                  // DataPageHeaderV2: 1 num_values (decode refused)
                  var sfid = 0L
                  var sstop = false
                  while (!sstop && !r.failed) {
                    val sh = r.u8()
                    if (sh == 0) sstop = true
                    else {
                      val sd = (sh >> 4) & 0x0F
                      val st = sh & 0x0F
                      sfid = if (sd == 0) r.zigzag() else sfid + sd
                      if (sfid == 1 && st == 5) numValues = r.zigzag()
                      else r.skip(st, 1)
                    }
                  }
                  isV2 = true
                case _ => r.skip(t, 0)
              }
            }
          }
          if (r.failed || ptype < 0 || unSize < 0 || coSize < 0 ||
              r.pos + coSize > chunkEnd || coSize > MaxPageBytes) ok = false
          else {
            nPages += 1
            chunkPages += 1
            unBytes += unSize
            coBytes += coSize
            val bodyOff = r.pos
            if (ptype == 2) { // dictionary page
              nDict += 1
              hasDict = true
            } else if (ptype == 0 || ptype == 3) { // data page v1 / v2
              nData += 1
              if (numValues < 0) ok = false
              else {
                seen += numValues
                pageValues += numValues
                if (isV2 || ptype == 3) allPlain = false
                else if (encoding != 0) allPlain = false
                else if (chunkDecodable && !hasDict) {
                  val body = inflate(p, bodyOff, coSize.toInt, c.codec,
                    unSize.toInt)
                  if (body == null) allPlain = false
                  else if (body.length != unSize ||
                      numValues * 8 != body.length) allPlain = false
                  else {
                    var j = 0
                    while (j < body.length) {
                      var v = 0L
                      var k = 0
                      while (k < 8) {
                        v |= (body(j + k) & 0xFFL) << (8 * k); k += 1
                      }
                      chunkSum += v
                      j += 8
                    }
                  }
                }
              }
            }
            pos = r.pos + coSize
          }
        }
        if (ok) {
          if (seen != c.numValues) valuesMatch = false
          if (chunkDecodable && !hasDict && allPlain && seen > 0) {
            nDecoded += 1
            sum += chunkSum
            anyDecoded = true
          }
        }
      }
    }
    if (!ok) {
      // footer parsed but the page walk broke: report the honest
      // verdict rather than nulling a detected parquet file
      return new GenericInternalRow(Array[Any](
        false, cs.length.toLong,
        UTF8String.fromString(CodecNames.getOrElse(cs.head.codec, "unknown")),
        nPages, nData, nDict, pageValues, false, 0L, null, unBytes, coBytes))
    }
    new GenericInternalRow(Array[Any](
      true, cs.length.toLong,
      UTF8String.fromString(CodecNames.getOrElse(cs.head.codec, "unknown")),
      nPages, nData, nDict, pageValues, valuesMatch, nDecoded,
      if (anyDecoded) java.lang.Long.valueOf(sum) else null,
      unBytes, coBytes))
  }
}

/** Deterministic COMPLETE parquet files from a doc_id — real magic +
  * real pages + a real thrift-compact footer whose offsets point at
  * them: one required INT64 column `v` with `5 + d%11` values
  * `(3d + j) mod 1000`, PLAIN-encoded in one data page (two on
  * `d%3==1` docs — the multi-page walk lane), compressed through the
  * REAL codec rotated by `d%4`: uncompressed / snappy / gzip / zstd.
  * The `d%20==7` lane declares ONE extra value in the chunk metadata
  * (`values_match` false — the integrity lane; pages still decode).
  */
object ParquetFileSynthKernel {
  import ParquetSynthKernel.{CreatedBy}

  private final class W {
    val out = new java.io.ByteArrayOutputStream(512)
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def raw(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def varint(v0: Long): Unit = {
      var v = v0
      do {
        val b = (v & 0x7F).toInt
        v >>>= 7
        u8(if (v != 0) b | 0x80 else b)
      } while (v != 0)
    }
    def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    def fieldHeader(delta: Int, t: Int): Unit = u8((delta << 4) | t)
    def listHeader(n: Int, et: Int): Unit = {
      require(n < 15); u8((n << 4) | et)
    }
    def binary(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      varint(b.length.toLong)
      raw(b)
    }
  }

  private def compress(body: Array[Byte], codec: Int): Array[Byte] =
    codec match {
      case 0 => body
      case 1 => org.xerial.snappy.Snappy.compress(body)
      case 2 => GzipKernel.compress(body)
      case _ =>
        val ctx = new com.github.luben.zstd.ZstdCompressCtx()
        try { ctx.setLevel(3); ctx.compress(body) } finally ctx.close()
    }

  private def pageBytes(w: W, values: Array[Long], codec: Int): Unit = {
    val body = new Array[Byte](values.length * 8)
    var j = 0
    while (j < values.length) {
      var k = 0
      while (k < 8) {
        body(j * 8 + k) = ((values(j) >>> (8 * k)) & 0xFF).toByte; k += 1
      }
      j += 1
    }
    val comp = compress(body, codec)
    // PageHeader: 1 type=DATA_PAGE, 2 uncompressed, 3 compressed,
    // 5 DataPageHeader{1 num_values, 2 encoding=PLAIN, 3/4 RLE}
    w.fieldHeader(1, 5); w.zigzag(0L)
    w.fieldHeader(1, 5); w.zigzag(body.length.toLong)
    w.fieldHeader(1, 5); w.zigzag(comp.length.toLong)
    w.fieldHeader(2, 12)
    w.fieldHeader(1, 5); w.zigzag(values.length.toLong)
    w.fieldHeader(1, 5); w.zigzag(0L) // PLAIN
    w.fieldHeader(1, 5); w.zigzag(3L) // def: RLE
    w.fieldHeader(1, 5); w.zigzag(3L) // rep: RLE
    w.u8(0)
    w.u8(0) // PageHeader STOP
    w.raw(comp)
  }

  def synth(d: Long): Array[Byte] = {
    val w = new W
    w.u8('P'); w.u8('A'); w.u8('R'); w.u8('1')
    val nVals = (5 + d % 11).toInt
    val values = Array.tabulate(nVals)(j => (3 * d + j) % 1000)
    val lane = (d % 4).toInt
    // parquet CompressionCodec enum: 0 UNCOMPRESSED, 1 SNAPPY,
    // 2 GZIP, 6 ZSTD (3-5 are lzo/brotli/lz4 — not on the classpath)
    val codec = Array(0, 1, 2, 6).apply(lane)
    val dataStart = w.out.size()
    if (d % 3 == 1) {
      val split = nVals / 2
      pageBytes(w, values.take(split), codec)
      pageBytes(w, values.drop(split), codec)
    } else pageBytes(w, values, codec)
    val dataEnd = w.out.size()
    val footStart = w.out.size()
    // FileMetaData
    w.fieldHeader(1, 5); w.zigzag(1L) // version
    w.fieldHeader(1, 9) // schema
    w.listHeader(2, 12)
    w.fieldHeader(4, 8); w.binary("root")
    w.fieldHeader(1, 5); w.zigzag(1L) // num_children
    w.u8(0)
    w.fieldHeader(1, 5); w.zigzag(2L) // type INT64
    w.fieldHeader(2, 5); w.zigzag(0L) // repetition REQUIRED
    w.fieldHeader(1, 8); w.binary("v")
    w.u8(0)
    w.fieldHeader(1, 6); w.zigzag(nVals.toLong) // num_rows
    w.fieldHeader(1, 9) // row_groups
    w.listHeader(1, 12)
    w.fieldHeader(1, 9) // columns
    w.listHeader(1, 12)
    w.fieldHeader(2, 6); w.zigzag(dataStart.toLong) // file_offset
    w.fieldHeader(1, 12) // 3: meta_data
    w.fieldHeader(1, 5); w.zigzag(2L) // type INT64
    w.fieldHeader(1, 9); w.listHeader(2, 5) // encodings
    w.zigzag(0L); w.zigzag(3L)
    w.fieldHeader(1, 9); w.listHeader(1, 8) // path_in_schema
    w.binary("v")
    w.fieldHeader(1, 5); w.zigzag(codec.toLong) // codec
    // the d%20==7 integrity lane: chunk metadata claims ONE more value
    w.fieldHeader(1, 6)
    w.zigzag(nVals.toLong + (if (d % 20 == 7) 1 else 0)) // num_values
    w.fieldHeader(1, 6); w.zigzag((nVals * 8).toLong) // total_uncompressed
    w.fieldHeader(1, 6); w.zigzag((dataEnd - dataStart).toLong) // compressed
    w.fieldHeader(2, 6); w.zigzag(dataStart.toLong) // 9: data_page_offset
    w.u8(0) // ColumnMetaData STOP
    w.u8(0) // ColumnChunk STOP
    w.fieldHeader(1, 6); w.zigzag((dataEnd - dataStart).toLong) // total_byte_size
    w.fieldHeader(1, 6); w.zigzag(nVals.toLong) // num_rows
    w.u8(0) // RowGroup STOP
    w.fieldHeader(2, 8); w.binary(CreatedBy) // 6: created_by
    w.u8(0) // FileMetaData STOP
    val fLen = w.out.size() - footStart
    w.u8(fLen); w.u8(fLen >> 8); w.u8(fLen >> 16); w.u8(fLen >> 24)
    w.u8('P'); w.u8('A'); w.u8('R'); w.u8('1')
    w.out.toByteArray
  }
}

/** `parquet_pages(payload) → struct<...12 fields>`; see
  * [[ParquetPagesKernel.parse]].
  */
case class ParquetPages(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("pages_valid", BooleanType),
    StructField("n_chunks", LongType),
    StructField("codec", StringType),
    StructField("n_pages", LongType),
    StructField("n_data_pages", LongType),
    StructField("n_dict_pages", LongType),
    StructField("page_values", LongType),
    StructField("values_match", BooleanType),
    StructField("n_decoded_chunks", LongType),
    StructField("int64_sum", LongType),
    StructField("uncompressed_bytes", LongType),
    StructField("compressed_bytes", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "parquet_pages"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    ParquetPagesKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.ParquetPagesKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `parquet_file_synth(doc_id) → binary`; see
  * [[ParquetFileSynthKernel.synth]].
  */
case class ParquetFileSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "parquet_file_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    ParquetFileSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.ParquetFileSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
