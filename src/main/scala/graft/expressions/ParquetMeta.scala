package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parquet FOOTER triage — the SIXTEENTH family, and the one this
  * engine eats its own dog food on: the lake format Spark itself
  * writes. Layout: `PAR1` … column chunks … FileMetaData (Thrift
  * COMPACT protocol) … 4-byte LE footer length … `PAR1`. So triage
  * is a thrift-compact walk: field headers pack a field-id DELTA
  * with a type nibble (delta 0 → explicit zigzag id), i16/i32/i64
  * are zigzag varints, binaries are varint-length-prefixed, lists
  * pack size with element type (15 → varint size), structs nest to
  * a STOP byte, bools encode their value IN the type nibble. The
  * kernel skips unknown fields generically (depth-capped) and
  * extracts the FileMetaData spine: version, num_rows, the schema
  * list (total elements + LEAF count — elements without children,
  * minus the root), row groups (count, Σ total_byte_size, Σ
  * per-group num_rows), created_by.
  *
  * `rows_match` is the integrity verdict in the family's CRC-lane
  * tradition: Σ row-group num_rows must equal the declared
  * num_rows.
  *
  * Reference behavior: lshrs READS parquet via pandas
  * (`io/parquet.py:47`) but never inspects the container; the
  * triage tier is beyond-reference. Never throws; bounded (depth
  * cap, element caps, varint caps).
  */
object ParquetMetaKernel {
  val MaxDepth = 32
  val MaxElems = 1 << 20

  def isParquet(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'P' && p(1) == 'A' && p(2) == 'R' && p(3) == '1' &&
      p(p.length - 4) == 'P' && p(p.length - 3) == 'A' &&
      p(p.length - 2) == 'R' && p(p.length - 1) == '1'

  /** Never-throw thrift-compact reader over [start, end); shared
    * with the page-walk tier ([[ParquetPagesKernel]]).
    */
  private[expressions] final class Reader(p: Array[Byte], val end: Int) {
    var pos = 0
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

    def zigzag(): Long = {
      val u = varint()
      (u >>> 1) ^ -(u & 1L)
    }

    def skipBytes(n: Long): Unit = {
      if (n < 0 || pos + n > end) { failed = true; return }
      pos += n.toInt
    }

    /** Skip one value of compact type `t`. */
    def skip(t: Int, depth: Int): Unit = {
      if (failed || depth > MaxDepth) { failed = true; return }
      t match {
        case 1 | 2 => () // bool: value was in the nibble
        case 3 => u8()
        case 4 | 5 | 6 => varint()
        case 7 => skipBytes(8)
        case 8 => skipBytes(varint())
        case 9 | 10 => skipList(depth)
        case 11 => skipMap(depth)
        case 12 => skipStruct(depth)
        case _ => failed = true
      }
    }

    def skipList(depth: Int): Unit = {
      val hdr = u8()
      var size = (hdr >> 4) & 0x0F
      val et = hdr & 0x0F
      var n = if (size == 15) varint() else size.toLong
      if (n < 0 || n > MaxElems) { failed = true; return }
      var i = 0L
      while (i < n && !failed) { skip(et, depth + 1); i += 1 }
    }

    def skipMap(depth: Int): Unit = {
      val n = varint()
      if (n < 0 || n > MaxElems) { failed = true; return }
      if (n == 0) return
      val kv = u8()
      val kt = (kv >> 4) & 0x0F
      val vt = kv & 0x0F
      var i = 0L
      while (i < n && !failed) {
        skip(kt, depth + 1); skip(vt, depth + 1); i += 1
      }
    }

    def skipStruct(depth: Int): Unit = {
      var fid = 0L
      var stop = false
      while (!stop && !failed) {
        val hdr = u8()
        if (hdr == 0) stop = true
        else {
          val delta = (hdr >> 4) & 0x0F
          val t = hdr & 0x0F
          fid = if (delta == 0) zigzag() else fid + delta
          skip(t, depth + 1)
        }
      }
    }

    /** Read a list header; returns (size, elemType). */
    def listHeader(): (Long, Int) = {
      val hdr = u8()
      val size0 = (hdr >> 4) & 0x0F
      val et = hdr & 0x0F
      val n = if (size0 == 15) varint() else size0.toLong
      if (n < 0 || n > MaxElems) failed = true
      (n, et)
    }
  }

  /** Struct (parquet_valid, version, num_rows, n_row_groups,
    * n_columns, n_schema_elements, total_byte_size, created_by,
    * rows_match, footer_bytes) or null for non-Parquet framing / an
    * unwalkable footer.
    */
  def parse(p: Array[Byte]): InternalRow = {
    if (!isParquet(p)) return null
    val fLen = ((p(p.length - 8) & 0xFFL) | ((p(p.length - 7) & 0xFFL) << 8) |
      ((p(p.length - 6) & 0xFFL) << 16) | ((p(p.length - 5) & 0xFFL) << 24))
    val fStart = p.length - 8 - fLen
    if (fLen <= 0 || fStart < 4) return null
    val r = new Reader(p, p.length - 8)
    r.pos = fStart.toInt
    var version = -1L
    var numRows = -1L
    var nRowGroups = 0L
    var nSchema = 0L
    var nLeaves = 0L
    var totalBytes = 0L
    var rgRows = 0L
    var createdBy: String = null
    var fid = 0L
    var stop = false
    while (!stop && !r.failed) {
      val hdr = r.u8()
      if (hdr == 0) stop = true
      else {
        val delta = (hdr >> 4) & 0x0F
        val t = hdr & 0x0F
        fid = if (delta == 0) r.zigzag() else fid + delta
        fid match {
          case 1 if t == 5 => version = r.zigzag()
          case 2 if t == 9 =>
            // schema: list<SchemaElement>
            val (n, et) = r.listHeader()
            if (et != 12) r.failed = true
            var i = 0L
            while (i < n && !r.failed) {
              // SchemaElement: 5 = num_children (i32)
              var sfid = 0L
              var sstop = false
              var children = -1L
              while (!sstop && !r.failed) {
                val sh = r.u8()
                if (sh == 0) sstop = true
                else {
                  val sd = (sh >> 4) & 0x0F
                  val st = sh & 0x0F
                  sfid = if (sd == 0) r.zigzag() else sfid + sd
                  if (sfid == 5 && st == 5) children = r.zigzag()
                  else r.skip(st, 1)
                }
              }
              nSchema += 1
              if (children <= 0 && i > 0) nLeaves += 1
              i += 1
            }
          case 3 if t == 6 => numRows = r.zigzag()
          case 4 if t == 9 =>
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
                  if (gfid == 2 && gt == 6) totalBytes += r.zigzag()
                  else if (gfid == 3 && gt == 6) rgRows += r.zigzag()
                  else r.skip(gt, 1)
                }
              }
              nRowGroups += 1
              i += 1
            }
          case 6 if t == 8 =>
            val l = r.varint()
            if (l < 0 || r.pos + l > r.end) r.failed = true
            else {
              val cap = math.min(l, 256L).toInt
              createdBy = new String(p, r.pos, cap, "UTF-8")
              r.skipBytes(l)
            }
          case _ => r.skip(t, 0)
        }
      }
    }
    if (r.failed || version < 0 || numRows < 0) return null
    new GenericInternalRow(Array[Any](
      true, version, numRows, nRowGroups, nLeaves, nSchema, totalBytes,
      if (createdBy == null) null else UTF8String.fromString(createdBy),
      rgRows == numRows, fLen))
  }
}

/** Deterministic Parquet-footer synthesis from a doc_id — a REAL
  * thrift-compact FileMetaData between real magics: version 1↔2,
  * a root SchemaElement + 1-6 leaf columns (names `c0..`, i64 type
  * enum, repetition), num_rows split across 1-2 row groups (the
  * d%20==13 lane mis-splits by one row — `rows_match` false, the
  * integrity lane), each group carrying one minimal ColumnChunk,
  * `created_by` on even docs, a key_value_metadata entry on d%5==3
  * docs (the generic-skip path in the gate, not just specs). All
  * varint widths are pinned by the value ranges, so the byte LENGTH
  * is closed-form for the mixed-triage oracle.
  */
object ParquetSynthKernel {
  val CreatedBy = "graft-synth 1.0"

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
    def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    def fieldHeader(delta: Int, t: Int): Unit = u8((delta << 4) | t)
    def listHeader(n: Int, et: Int): Unit = {
      require(n < 15); u8((n << 4) | et)
    }
    def binary(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      varint(b.length.toLong)
      out.write(b, 0, b.length)
    }
  }

  def synth(d: Long): Array[Byte] = {
    val w = new W
    // leading magic + a token data section (triage reads the FOOTER;
    // a 4-byte stand-in keeps the file well-formed and small)
    w.u8('P'); w.u8('A'); w.u8('R'); w.u8('1')
    w.u8(0); w.u8(0); w.u8(0); w.u8(0)
    val footStart = w.out.size()
    val nCols = (1 + d % 6).toInt
    val numRows = 10 + d % 50
    val nRG = (1 + d % 2).toInt
    // FileMetaData
    w.fieldHeader(1, 5); w.zigzag(1 + d % 2) // 1: version i32
    w.fieldHeader(1, 9) // 2: schema list<struct>
    w.listHeader(1 + nCols, 12)
    // root element: name + num_children
    w.fieldHeader(4, 8); w.binary("root") // SchemaElement 4: name
    w.fieldHeader(1, 5); w.zigzag(nCols.toLong) // 5: num_children
    w.u8(0)
    var c = 0
    while (c < nCols) {
      w.fieldHeader(1, 5); w.zigzag(2L) // 1: type = INT64
      w.fieldHeader(2, 5); w.zigzag(1L) // 3: repetition = REQUIRED
      w.fieldHeader(1, 8); w.binary("c" + c) // 4: name (2 bytes)
      w.u8(0)
      c += 1
    }
    w.fieldHeader(1, 6); w.zigzag(numRows) // 3: num_rows i64
    w.fieldHeader(1, 9) // 4: row_groups
    w.listHeader(nRG, 12)
    var g = 0
    while (g < nRG) {
      // RowGroup: 1 columns list<ColumnChunk>, 2 total_byte_size,
      // 3 num_rows
      w.fieldHeader(1, 9)
      w.listHeader(1, 12)
      w.fieldHeader(2, 6); w.zigzag(8L) // ColumnChunk 2: file_offset
      w.u8(0)
      w.fieldHeader(1, 6); w.zigzag(40 + (d + g) % 20) // total_byte_size
      // the d%20==13 lane mis-splits rows by ONE — rows_match false
      val share =
        if (nRG == 1) numRows + (if (d % 20 == 13) 1 else 0)
        else if (g == 0) numRows / 2 + (if (d % 20 == 13) 1 else 0)
        else numRows - numRows / 2
      w.fieldHeader(1, 6); w.zigzag(share) // num_rows
      w.u8(0)
      g += 1
    }
    if (d % 5 == 3) {
      // 5: key_value_metadata — the generic-skip path
      w.fieldHeader(1, 9)
      w.listHeader(1, 12)
      w.fieldHeader(1, 8); w.binary("k1") // KeyValue 1: key
      w.fieldHeader(1, 8); w.binary("v23") // 2: value
      w.u8(0)
      if (d % 2 == 0) { w.fieldHeader(1, 8); w.binary(CreatedBy) } // 6
    } else if (d % 2 == 0) {
      w.fieldHeader(2, 8); w.binary(CreatedBy) // 6: created_by (delta 2)
    }
    w.u8(0) // FileMetaData STOP
    val fLen = w.out.size() - footStart
    w.u8(fLen); w.u8(fLen >> 8); w.u8(fLen >> 16); w.u8(fLen >> 24)
    w.u8('P'); w.u8('A'); w.u8('R'); w.u8('1')
    w.out.toByteArray
  }
}

/** `parquet_meta(payload) → struct<...10 fields>`; see
  * [[ParquetMetaKernel.parse]].
  */
case class ParquetMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("parquet_valid", BooleanType),
    StructField("version", LongType),
    StructField("num_rows", LongType),
    StructField("n_row_groups", LongType),
    StructField("n_columns", LongType),
    StructField("n_schema_elements", LongType),
    StructField("total_byte_size", LongType),
    StructField("created_by", StringType),
    StructField("rows_match", BooleanType),
    StructField("footer_bytes", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "parquet_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    ParquetMetaKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.ParquetMetaKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `parquet_synth(doc_id) → binary`; see [[ParquetSynthKernel.synth]]. */
case class ParquetSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "parquet_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    ParquetSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.ParquetSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
