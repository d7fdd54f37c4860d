package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TIFF container triage — the TENTH family (r15, the r14 verdict's
  * item 6): scanned-document corpora are TIFF-heavy, and a bare
  * `.tif` payload previously routed to the null lane. The format is
  * the same IFD machinery the EXIF walker already speaks (EXIF *is*
  * an embedded TIFF), re-plumbed over the whole payload: byte-order
  * mark (II/MM) + magic 42, a chain of IFDs (multi-page — one IFD per
  * scanned page), and per-IFD 12-byte entries whose values sit inline
  * (≤4 bytes) or behind offsets. Reads the baseline-triage tags —
  * dimensions, bits/sample, samples/pixel, compression, photometric —
  * plus the data layout (STRIPS vs TILES, unit count, geometry) and a
  * bounds-consistency verdict over every referenced offset.
  *
  * Never throws: every read is bounds-checked and any structural
  * violation short of a readable IFD0 returns null; IFD-chain walks
  * are cycle/length-bounded.
  */
object TiffMetaKernel {
  val MaxEntries = 512
  val MaxIfds = 32
  val MaxUnits = 1 << 16

  private def u16(p: Array[Byte], off: Int, le: Boolean): Int =
    if (le) (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    else ((p(off) & 0xFF) << 8) | (p(off + 1) & 0xFF)

  private def u32(p: Array[Byte], off: Int, le: Boolean): Long =
    if (le) (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)
    else ((p(off) & 0xFFL) << 24) | ((p(off + 1) & 0xFFL) << 16) |
      ((p(off + 2) & 0xFFL) << 8) | (p(off + 3) & 0xFFL)

  def isTiff(p: Array[Byte]): Boolean =
    p.length >= 8 &&
      ((p(0) == 'I' && p(1) == 'I' && (p(2) & 0xFF) == 42 && p(3) == 0) ||
        (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && (p(3) & 0xFF) == 42))

  /** SHORT(3)/LONG(4) scalar with count 1, or -1. */
  private def scalar(p: Array[Byte], typ: Int, cnt: Long, vOff: Int,
      le: Boolean): Long = {
    if (cnt != 1L) return -1L
    if (typ == 3) u16(p, vOff, le).toLong
    else if (typ == 4) u32(p, vOff, le)
    else -1L
  }

  /** First SHORT of a count-n SHORT tag (inline when n ≤ 2). */
  private def firstShort(p: Array[Byte], typ: Int, cnt: Long, vOff: Int,
      le: Boolean): Long = {
    if (typ != 3 || cnt < 1) return -1L
    if (cnt <= 2) u16(p, vOff, le).toLong
    else {
      val off = u32(p, vOff, le)
      if (off < 0 || off + 2 > p.length) -1L
      else u16(p, off.toInt, le).toLong
    }
  }

  /** Every unit offset/bytecount of a count-n SHORT/LONG tag within
    * payload bounds? (The consistency probe; does not materialize the
    * array.) Returns false on any violation, true when checkable.
    */
  private def unitsInBounds(p: Array[Byte], typ: Int, cnt: Long, vOff: Int,
      le: Boolean, asOffsets: Boolean): Boolean = {
    if (cnt < 1 || cnt > MaxUnits) return false
    val width = if (typ == 3) 2 else if (typ == 4) 4 else return false
    val base =
      if (cnt * width <= 4) vOff
      else {
        val off = u32(p, vOff, le)
        if (off < 0 || off + cnt * width > p.length) return false
        off.toInt
      }
    if (base + cnt * width > p.length) return false
    if (asOffsets) {
      var i = 0
      while (i < cnt) {
        val v = if (width == 2) u16(p, base + 2 * i, le).toLong
          else u32(p, base + 4 * i, le)
        if (v < 0 || v > p.length) return false
        i += 1
      }
    }
    true
  }

  /** Struct (tiff_valid, byte_order, n_ifds, n_ifd0_entries, width,
    * height, bits_per_sample, samples_per_pixel, compression,
    * photometric, layout, n_units, rows_per_strip, tile_w, tile_h,
    * header_consistent), or null for non-TIFF bytes.
    */
  def parse(p: Array[Byte]): InternalRow = {
    if (!isTiff(p)) return null
    val le = p(0) == 'I'
    val ifd0Off = u32(p, 4, le)
    if (ifd0Off < 8 || ifd0Off + 2 > p.length) return null
    // IFD chain: count pages, bounded
    var nIfds = 0L
    var at = ifd0Off
    var consistent = true
    while (at != 0L && nIfds < MaxIfds) {
      if (at < 0 || at + 2 > p.length) { consistent = false; at = 0L }
      else {
        val n = u16(p, at.toInt, le)
        if (n > MaxEntries || at + 2 + 12L * n + 4 > p.length) {
          consistent = false; at = 0L
        } else {
          nIfds += 1
          at = u32(p, (at + 2 + 12L * n).toInt, le)
        }
      }
    }
    if (nIfds == 0L) return null
    // IFD0 fields
    val ifd0 = ifd0Off.toInt
    val n = u16(p, ifd0, le)
    var width: Any = null
    var height: Any = null
    var bps: Any = null
    var spp = 1L // TIFF default
    var comp = 1L // TIFF default: uncompressed
    var photometric: Any = null
    var rps: Any = null
    var tileW: Any = null
    var tileH: Any = null
    var stripCnt = -1L
    var tileCnt = -1L
    var i = 0
    while (i < n) {
      val e = ifd0 + 2 + 12 * i
      val tag = u16(p, e, le)
      val typ = u16(p, e + 2, le)
      val cnt = u32(p, e + 4, le)
      val vOff = e + 8
      tag match {
        case 0x0100 =>
          val v = scalar(p, typ, cnt, vOff, le); if (v >= 0) width = v
        case 0x0101 =>
          val v = scalar(p, typ, cnt, vOff, le); if (v >= 0) height = v
        case 0x0102 =>
          val v = firstShort(p, typ, cnt, vOff, le); if (v >= 0) bps = v
        case 0x0103 =>
          val v = scalar(p, typ, cnt, vOff, le); if (v >= 0) comp = v
        case 0x0106 =>
          val v = scalar(p, typ, cnt, vOff, le); if (v >= 0) photometric = v
        case 0x0111 =>
          stripCnt = cnt
          consistent &&= unitsInBounds(p, typ, cnt, vOff, le, asOffsets = true)
        case 0x0115 =>
          val v = scalar(p, typ, cnt, vOff, le); if (v >= 0) spp = v
        case 0x0116 =>
          val v = scalar(p, typ, cnt, vOff, le); if (v >= 0) rps = v
        case 0x0117 =>
          consistent &&= unitsInBounds(p, typ, cnt, vOff, le, asOffsets = false)
        case 0x0142 =>
          val v = scalar(p, typ, cnt, vOff, le); if (v >= 0) tileW = v
        case 0x0143 =>
          val v = scalar(p, typ, cnt, vOff, le); if (v >= 0) tileH = v
        case 0x0144 =>
          tileCnt = cnt
          consistent &&= unitsInBounds(p, typ, cnt, vOff, le, asOffsets = true)
        case 0x0145 =>
          consistent &&= unitsInBounds(p, typ, cnt, vOff, le, asOffsets = false)
        case _ =>
      }
      i += 1
    }
    val layout =
      if (tileCnt >= 0) "tile" else if (stripCnt >= 0) "strip" else "none"
    val nUnits: Any =
      if (tileCnt >= 0) tileCnt else if (stripCnt >= 0) stripCnt else null
    new GenericInternalRow(Array[Any](
      true, UTF8String.fromString(if (le) "II" else "MM"),
      nIfds, n.toLong, width, height, bps, spp, comp, photometric,
      UTF8String.fromString(layout), nUnits,
      if (layout == "strip") rps else null,
      tileW, tileH, consistent))
  }
}

/** Deterministic single/two-page TIFF synthesis from a doc_id — the
  * synthesis-side inverse of [[TiffMetaKernel]] in the `JpegEncoder`
  * convention (a Scala builder; the oracle recomputes the PARSED
  * fields closed-form from the same doc_id arithmetic, so a hash
  * match proves the parse inverts this byte layout): both byte
  * orders, strip AND tile layouts, inline and out-of-line value
  * arrays, a chained second IFD on every fourth doc.
  */
object TiffSynthKernel {
  def synth(d: Long): Array[Byte] = {
    val le = d % 2 == 0
    val w = 16 + d % 240
    val h = 8 + d % 120
    val spp = if (d % 3 == 0) 3 else 1
    val comp = Array(1L, 5L, 32773L)(((d / 2) % 3).toInt)
    val pm = if (spp == 3) 2L else d % 2
    val tiles = d % 5 == 2
    val ns = 1 + (d % 3).toInt
    val rps = (h + ns - 1) / ns
    val nt = ((w + 15) / 16 * ((h + 15) / 16)).toInt
    val nUnits = if (tiles) nt else ns
    val twoPages = d % 4 == 0
    val nE = if (tiles) 10 else 9

    val out = new java.io.ByteArrayOutputStream(256)
    def w16(v: Long): Unit = {
      val x = (v & 0xFFFF).toInt
      if (le) { out.write(x & 0xFF); out.write(x >> 8) }
      else { out.write(x >> 8); out.write(x & 0xFF) }
    }
    def w32(v: Long): Unit = {
      val x = v & 0xFFFFFFFFL
      if (le) {
        out.write((x & 0xFF).toInt); out.write(((x >> 8) & 0xFF).toInt)
        out.write(((x >> 16) & 0xFF).toInt); out.write(((x >> 24) & 0xFF).toInt)
      } else {
        out.write(((x >> 24) & 0xFF).toInt); out.write(((x >> 16) & 0xFF).toInt)
        out.write(((x >> 8) & 0xFF).toInt); out.write((x & 0xFF).toInt)
      }
    }
    // header
    if (le) { out.write('I'); out.write('I'); out.write(42); out.write(0) }
    else { out.write('M'); out.write('M'); out.write(0); out.write(42) }
    w32(8) // IFD0 right after the header
    // out-of-line area layout, computed up front
    val ifd0End = 8 + 2 + nE * 12 + 4
    val bpsOff = ifd0End // 3 SHORTs when spp == 3
    val bpsLen = if (spp == 3) 6 else 0
    val unitsOutOfLine = nUnits > 1
    val offArrOff = bpsOff + bpsLen
    val offArrLen = if (unitsOutOfLine) 4 * nUnits else 0
    val cntArrOff = offArrOff + offArrLen
    val cntArrLen = offArrLen
    val ifd1Off = cntArrOff + cntArrLen
    val ifd1Len = if (twoPages) 2 + 2 * 12 + 4 else 0
    val dataOff = ifd1Off + ifd1Len
    val unitBytes = 8L // shared filler; counts are synthetic

    def entry(tag: Int, typ: Int, cnt: Long)(value: => Unit): Unit = {
      w16(tag); w16(typ); w32(cnt)
      val before = out.size()
      value
      // pad the 4-byte value field (value writers emit ≤ 4 bytes)
      var pad = 4 - (out.size() - before)
      while (pad > 0) { out.write(0); pad -= 1 }
    }
    def shortEntry(tag: Int, v: Long): Unit =
      entry(tag, 3, 1L) { w16(v) }
    def longEntry(tag: Int, v: Long): Unit =
      entry(tag, 4, 1L) { w32(v) }

    // IFD0 (entries in ascending tag order, as TIFF requires)
    w16(nE)
    shortEntry(0x0100, w)
    shortEntry(0x0101, h)
    if (spp == 3) entry(0x0102, 3, 3L) { w32(bpsOff) }
    else shortEntry(0x0102, 8)
    shortEntry(0x0103, comp)
    shortEntry(0x0106, pm)
    if (!tiles) {
      if (unitsOutOfLine) entry(0x0111, 4, ns) { w32(offArrOff) }
      else longEntry(0x0111, dataOff)
      shortEntry(0x0115, spp)
      longEntry(0x0116, rps)
      if (unitsOutOfLine) entry(0x0117, 4, ns) { w32(cntArrOff) }
      else longEntry(0x0117, unitBytes)
    } else {
      shortEntry(0x0115, spp)
      shortEntry(0x0142, 16)
      shortEntry(0x0143, 16)
      if (unitsOutOfLine) entry(0x0144, 4, nt) { w32(offArrOff) }
      else longEntry(0x0144, dataOff)
      if (unitsOutOfLine) entry(0x0145, 4, nt) { w32(cntArrOff) }
      else longEntry(0x0145, unitBytes)
    }
    w32(if (twoPages) ifd1Off else 0) // next-IFD pointer
    // out-of-line values
    if (spp == 3) { w16(8); w16(8); w16(8) }
    if (unitsOutOfLine) {
      var i = 0
      while (i < nUnits) { w32(dataOff); i += 1 } // all units share the filler
      i = 0
      while (i < nUnits) { w32(unitBytes); i += 1 }
    }
    if (twoPages) { // minimal second page: dims only
      w16(2)
      shortEntry(0x0100, w)
      shortEntry(0x0101, h)
      w32(0)
    }
    var i = 0
    while (i < unitBytes) { out.write(0); i += 1 } // shared data filler
    out.toByteArray
  }
}

/** `tiff_meta(payload) → struct<...16 fields>`; see
  * [[TiffMetaKernel.parse]].
  */
case class TiffMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("tiff_valid", BooleanType),
    StructField("byte_order", StringType),
    StructField("n_ifds", LongType),
    StructField("n_ifd0_entries", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("bits_per_sample", LongType),
    StructField("samples_per_pixel", LongType),
    StructField("compression", LongType),
    StructField("photometric", LongType),
    StructField("layout", StringType),
    StructField("n_units", LongType),
    StructField("rows_per_strip", LongType),
    StructField("tile_w", LongType),
    StructField("tile_h", LongType),
    StructField("header_consistent", BooleanType)))
  override def nullable: Boolean = true
  override def prettyName: String = "tiff_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    TiffMetaKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.TiffMetaKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `tiff_synth(doc_id) → binary`; see [[TiffSynthKernel.synth]]. */
case class TiffSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "tiff_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    TiffSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.TiffSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
