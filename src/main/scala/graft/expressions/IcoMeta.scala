package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ICO container triage + pixel tier — the TWENTIETH family: the
  * favicon format, which a web crawl collects by the million
  * (`/favicon.ico` predates `<link rel>`). An ICO is an ICONDIR
  * (reserved 0, type 1, count) of 16-byte entries — width/height
  * bytes with the 0-means-256 rule, color count, planes, bit count,
  * image byte size, image offset — each pointing at EITHER a
  * complete PNG stream (the modern favicon) or a headerless DIB: a
  * BITMAPINFOHEADER whose declared height is DOUBLED (XOR pixels +
  * the 1-bpp AND transparency mask), rows bottom-up, strides
  * 4-aligned.
  *
  * The pixel tier COMPOSES the engine's existing decoders: PNG
  * entries inflate through the real zlib kernel and unfilter through
  * [[PngFilterKernel]] (RGB8 non-interlaced profile; others counted,
  * not decoded); DIB entries decode the 24/32-bpp uncompressed
  * profile directly. `dims_match` is the integrity verdict: the
  * directory entry's declared dimensions (after the 0→256 rule) must
  * equal every decoded image's actual dimensions. Never throws;
  * entry/pixel caps.
  *
  * Reference behavior: beyond-reference (lshrs reads parquet only).
  */
object IcoMetaKernel {
  val MaxIcons = 256
  val MaxPixels: Long = 1L << 22

  private def u16le(p: Array[Byte], off: Int): Int =
    (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)

  private def u32le(p: Array[Byte], off: Int): Long =
    (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)

  def isIco(p: Array[Byte]): Boolean =
    p.length >= 22 && p(0) == 0 && p(1) == 0 && p(2) == 1 && p(3) == 0 &&
      u16le(p, 4) >= 1

  /** (width, height, sumRGB) or null — headerless DIB at
    * [off, off+len): BITMAPINFOHEADER with DOUBLED height, bottom-up
    * 4-aligned rows, 24/32 bpp uncompressed; the AND mask is present
    * but not summed.
    */
  private def decodeDib(p: Array[Byte], off: Int, len: Int): (Long, Long, Long) = {
    if (len < 40 || off + 40 > p.length) return null
    if (u32le(p, off) != 40L) return null
    val w = u32le(p, off + 4)
    val h2 = u32le(p, off + 8)
    val bpp = u16le(p, off + 14)
    val compression = u32le(p, off + 16)
    if (w <= 0 || w > 4096 || h2 <= 0 || h2 > 8192 || h2 % 2 != 0) return null
    if ((bpp != 24 && bpp != 32) || compression != 0L) return null
    val h = (h2 / 2).toInt
    val wi = w.toInt
    if (w * h > MaxPixels) return null
    val stride = ((wi * (bpp / 8) + 3) / 4) * 4
    val maskStride = ((wi + 31) / 32) * 4
    if (40L + stride.toLong * h + maskStride.toLong * h > len) return null
    var sum = 0L
    var y = 0
    while (y < h) {
      val row = off + 40 + (h - 1 - y) * stride
      var x = 0
      while (x < wi) {
        val px = row + x * (bpp / 8)
        sum += (p(px) & 0xFF) + (p(px + 1) & 0xFF) + (p(px + 2) & 0xFF)
        x += 1
      }
      y += 1
    }
    (w, h.toLong, sum)
  }

  /** (width, height, sumRGB) or null — a complete PNG stream at
    * [off, off+len): RGB8 non-interlaced profile through the real
    * zlib inflate + the shared scanline unfilter.
    */
  private def decodePng(p: Array[Byte], off: Int, len: Int): (Long, Long, Long) = {
    if (len < 45 || off + len > p.length) return null
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
    var i = 0
    while (i < 8) { if ((p(off + i) & 0xFF) != sig(i)) return null; i += 1 }
    var pos = off + 8
    val end = off + len
    var w = -1L
    var h = -1L
    var profileOk = false
    val idat = new java.io.ByteArrayOutputStream(256)
    var done = false
    while (!done && pos + 8 <= end) {
      val clen = ((p(pos) & 0xFFL) << 24) | ((p(pos + 1) & 0xFFL) << 16) |
        ((p(pos + 2) & 0xFFL) << 8) | (p(pos + 3) & 0xFFL)
      val ctype = new String(p, pos + 4, 4, "US-ASCII")
      if (clen < 0 || pos + 12 + clen > end) return null
      val dataOff = pos + 8
      ctype match {
        case "IHDR" =>
          if (clen != 13) return null
          w = ((p(dataOff) & 0xFFL) << 24) | ((p(dataOff + 1) & 0xFFL) << 16) |
            ((p(dataOff + 2) & 0xFFL) << 8) | (p(dataOff + 3) & 0xFFL)
          h = ((p(dataOff + 4) & 0xFFL) << 24) | ((p(dataOff + 5) & 0xFFL) << 16) |
            ((p(dataOff + 6) & 0xFFL) << 8) | (p(dataOff + 7) & 0xFFL)
          profileOk = (p(dataOff + 8) & 0xFF) == 8 &&
            (p(dataOff + 9) & 0xFF) == 2 && (p(dataOff + 12) & 0xFF) == 0
        case "IDAT" =>
          idat.write(p, dataOff, clen.toInt)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      pos += 12 + clen.toInt
    }
    if (w <= 0 || h <= 0 || w * h > MaxPixels || !profileOk) return null
    val raster = ZlibKernel.inflate(idat.toByteArray,
      ((3 * w + 1) * h).toInt max 64)
    if (raster == null) return null
    val stats = PngFilterKernel.stats(raster,
      new GenericArrayData(Array[Any](w, h)))
    if (stats == null) return null
    (w, h, stats.getLong(1) + stats.getLong(2) + stats.getLong(3))
  }

  /** Struct of 11 fields (see [[IcoMeta.dataType]]) or null for
    * non-ICO bytes.
    */
  def parse(p: Array[Byte]): InternalRow = {
    if (!isIco(p)) return null
    val n = u16le(p, 4)
    if (n > MaxIcons || 6 + 16 * n > p.length) return null
    var nPng = 0L
    var nDib = 0L
    var maxW = 0L
    var maxH = 0L
    var entriesOk = true
    var nDecoded = 0L
    var pixelSum = 0L
    var dimsMatch = true
    var totalBytes = 0L
    var e = 0
    while (e < n) {
      val eo = 6 + 16 * e
      val declW = if ((p(eo) & 0xFF) == 0) 256L else (p(eo) & 0xFFL)
      val declH = if ((p(eo + 1) & 0xFF) == 0) 256L else (p(eo + 1) & 0xFFL)
      if (declW > maxW) maxW = declW
      if (declH > maxH) maxH = declH
      val bytesInRes = u32le(p, eo + 8)
      val imgOff = u32le(p, eo + 12)
      totalBytes += bytesInRes
      if (imgOff < 6 + 16L * n || bytesInRes <= 0 ||
          imgOff + bytesInRes > p.length) entriesOk = false
      else {
        val off = imgOff.toInt
        val len = bytesInRes.toInt
        val isPng = len >= 8 && (p(off) & 0xFF) == 0x89 &&
          p(off + 1) == 'P' && p(off + 2) == 'N' && p(off + 3) == 'G'
        val d = if (isPng) { nPng += 1; decodePng(p, off, len) }
          else { nDib += 1; decodeDib(p, off, len) }
        if (d != null) {
          nDecoded += 1
          pixelSum += d._3
          if (d._1 != declW || d._2 != declH) dimsMatch = false
        }
      }
      e += 1
    }
    new GenericInternalRow(Array[Any](
      true, n.toLong, nPng, nDib, maxW, maxH, entriesOk, nDecoded,
      if (nDecoded == 0L) null else java.lang.Long.valueOf(pixelSum),
      if (nDecoded == 0L) null else java.lang.Boolean.valueOf(dimsMatch),
      totalBytes))
  }
}

/** Deterministic ICO synthesis from a doc_id — REAL containers whose
  * entries rotate the payload kinds by `(d+i)%3`: a 24-bpp DIB, a
  * 32-bpp DIB (constant alpha, not summed), and a REAL PNG (RGB8,
  * rows forward-filtered with type `(d+i+y)%5` through the shared
  * kernel, zlib-wrapped as STORED deflate so the byte length stays
  * closed-form for the mixed-triage oracle — still a real zlib
  * stream with a real Adler-32). Entry `i` is `4+(d+i)%5` ×
  * `3+(d+i)%4` with logical RGB byte `k = (5d + 17i + k) mod 256`,
  * so the pixel sum is closed-form across all three kinds. The
  * `d%20==11` lane lies by one in the FIRST entry's width byte
  * (`dims_match` false). Byte length: `6 + 16·n + Σ bytesInRes`
  * where DIB24 = 40 + h·align4(3w) + h·maskStride, DIB32 = 40 +
  * 4wh + h·maskStride, PNG = 68 + h·(1+3w).
  */
object IcoSynthKernel {
  private def pixels(d: Long, i: Int, w: Int, h: Int): Array[Byte] =
    Array.tabulate(3 * w * h)(k => ((5 * d + 17 * i + k) % 256).toByte)

  private def storedZlib(raw: Array[Byte]): Array[Byte] = {
    require(raw.length < 65536)
    val out = new java.io.ByteArrayOutputStream(raw.length + 16)
    out.write(0x78); out.write(0x01)
    out.write(1) // BFINAL=1, BTYPE=00 stored
    out.write(raw.length & 0xFF); out.write((raw.length >> 8) & 0xFF)
    out.write(~raw.length & 0xFF); out.write((~raw.length >> 8) & 0xFF)
    out.write(raw, 0, raw.length)
    val ad = new java.util.zip.Adler32()
    ad.update(raw, 0, raw.length)
    val a = ad.getValue
    out.write(((a >> 24) & 0xFF).toInt); out.write(((a >> 16) & 0xFF).toInt)
    out.write(((a >> 8) & 0xFF).toInt); out.write((a & 0xFF).toInt)
    out.toByteArray
  }

  private def pngBytes(d: Long, i: Int, w: Int, h: Int): Array[Byte] = {
    val filtered = PngForwardKernel.forward(pixels(d, i, w, h),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](w.toLong, h.toLong, d + i, 0L)))
    val out = new java.io.ByteArrayOutputStream(256)
    def u32be(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      u32be(data.length.toLong)
      val tb = ctype.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb, 0, 4)
      crc.update(data, 0, data.length)
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      u32be(crc.getValue)
    }
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte), 0, 8)
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >> 24) & 0xFF).toByte; ihdr(1) = ((w >> 16) & 0xFF).toByte
    ihdr(2) = ((w >> 8) & 0xFF).toByte; ihdr(3) = (w & 0xFF).toByte
    ihdr(4) = ((h >> 24) & 0xFF).toByte; ihdr(5) = ((h >> 16) & 0xFF).toByte
    ihdr(6) = ((h >> 8) & 0xFF).toByte; ihdr(7) = (h & 0xFF).toByte
    ihdr(8) = 8; ihdr(9) = 2 // RGB8
    chunk("IHDR", ihdr)
    chunk("IDAT", storedZlib(filtered))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def dibBytes(d: Long, i: Int, w: Int, h: Int, bpp: Int): Array[Byte] = {
    val stride = ((w * (bpp / 8) + 3) / 4) * 4
    val maskStride = ((w + 31) / 32) * 4
    val out = new Array[Byte](40 + stride * h + maskStride * h)
    def u32le(off: Int, v: Long): Unit = {
      var k = 0
      while (k < 4) { out(off + k) = ((v >>> (8 * k)) & 0xFF).toByte; k += 1 }
    }
    u32le(0, 40L)
    u32le(4, w.toLong)
    u32le(8, 2L * h) // DOUBLED height: XOR + AND mask
    out(12) = 1 // planes
    out(14) = bpp.toByte
    val px = pixels(d, i, w, h)
    var y = 0
    while (y < h) {
      val row = 40 + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val k = (y * w + x) * 3
        val o = row + x * (bpp / 8)
        out(o) = px(k + 2) // B
        out(o + 1) = px(k + 1) // G
        out(o + 2) = px(k) // R
        if (bpp == 32) out(o + 3) = ((d + i) % 256).toByte // alpha
        x += 1
      }
      y += 1
    }
    out
  }

  def synth(d: Long): Array[Byte] = {
    val n = (1 + d % 3).toInt
    val images = Array.tabulate(n) { i =>
      val w = (4 + (d + i) % 5).toInt
      val h = (3 + (d + i) % 4).toInt
      val img = ((d + i) % 3).toInt match {
        case 0 => dibBytes(d, i, w, h, 24)
        case 1 => dibBytes(d, i, w, h, 32)
        case _ => pngBytes(d, i, w, h)
      }
      (w, h, img)
    }
    val out = new java.io.ByteArrayOutputStream(512)
    out.write(0); out.write(0); out.write(1); out.write(0)
    out.write(n & 0xFF); out.write((n >> 8) & 0xFF)
    var off = 6 + 16 * n
    var i = 0
    while (i < n) {
      val (w, h, img) = images(i)
      // the d%20==11 lane lies by one in the FIRST entry's width byte
      val declW = if (d % 20 == 11 && i == 0) w + 1 else w
      out.write(declW & 0xFF)
      out.write(h & 0xFF)
      out.write(0) // color count
      out.write(0) // reserved
      out.write(1); out.write(0) // planes
      out.write(if ((d + i) % 3 == 1) 32 else 24); out.write(0)
      var k = 0
      while (k < 4) { out.write((img.length >> (8 * k)) & 0xFF); k += 1 }
      k = 0
      while (k < 4) { out.write((off >> (8 * k)) & 0xFF); k += 1 }
      off += img.length
      i += 1
    }
    i = 0
    while (i < n) { out.write(images(i)._3, 0, images(i)._3.length); i += 1 }
    out.toByteArray
  }
}

/** `ico_meta(payload) → struct<...11 fields>`; see
  * [[IcoMetaKernel.parse]].
  */
case class IcoMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("ico_valid", BooleanType),
    StructField("n_icons", LongType),
    StructField("n_png_entries", LongType),
    StructField("n_dib_entries", LongType),
    StructField("max_width", LongType),
    StructField("max_height", LongType),
    StructField("entries_ok", BooleanType),
    StructField("n_decoded", LongType),
    StructField("pixel_sum", LongType),
    StructField("dims_match", BooleanType),
    StructField("total_image_bytes", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "ico_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    IcoMetaKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.IcoMetaKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `ico_synth(doc_id) → binary`; see [[IcoSynthKernel.synth]]. */
case class IcoSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "ico_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    IcoSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.IcoSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
