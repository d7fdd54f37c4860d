package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** AVIF / HEIC image triage — the modern web image pair, both HEIF
  * (ISO/IEC 23008-12) images inside ISO BMFF: `ftyp` declares the
  * brand (`avif`/`avis` = AV1 payload, `heic`/`heix` = HEVC), and
  * the image description lives under `meta` — which, unlike the
  * plain containers [[Mp4BoxKernel]] walks, is a FULLBOX whose
  * children start 4 bytes (version/flags) past the header, the
  * detail that breaks naive MP4 walkers. The walk reads: primary
  * item type from `iinf`/`infe` entries (`av01`, `hvc1`, `Exif`,
  * `mime`), dimensions from `iprp`/`ipco`/`ispe`, the alpha
  * auxiliary (`auxC`) and embedded-EXIF flags, item count, and the
  * `mdat` payload size. Curation needs exactly this grain: route by
  * codec, dedup by dimensions, flag EXIF for the GPS-strip pass.
  *
  * Locate-only (no AV1/HEVC entropy decode — the codec tier is out
  * of scope and documented); bounded; never throws; null for
  * non-HEIF bytes.
  */
object AvifMetaKernel {
  val MaxBoxes = 4096

  private def u32(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xFFL) << 24) | ((p(off + 1) & 0xFFL) << 16) |
      ((p(off + 2) & 0xFFL) << 8) | (p(off + 3) & 0xFFL)

  private def fourcc(p: Array[Byte], off: Int): String =
    new String(p, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Find a box of `typ` in [lo, hi); returns (bodyStart, bodyEnd)
    * where body excludes the 8-byte header, or null. Size escapes
    * (largesize / to-EOF) handled as in [[Mp4BoxKernel]].
    */
  private def find(p: Array[Byte], lo0: Int, hi: Int,
      typ: String): (Int, Int) = {
    var pos = lo0
    var boxes = 0
    while (pos + 8 <= hi && boxes < MaxBoxes) {
      var size = u32(p, pos)
      var header = 8
      if (size == 1L) {
        if (pos + 16 > hi) return null
        size = 0L
        var i = 0
        while (i < 8) { size = (size << 8) | (p(pos + 8 + i) & 0xFFL); i += 1 }
        header = 16
      } else if (size == 0L) size = (hi - pos).toLong
      if (size < header || pos + size > hi) return null
      if (fourcc(p, pos + 4) == typ)
        return ((pos + header), (pos + size).toInt)
      pos += size.toInt
      boxes += 1
    }
    null
  }

  /** Struct of 8 fields (see [[AvifMeta.dataType]]) or null. */
  def parse(p: Array[Byte]): InternalRow = {
    if (p == null || p.length < 16) return null
    if (fourcc(p, 4) != "ftyp") return null
    val ftyp = find(p, 0, p.length, "ftyp")
    if (ftyp == null || ftyp._2 - ftyp._1 < 8) return null
    val brand = fourcc(p, ftyp._1)
    if (brand != "avif" && brand != "avis" && brand != "heic" &&
        brand != "heix" && brand != "mif1") return null
    val meta = find(p, 0, p.length, "meta")
    if (meta == null || meta._2 - meta._1 < 4) return null
    // meta is a FullBox: children start past version/flags
    val mLo = meta._1 + 4
    val mHi = meta._2
    var width = -1L
    var height = -1L
    val iprp = find(p, mLo, mHi, "iprp")
    if (iprp != null) {
      val ipco = find(p, iprp._1, iprp._2, "ipco")
      if (ipco != null) {
        val ispe = find(p, ipco._1, ipco._2, "ispe")
        if (ispe != null && ispe._2 - ispe._1 >= 12) {
          width = u32(p, ispe._1 + 4)
          height = u32(p, ispe._1 + 8)
        }
      }
    }
    // iinf: FullBox — version decides the entry_count width; then
    // infe entries carry the item types
    var nItems = -1L
    var primaryType: String = null
    var hasExif = false
    val iinf = find(p, mLo, mHi, "iinf")
    if (iinf != null && iinf._2 - iinf._1 >= 6) {
      val ver = p(iinf._1) & 0xFF
      val cntOff = iinf._1 + 4
      val (cnt, entriesAt) =
        if (ver == 0)
          (((p(cntOff) & 0xFFL) << 8) | (p(cntOff + 1) & 0xFFL),
            cntOff + 2)
        else (u32(p, cntOff), cntOff + 4)
      nItems = cnt
      var pos = entriesAt
      var i = 0L
      while (i < cnt && pos + 8 <= iinf._2) {
        val e = find(p, pos, iinf._2, "infe")
        if (e == null) { i = cnt }
        else {
          // infe v2: ver/flags(4) item_ID(2) protection(2) type(4)
          if (e._2 - e._1 >= 12) {
            val t = fourcc(p, e._1 + 8)
            if (primaryType == null && (t == "av01" || t == "hvc1" ||
                t == "grid")) primaryType = t
            if (t == "Exif") hasExif = true
          }
          pos = e._2
          i += 1
        }
      }
    }
    val hasAlpha = find(p, mLo, mHi, "auxC") != null || {
      val iprp2 = find(p, mLo, mHi, "iprp")
      if (iprp2 == null) false
      else {
        val ipco = find(p, iprp2._1, iprp2._2, "ipco")
        ipco != null && find(p, ipco._1, ipco._2, "auxC") != null
      }
    }
    val mdat = find(p, 0, p.length, "mdat")
    val mdatBytes = if (mdat == null) -1L else (mdat._2 - mdat._1).toLong
    def l(v: Long): Any = if (v < 0) null else java.lang.Long.valueOf(v)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(brand), l(width), l(height), l(nItems),
      if (primaryType == null) null else UTF8String.fromString(primaryType),
      hasAlpha, hasExif, l(mdatBytes)))
  }
}

/** Deterministic HEIF containers from a doc_id: brand lane
  * `avif`+`av01` (even) / `heic`+`hvc1` (odd); dimensions
  * `64 + d%512` × `48 + d%256` in a real `iprp`/`ipco`/`ispe` chain
  * under the FullBox `meta`; `1 + d%3` items — primary, an alpha
  * aux (d%3>=1, with its `auxC` property), an `Exif` item (d%3==2);
  * an `mdat` of `100 + d%900` payload bytes. The d%20==9 lane is a
  * 64-bit-largesize mdat (the size escape the walk must take).
  */
object AvifSynthKernel {

  private final class W {
    val out = new java.io.ByteArrayOutputStream(256)
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32(v: Long): Unit = {
      u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt); u8(v.toInt)
    }
    def u64(v: Long): Unit = { u32(v >>> 32); u32(v & 0xFFFFFFFFL) }
    def cc(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    def raw(b: Array[Byte]): Unit = out.write(b, 0, b.length)
  }

  private def box(typ: String, body: Array[Byte]): Array[Byte] = {
    val w = new W
    w.u32(8L + body.length)
    w.cc(typ)
    w.raw(body)
    w.out.toByteArray
  }

  private def fullBox(typ: String, ver: Int, body: Array[Byte]): Array[Byte] = {
    val w = new W
    w.u32(12L + body.length)
    w.cc(typ)
    w.u8(ver); w.u8(0); w.u8(0); w.u8(0)
    w.raw(body)
    w.out.toByteArray
  }

  def synth(d: Long): Array[Byte] = {
    val avif = d % 2 == 0
    val wPx = 64 + d % 512
    val hPx = 48 + d % 256
    val nIt = (1 + d % 3).toInt
    val codec = if (avif) "av01" else "hvc1"
    def infe(id: Int, typ: String): Array[Byte] = {
      val w = new W
      w.u16(id); w.u16(0); w.cc(typ); w.u8(0) // null-term empty name
      fullBox("infe", 2, w.out.toByteArray)
    }
    val entries = new java.io.ByteArrayOutputStream()
    entries.write(infe(1, codec), 0, infe(1, codec).length)
    if (nIt >= 2) { val e = infe(2, codec); entries.write(e, 0, e.length) }
    if (nIt >= 3) { val e = infe(3, "Exif"); entries.write(e, 0, e.length) }
    val iinfBody = new W
    iinfBody.u16(nIt)
    iinfBody.raw(entries.toByteArray)
    val ispeBody = new W
    ispeBody.u32(wPx); ispeBody.u32(hPx)
    val ipcoParts = new java.io.ByteArrayOutputStream()
    val ispe = fullBox("ispe", 0, ispeBody.out.toByteArray)
    ipcoParts.write(ispe, 0, ispe.length)
    if (nIt >= 2) {
      // alpha auxiliary property for item 2
      val auxBody = new W
      auxBody.cc("urn:") // abbreviated aux type, null-terminated
      auxBody.u8(0)
      val auxC = fullBox("auxC", 0, auxBody.out.toByteArray)
      ipcoParts.write(auxC, 0, auxC.length)
    }
    val ipco = box("ipco", ipcoParts.toByteArray)
    val iprp = box("iprp", ipco)
    val hdlrBody = new W
    hdlrBody.u32(0); hdlrBody.cc("pict")
    hdlrBody.u32(0); hdlrBody.u32(0); hdlrBody.u32(0)
    hdlrBody.u8(0)
    val hdlr = fullBox("hdlr", 0, hdlrBody.out.toByteArray)
    val pitmBody = new W
    pitmBody.u16(1)
    val pitm = fullBox("pitm", 0, pitmBody.out.toByteArray)
    val iinf = fullBox("iinf", 0, iinfBody.out.toByteArray)
    val metaKids = new java.io.ByteArrayOutputStream()
    for (b <- Seq(hdlr, pitm, iinf, iprp)) metaKids.write(b, 0, b.length)
    val meta = fullBox("meta", 0, metaKids.toByteArray)
    val ftypBody = new W
    ftypBody.cc(if (avif) "avif" else "heic")
    ftypBody.u32(0)
    ftypBody.cc(if (avif) "avif" else "heic")
    ftypBody.cc("mif1")
    val ftyp = box("ftyp", ftypBody.out.toByteArray)
    val payload = Array.tabulate((100 + d % 900).toInt)(i =>
      ((d * 31 + i * 7) % 251).toByte)
    val mdat =
      if (d % 20 == 9) {
        // 64-bit largesize escape
        val w = new W
        w.u32(1L)
        w.cc("mdat")
        w.u64(16L + payload.length)
        w.raw(payload)
        w.out.toByteArray
      } else box("mdat", payload)
    val all = new java.io.ByteArrayOutputStream()
    for (b <- Seq(ftyp, meta, mdat)) all.write(b, 0, b.length)
    all.toByteArray
  }
}

/** `avif_meta(payload) → struct<...8 fields>`; see
  * [[AvifMetaKernel.parse]].
  */
case class AvifMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_items", LongType),
    StructField("primary_type", StringType),
    StructField("has_alpha", BooleanType),
    StructField("has_exif", BooleanType),
    StructField("mdat_bytes", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "avif_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    AvifMetaKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.AvifMetaKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `avif_synth(doc_id) → binary`; see [[AvifSynthKernel.synth]]. */
case class AvifSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "avif_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    AvifSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.AvifSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
