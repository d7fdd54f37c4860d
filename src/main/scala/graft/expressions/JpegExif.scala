package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** EXIF triage kernel — the image-PRIVACY pass an image corpus needs
  * before publication: JPEG APP1/Exif carries camera identity and,
  * critically, a GPS sub-IFD with the capture location (the classic
  * dataset-PII lesson: faces can be blurred, but embedded coordinates
  * ship silently unless something LOOKS). The kernel walks the marker
  * stream to the first `APP1` whose payload is `Exif\0\0`, reads the
  * TIFF header (both byte orders), and scans IFD0 for the triage
  * tags: Orientation (0x0112 — the display-correctness field),
  * Make/Model (0x010F/0x0110 — ASCII, inline or offset-addressed),
  * and the GPS IFD pointer (0x8825 — PRESENCE is the privacy flag;
  * the kernel deliberately does not decode coordinates).
  *
  * Null (never a throw) on non-JPEG bytes; a valid JPEG with no Exif
  * APP1 yields `exif_present = false` with null fields — "no
  * metadata" and "not an image" are different facts. All offsets are
  * attacker-controlled: every read is bounds-checked, entry counts
  * capped, string reads capped at [[MaxStr]] bytes.
  */
object JpegExifKernel {
  val MaxEntries = 512
  val MaxStr = 128

  private def u16(p: Array[Byte], off: Int, le: Boolean): Int =
    if (le) (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    else ((p(off) & 0xFF) << 8) | (p(off + 1) & 0xFF)

  private def u32(p: Array[Byte], off: Int, le: Boolean): Long =
    if (le) (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)
    else ((p(off) & 0xFFL) << 24) | ((p(off + 1) & 0xFFL) << 16) |
      ((p(off + 2) & 0xFFL) << 8) | (p(off + 3) & 0xFFL)

  /** ASCII tag value: `count` bytes inline (≤ 4) or at `valOff`
    * relative to the TIFF base; trailing NULs stripped; null on any
    * bound violation.
    */
  private def ascii(p: Array[Byte], tiffBase: Int, entryValOff: Int,
      count: Long, le: Boolean): UTF8String = {
    if (count <= 0 || count > MaxStr) return null
    val n = count.toInt
    val start =
      if (n <= 4) entryValOff
      else {
        val off = u32(p, entryValOff, le)
        if (off < 0 || tiffBase + off + n > p.length) return null
        (tiffBase + off).toInt
      }
    if (start + n > p.length) return null
    var end = start + n
    while (end > start && p(end - 1) == 0) end -= 1
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(p, start, end))
  }

  /** (exif_present, byte_order, n_ifd0_entries, orientation, make,
    * model, has_gps) as an InternalRow, or null for non-JPEG bytes.
    */
  def parse(p: Array[Byte]): InternalRow = {
    if (p.length < 4) return null
    if ((p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) return null
    val noExif = new GenericInternalRow(
      Array[Any](false, null, null, null, null, null, null))
    // marker walk to the first Exif APP1; SOS/EOI/garbage ends it
    var pos = 2
    var app1 = -1
    var app1Len = 0
    while (app1 < 0) {
      if (pos + 1 >= p.length) return noExif
      if ((p(pos) & 0xFF) != 0xFF) return noExif
      var m = p(pos + 1) & 0xFF
      pos += 2
      while (m == 0xFF) {
        if (pos >= p.length) return noExif
        m = p(pos) & 0xFF
        pos += 1
      }
      m match {
        case 0xD8 => // stray SOI
        case 0xD9 | 0xDA => return noExif
        case x if x >= 0xD0 && x <= 0xD7 => // RST: no length
        case _ =>
          if (pos + 1 >= p.length) return noExif
          val len = u16(p, pos, le = false)
          if (len < 2 || pos + len > p.length) return noExif
          if (m == 0xE1 && len >= 2 + 6 + 8 &&
              p(pos + 2) == 'E' && p(pos + 3) == 'x' && p(pos + 4) == 'i' &&
              p(pos + 5) == 'f' && p(pos + 6) == 0 && p(pos + 7) == 0) {
            app1 = pos + 8
            app1Len = len - 8
          }
          pos += len
      }
    }
    val base = app1
    val end = base + app1Len
    if (base + 8 > end || end > p.length) return noExif
    val le =
      if (p(base) == 'I' && p(base + 1) == 'I') true
      else if (p(base) == 'M' && p(base + 1) == 'M') false
      else return noExif
    if (u16(p, base + 2, le) != 42) return noExif
    val ifd0Off = u32(p, base + 4, le)
    if (ifd0Off < 0 || base + ifd0Off + 2 > end) return noExif
    val ifd0 = (base + ifd0Off).toInt
    val n = u16(p, ifd0, le)
    if (n > MaxEntries || ifd0 + 2 + 12L * n > end) return noExif
    var orientation: Any = null
    var make: Any = null
    var model: Any = null
    var hasGps = false
    var i = 0
    while (i < n) {
      // 12-byte entry: tag(2) type(2) count(4) value-or-offset(4)
      val e = ifd0 + 2 + 12 * i
      val tag = u16(p, e, le)
      val typ = u16(p, e + 2, le)
      val cnt = u32(p, e + 4, le)
      val vOff = e + 8
      tag match {
        case 0x010F => if (typ == 2) make = ascii(p, base, vOff, cnt, le)
        case 0x0110 => if (typ == 2) model = ascii(p, base, vOff, cnt, le)
        case 0x0112 =>
          // SHORT, count 1: the value occupies the first two bytes
          // of the value field in the stream's byte order
          if (typ == 3 && cnt == 1L) orientation = u16(p, vOff, le).toLong
        case 0x8825 => hasGps = true
        case _ =>
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      true, UTF8String.fromString(if (le) "II" else "MM"),
      n.toLong, orientation, make, model, hasGps))
  }
}

/** `jpeg_exif(payload) → struct<exif_present, byte_order,
  * n_ifd0_entries, orientation, make, model, has_gps>`; see
  * [[JpegExifKernel.parse]].
  */
case class JpegExif(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("exif_present", BooleanType),
    StructField("byte_order", StringType),
    StructField("n_ifd0_entries", LongType),
    StructField("orientation", LongType),
    StructField("make", StringType),
    StructField("model", StringType),
    StructField("has_gps", BooleanType)))
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_exif"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    JpegExifKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.JpegExifKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
