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
  * and the GPS IFD pointer (0x8825 — presence is the privacy FLAG,
  * and the sub-IFD's refs + deg/min/sec rationals decode to signed
  * decimal degrees, so a curation pass can drop/quantize/strip
  * rather than only flag).
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

  /** `count`-3 RATIONAL coordinate (deg, min, sec as num/den pairs at
    * the entry's offset) folded to decimal degrees, or null on any
    * bound violation / zero denominator. The fold order
    * `d + m/60 + s/3600` (each division exactly rounded) is mirrored
    * verbatim by the oracle, so the doubles are cross-engine exact.
    */
  private def rational3(p: Array[Byte], tiffBase: Int, entryValOff: Int,
      count: Long, le: Boolean, end: Int): Any = {
    if (count != 3L) return null
    val off = u32(p, entryValOff, le)
    if (off < 0 || tiffBase + off + 24 > end ||
      tiffBase + off + 24 > p.length) return null
    val at = (tiffBase + off).toInt
    var v = 0.0d
    var i = 0
    val scale = Array(1.0d, 60.0d, 3600.0d)
    while (i < 3) {
      val num = u32(p, at + 8 * i, le)
      val den = u32(p, at + 8 * i + 4, le)
      if (den == 0L) return null
      v += num.toDouble / den.toDouble / scale(i)
      i += 1
    }
    java.lang.Double.valueOf(v)
  }

  /** (exif_present, byte_order, n_ifd0_entries, orientation, make,
    * model, has_gps, gps_lat, gps_lon) as an InternalRow, or null for
    * non-JPEG bytes. `gps_lat`/`gps_lon` are signed decimal degrees
    * read from the GPS sub-IFD (tags 1-4: refs + deg/min/sec
    * rationals) — the coordinates themselves, so a curation pass can
    * decide to drop, quantize, or strip rather than only flag.
    */
  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 4 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8

  /** Marker walk to the first Exif APP1: `(payload offset past
    * Exif\0\0, byte length after it)`, or null when no Exif segment
    * exists before SOS/EOI/garbage — shared by [[parse]] and
    * [[JpegStripGpsKernel.strip]] so the two faces cannot disagree on
    * which segment "the" EXIF is.
    */
  private[expressions] def findExif(p: Array[Byte]): Array[Int] = {
    var pos = 2
    while (true) {
      if (pos + 1 >= p.length) return null
      if ((p(pos) & 0xFF) != 0xFF) return null
      var m = p(pos + 1) & 0xFF
      pos += 2
      while (m == 0xFF) {
        if (pos >= p.length) return null
        m = p(pos) & 0xFF
        pos += 1
      }
      m match {
        case 0xD8 => // stray SOI
        case 0xD9 | 0xDA => return null
        case x if x >= 0xD0 && x <= 0xD7 => // RST: no length
        case _ =>
          if (pos + 1 >= p.length) return null
          val len = u16(p, pos, le = false)
          if (len < 2 || pos + len > p.length) return null
          if (m == 0xE1 && len >= 2 + 6 + 8 &&
              p(pos + 2) == 'E' && p(pos + 3) == 'x' && p(pos + 4) == 'i' &&
              p(pos + 5) == 'f' && p(pos + 6) == 0 && p(pos + 7) == 0)
            return Array(pos + 8, len - 8)
          pos += len
      }
    }
    null // unreachable
  }

  def parse(p: Array[Byte]): InternalRow = {
    if (!isJpeg(p)) return null
    val noExif = new GenericInternalRow(
      Array[Any](false, null, null, null, null, null, null, null, null))
    val found = findExif(p)
    if (found == null) return noExif
    val base = found(0)
    val end = base + found(1)
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
    var gpsPtr = -1L
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
        case 0x8825 =>
          hasGps = true
          if (typ == 4 && cnt == 1L) gpsPtr = u32(p, vOff, le)
        case _ =>
      }
      i += 1
    }
    // GPS sub-IFD: refs (N/S, E/W) + deg/min/sec rationals → signed
    // decimal degrees; any structural violation leaves the fields
    // null with has_gps still true (the pointer existed)
    var gpsLat: Any = null
    var gpsLon: Any = null
    if (gpsPtr >= 0 && base + gpsPtr + 2 <= end) {
      val g = (base + gpsPtr).toInt
      val gn = u16(p, g, le)
      if (gn <= MaxEntries && g + 2 + 12L * gn <= end) {
        var latRef: String = null
        var lonRef: String = null
        var lat: Any = null
        var lon: Any = null
        var j = 0
        while (j < gn) {
          val e = g + 2 + 12 * j
          val tag = u16(p, e, le)
          val typ = u16(p, e + 2, le)
          val cnt = u32(p, e + 4, le)
          val vOff = e + 8
          tag match {
            case 1 => if (typ == 2) {
              val r = ascii(p, base, vOff, cnt, le)
              if (r != null) latRef = r.toString
            }
            case 2 => if (typ == 5) lat = rational3(p, base, vOff, cnt, le, end)
            case 3 => if (typ == 2) {
              val r = ascii(p, base, vOff, cnt, le)
              if (r != null) lonRef = r.toString
            }
            case 4 => if (typ == 5) lon = rational3(p, base, vOff, cnt, le, end)
            case _ =>
          }
          j += 1
        }
        if (lat != null && latRef != null)
          gpsLat = java.lang.Double.valueOf(
            if (latRef == "S") -lat.asInstanceOf[java.lang.Double].doubleValue
            else lat.asInstanceOf[java.lang.Double].doubleValue)
        if (lon != null && lonRef != null)
          gpsLon = java.lang.Double.valueOf(
            if (lonRef == "W") -lon.asInstanceOf[java.lang.Double].doubleValue
            else lon.asInstanceOf[java.lang.Double].doubleValue)
      }
    }
    new GenericInternalRow(Array[Any](
      true, UTF8String.fromString(if (le) "II" else "MM"),
      n.toLong, orientation, make, model, hasGps, gpsLat, gpsLon))
  }

  /** EXIF orientation (1-8) of a JPEG payload, defaulting to 1 (no
    * rotation) when the payload has no EXIF, a malformed IFD, or an
    * out-of-range tag value — the lightweight probe the dHash path
    * uses (r15) so rotated re-posts collide with their originals.
    */
  def orientationOf(p: Array[Byte]): Int = {
    if (!isJpeg(p)) return 1
    val found = findExif(p)
    if (found == null) return 1
    val base = found(0)
    val end = base + found(1)
    if (base + 8 > end || end > p.length) return 1
    val le =
      if (p(base) == 'I' && p(base + 1) == 'I') true
      else if (p(base) == 'M' && p(base + 1) == 'M') false
      else return 1
    if (u16(p, base + 2, le) != 42) return 1
    val ifd0Off = u32(p, base + 4, le)
    if (ifd0Off < 0 || base + ifd0Off + 2 > end) return 1
    val ifd0 = (base + ifd0Off).toInt
    val n = u16(p, ifd0, le)
    if (n > MaxEntries || ifd0 + 2 + 12L * n > end) return 1
    var i = 0
    while (i < n) {
      val e = ifd0 + 2 + 12 * i
      if (u16(p, e, le) == 0x0112 && u16(p, e + 2, le) == 3 &&
          u32(p, e + 4, le) == 1L) {
        val v = u16(p, e + 8, le)
        return if (v >= 1 && v <= 8) v else 1
      }
      i += 1
    }
    1
  }
}

/** `jpeg_exif(payload) → struct<exif_present, byte_order,
  * n_ifd0_entries, orientation, make, model, has_gps, gps_lat,
  * gps_lon>`; see [[JpegExifKernel.parse]].
  */
case class JpegExif(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("exif_present", BooleanType),
    StructField("byte_order", StringType),
    StructField("n_ifd0_entries", LongType),
    StructField("orientation", LongType),
    StructField("make", StringType),
    StructField("model", StringType),
    StructField("has_gps", BooleanType),
    StructField("gps_lat", DoubleType),
    StructField("gps_lon", DoubleType)))
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

/** GPS-strip REWRITE — the curation ACTION the triage above only
  * flags: produce a payload with the location data gone and
  * everything else intact. The rewrite is deliberately
  * length-preserving so no TIFF offset anywhere else needs
  * recomputation (EXIF interop is a graveyard of shifted-offset
  * corruptions): the GPS sub-IFD pointer entries are REMOVED from
  * IFD0 (entries compacted, count decremented, next-IFD offset moved
  * up, stale tail zeroed), and the GPS sub-IFD itself — entry table
  * AND every out-of-line value it references (the lat/lon rationals)
  * — is ZEROED in place, so the coordinates are destroyed, not just
  * unlinked. Bytes outside the Exif APP1 segment are untouched:
  * entropy-coded image data is bit-identical by construction.
  * Non-JPEG, Exif-less, or GPS-less payloads return unchanged
  * (idempotent, total — safe to run over a whole mixed corpus).
  */
object JpegStripGpsKernel {
  private def u16(p: Array[Byte], off: Int, le: Boolean): Int =
    if (le) (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    else ((p(off) & 0xFF) << 8) | (p(off + 1) & 0xFF)

  private def u32(p: Array[Byte], off: Int, le: Boolean): Long =
    if (le) (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)
    else ((p(off) & 0xFFL) << 24) | ((p(off + 1) & 0xFFL) << 16) |
      ((p(off + 2) & 0xFFL) << 8) | (p(off + 3) & 0xFFL)

  private def putU16(p: Array[Byte], off: Int, v: Int, le: Boolean): Unit =
    if (le) { p(off) = v.toByte; p(off + 1) = (v >> 8).toByte }
    else { p(off) = (v >> 8).toByte; p(off + 1) = v.toByte }

  /** TIFF type byte widths (type 1..12); 0 for unknown types — an
    * unknown type is never treated as out-of-line.
    */
  private val TypeSize =
    Array(0, 1, 1, 2, 4, 8, 1, 1, 2, 4, 8, 4, 8)

  /** The payload with GPS data destroyed — see object doc. Always
    * returns an array (the input reference when nothing applies);
    * never throws on adversarial offsets (every write bounds-clipped
    * to the APP1 segment).
    */
  def strip(p: Array[Byte]): Array[Byte] = {
    val found = if (p.length >= 4 && (p(0) & 0xFF) == 0xFF &&
      (p(1) & 0xFF) == 0xD8) JpegExifKernel.findExif(p) else null
    if (found == null) return p
    val base = found(0)
    val end = base + found(1)
    if (base + 8 > end || end > p.length) return p
    val le =
      if (p(base) == 'I' && p(base + 1) == 'I') true
      else if (p(base) == 'M' && p(base + 1) == 'M') false
      else return p
    if (u16(p, base + 2, le) != 42) return p
    val ifd0Off = u32(p, base + 4, le)
    if (ifd0Off < 0 || base + ifd0Off + 2 > end) return p
    val ifd0 = (base + ifd0Off).toInt
    val n = u16(p, ifd0, le)
    if (n > JpegExifKernel.MaxEntries || ifd0 + 2 + 12L * n > end) return p
    var hasGps = false
    var i = 0
    while (i < n) {
      if (u16(p, ifd0 + 2 + 12 * i, le) == 0x8825) hasGps = true
      i += 1
    }
    if (!hasGps) return p
    val out = p.clone()
    // 1) destroy the GPS sub-IFD(s): out-of-line values first (the
    //    deg/min/sec rationals live there), then the entry table +
    //    count + next-IFD pointer
    i = 0
    while (i < n) {
      val e = ifd0 + 2 + 12 * i
      if (u16(p, e, le) == 0x8825 && u16(p, e + 2, le) == 4 &&
          u32(p, e + 4, le) == 1L) {
        val gp = u32(p, e + 8, le)
        if (gp >= 0 && base + gp + 2 <= end) {
          val g = (base + gp).toInt
          val gn = u16(p, g, le)
          if (gn <= JpegExifKernel.MaxEntries && g + 2 + 12L * gn <= end) {
            var j = 0
            while (j < gn) {
              val ge = g + 2 + 12 * j
              val typ = u16(p, ge + 2, le)
              val cnt = u32(p, ge + 4, le)
              val sz =
                if (typ >= 1 && typ <= 12) TypeSize(typ) * cnt else 0L
              if (sz > 4 && cnt <= (1L << 20)) {
                val voff = u32(p, ge + 8, le)
                if (voff >= 0 && base + voff < end) {
                  val s = (base + voff).toInt
                  val zEnd = math.min(end.toLong, base + voff + sz).toInt
                  if (zEnd > s) java.util.Arrays.fill(out, s, zEnd, 0.toByte)
                }
              }
              j += 1
            }
            val zTo = math.min(end.toLong, g + 2 + 12L * gn + 4).toInt
            java.util.Arrays.fill(out, g, zTo, 0.toByte)
          }
        }
      }
      i += 1
    }
    // 2) remove the pointer entries from IFD0: compact, recount, move
    //    the next-IFD offset up, zero the stale tail
    var w = 0
    i = 0
    while (i < n) {
      val e = ifd0 + 2 + 12 * i
      if (u16(p, e, le) != 0x8825) {
        if (w != i) System.arraycopy(out, e, out, ifd0 + 2 + 12 * w, 12)
        w += 1
      }
      i += 1
    }
    if (w < n) {
      putU16(out, ifd0, w, le)
      val oldNext = ifd0 + 2 + 12 * n
      val newNext = ifd0 + 2 + 12 * w
      if (oldNext + 4 <= end) {
        System.arraycopy(out, oldNext, out, newNext, 4)
        java.util.Arrays.fill(out, newNext + 4, oldNext + 4, 0.toByte)
      } else {
        java.util.Arrays.fill(out, newNext, math.min(oldNext, end), 0.toByte)
      }
    }
    out
  }
}

/** `jpeg_strip_gps(payload) → binary` — the payload with GPS data
  * destroyed (IFD0 pointer removed, sub-IFD + referenced values
  * zeroed), unchanged when nothing applies; see
  * [[JpegStripGpsKernel.strip]].
  */
case class JpegStripGps(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_strip_gps"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    JpegStripGpsKernel.strip(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.JpegStripGpsKernel.strip($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
