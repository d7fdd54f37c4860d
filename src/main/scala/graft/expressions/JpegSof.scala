package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Static JPEG segment-walk kernel shared by interpreted eval and
  * generated code. JPEG is the one container family whose header is
  * NOT fixed-offset: the frame header (SOFn) sits after a
  * variable-length train of APPn/COM/DQT/DHT segments, each
  * self-describing via a big-endian 2-byte length. The walk is a
  * bounded linear scan of SEGMENT HEADERS only — each step hops
  * `2 + length` bytes, so cost is O(#segments), independent of
  * payload size — and is a pure function of the bytes (no libc, no
  * codec), so the located offset is reproducible across runs,
  * partitions, and cluster sizes.
  */
object JpegKernel {
  /** 1-based byte offset of the SOFn marker's 0xFF byte, or -1 when
    * the payload is not a JPEG or carries no frame header before the
    * scan data. SOFn = 0xC0–0xCF minus DHT (0xC4), JPG (0xC8) and
    * DAC (0xCC), per ITU-T T.81 table B.1.
    */
  def sofOffset(bytes: Array[Byte]): Long = {
    val len = bytes.length
    if (len < 4 || (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return -1L
    var pos = 2
    while (pos + 1 < len) {
      if ((bytes(pos) & 0xFF) != 0xFF) return -1L // desynchronized stream
      // optional fill bytes: any number of 0xFF may pad before a marker
      while (pos + 1 < len && (bytes(pos + 1) & 0xFF) == 0xFF) pos += 1
      if (pos + 1 >= len) return -1L
      val marker = bytes(pos + 1) & 0xFF
      if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 && marker != 0xC8
          && marker != 0xCC) {
        // the frame header must FIT: its declared length in bounds
        // guarantees every relative field read after the locate is too
        if (pos + 3 >= len) return -1L
        val sofLen = ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
        if (sofLen < 10 || pos + 2 + sofLen > len) return -1L
        return pos + 1L // 1-based offset of the 0xFF byte
      }
      if (marker == 0xD9 || marker == 0xDA) return -1L // EOI / SOS: no frame header
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
        pos += 2 // standalone marker, no length field
      } else {
        if (pos + 3 >= len) return -1L
        val segLen = ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
        if (segLen < 2) return -1L // length includes its own 2 bytes
        pos += 2 + segLen
      }
    }
    -1L
  }
}

/** `jpeg_sof_offset(binary) → bigint` — 1-based offset of the JPEG
  * frame header (SOFn) marker, NULL for non-JPEG payloads or streams
  * with no frame header. The locate step is the only part of JPEG
  * triage that needs sequential logic; every field read after it is a
  * fixed RELATIVE offset from the returned position, so the rest of
  * the parse stays declarative `substr`+`conv` column expressions.
  * Codegen'd as a static call into [[JpegKernel]] — the triage pass
  * remains one narrow whole-stage-codegen map, no UDF, no shuffle.
  */
case class JpegSofOffset(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_sof_offset"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val off = JpegKernel.sofOffset(v.asInstanceOf[Array[Byte]])
    if (off < 0) null else off
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.JpegKernel.sofOffset($c);
      if (${ev.value} < 0) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): JpegSofOffset =
    copy(child = newChild)
}
