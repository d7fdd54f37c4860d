package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ANIMATED GIF frame walk — the frame-sampling tier behind the GIF
  * rows: where `mm_gif_pixels` decodes the FIRST image,
  * this kernel walks the whole stream — every Graphic Control
  * Extension (delay, disposal method, transparency), every image
  * descriptor (sub-rectangle placement, local color tables
  * overriding the global one), the NETSCAPE2.0 looping application
  * extension, comment/plain-text extensions skipped structurally —
  * and decodes EVERY frame's LZW stream through the shared
  * [[GifLzwKernel.decodeImage]], emitting per-frame channel
  * statistics. This is what a video-ish curation pass needs from the
  * web's most common animation container: frame count, timing,
  * placement, and per-frame content signals, in ONE pass, raster
  * never materialized.
  *
  * Reference behavior: lshrs stores media as opaque blobs
  * (`io/parquet.py`); frame-level decode is part of the
  * beyond-reference multimodal tier.
  *
  * Null (never a throw) on any structural violation — bad magic,
  * missing color table, truncated stream, no trailer, bytes after
  * the trailer, LZW damage — and bomb-guarded (frame count cap +
  * per-frame and cumulative pixel caps).
  */
object GifFramesKernel {
  val MaxFrames = 1024
  val MaxTotalPixels: Long = 1L << 24

  private def u16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)

  private val frameFields = 14

  /** Struct (gif_valid, canvas_w, canvas_h, n_frames, loop_count,
    * total_delay_ms, frames: array<struct<frame_idx, delay_ms,
    * disposal, transparent_idx, frame_left, frame_top, frame_w,
    * frame_h, has_lct, n_pixels, sum_r, sum_g, sum_b, peak_byte>>)
    * or null.
    */
  def parse(p: Array[Byte]): InternalRow = {
    if (p.length < 14) return null
    if (!(p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
        (p(4) == '7' || p(4) == '9') && p(5) == 'a')) return null
    val canvasW = u16(p, 6).toLong
    val canvasH = u16(p, 8).toLong
    val packed = p(10) & 0xFF
    var pos = 13
    var gctOff = -1
    var gctEntries = 0
    if ((packed & 0x80) != 0) {
      gctOff = pos
      gctEntries = 1 << ((packed & 0x07) + 1)
      pos += 3 * gctEntries
      if (pos > p.length) return null
    }
    var loopCount = -1L
    var pendDelay = -1L
    var pendDisposal = -1L
    var pendTrans = -1L
    var totalDelayMs = 0L
    var totalPixels = 0L
    val frames = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var ended = false
    while (!ended) {
      if (pos >= p.length) return null
      val sep = p(pos) & 0xFF
      pos += 1
      sep match {
        case 0x3B =>
          // trailer must CLOSE the stream — trailing bytes are a
          // structural lie at triage grain
          if (pos != p.length) return null
          ended = true
        case 0x21 =>
          if (pos >= p.length) return null
          val label = p(pos) & 0xFF
          pos += 1
          if (label == 0xF9) {
            // Graphic Control Extension: fixed 4-byte block
            if (pos + 6 > p.length) return null
            if ((p(pos) & 0xFF) != 4) return null
            val gp = p(pos + 1) & 0xFF
            pendDisposal = ((gp >> 2) & 0x07).toLong
            pendDelay = u16(p, pos + 2).toLong
            pendTrans = if ((gp & 1) != 0) (p(pos + 4) & 0xFF).toLong else -1L
            if ((p(pos + 5) & 0xFF) != 0) return null
            pos += 6
          } else {
            // application / comment / plain-text: the NETSCAPE2.0
            // loop block is decoded, everything else skipped
            var first = true
            var isNetscape = false
            var n = -1
            while (n != 0) {
              if (pos >= p.length) return null
              n = p(pos) & 0xFF
              pos += 1
              if (n > 0) {
                if (pos + n > p.length) return null
                if (first && label == 0xFF && n == 11) {
                  isNetscape =
                    p(pos) == 'N' && p(pos + 1) == 'E' && p(pos + 2) == 'T' &&
                    p(pos + 3) == 'S' && p(pos + 4) == 'C' && p(pos + 5) == 'A' &&
                    p(pos + 6) == 'P' && p(pos + 7) == 'E' && p(pos + 8) == '2' &&
                    p(pos + 9) == '.' && p(pos + 10) == '0'
                } else if (isNetscape && n >= 3 && (p(pos) & 0xFF) == 1) {
                  loopCount = u16(p, pos + 1).toLong
                }
                pos += n
                first = false
              }
            }
          }
        case 0x2C =>
          if (pos + 9 > p.length) return null
          val left = u16(p, pos).toLong
          val top = u16(p, pos + 2).toLong
          val iw = u16(p, pos + 4)
          val ih = u16(p, pos + 6)
          val ipacked = p(pos + 8) & 0xFF
          pos += 9
          var tabOff = gctOff
          var tabEntries = gctEntries
          val hasLct = (ipacked & 0x80) != 0
          if (hasLct) {
            tabOff = pos
            tabEntries = 1 << ((ipacked & 0x07) + 1)
            pos += 3 * tabEntries
          }
          if (tabOff < 0 || tabOff + 3 * tabEntries > p.length) return null
          val area = iw.toLong * ih
          if (area <= 0 || area > GifLzwKernel.MaxPixels) return null
          totalPixels += area
          if (totalPixels > MaxTotalPixels) return null
          if (frames.length >= MaxFrames) return null
          val st = GifLzwKernel.decodeImage(p, pos, tabOff, tabEntries, area)
          if (st == null) return null
          pos = st(0).toInt
          val delayMs: Any = if (pendDelay >= 0) pendDelay * 10L else null
          if (pendDelay >= 0) totalDelayMs += pendDelay * 10L
          val row = new GenericInternalRow(frameFields)
          row.update(0, frames.length.toLong)
          row.update(1, delayMs)
          row.update(2, if (pendDisposal >= 0) pendDisposal else null)
          row.update(3, if (pendTrans >= 0) pendTrans else null)
          row.update(4, left)
          row.update(5, top)
          row.update(6, iw.toLong)
          row.update(7, ih.toLong)
          row.update(8, hasLct)
          row.update(9, area)
          row.update(10, st(1))
          row.update(11, st(2))
          row.update(12, st(3))
          row.update(13, st(4))
          frames += row
          // a GCE's scope is exactly the following rendering block
          pendDelay = -1L; pendDisposal = -1L; pendTrans = -1L
        case _ => return null
      }
    }
    if (frames.isEmpty) return null
    new GenericInternalRow(Array[Any](
      true, canvasW, canvasH, frames.length.toLong,
      if (loopCount >= 0) loopCount else null, totalDelayMs,
      new GenericArrayData(frames.toArray[Any])))
  }
}

/** Deterministic ANIMATED GIF synthesis from a doc_id — the
  * synthesis-side inverse of [[GifFramesKernel]]: real multi-frame
  * streams (header + closed-form GCT + optional NETSCAPE2.0 loop
  * extension + per-frame GCE/descriptor/optional-LCT/real LZW code
  * stream + trailer) whose every parsed field and decoded channel
  * sum is recomputable from doc_id arithmetic. Lanes: 1-4 frames
  * (d%4), loop extension present unless d%4==1, per-frame delay
  * 2+(d+f)%6 cs, disposal (d+f)%4, transparency flag (d+f)%3==0
  * with index (d+f)%4, local color table every (d+f)%5==2 frame
  * (4 entries), sub-rectangle (f, f, 3+(d+f)%3, 2+(d+f)%2); GCT
  * bytes (5d+3k) mod 256, LCT bytes (7d+11k+f) mod 256, pixel
  * indices (d+f+i) mod activeEntries.
  */
object GifAnimSynthKernel {
  def synth(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    def w8(v: Long): Unit = out.write((v & 0xFF).toInt)
    def w16(v: Long): Unit = { w8(v); w8(v >> 8) }
    out.write('G'); out.write('I'); out.write('F')
    out.write('8'); out.write('9'); out.write('a')
    val cw = 10 + d % 6
    val chh = 8 + d % 5
    val bits = (d % 3 + 1).toInt
    val entries = 1 << (bits + 1)
    w16(cw); w16(chh)
    w8(0xF0L + bits) // GCT flag + color resolution 7 + size
    w8(0); w8(0) // background, aspect
    var k = 0
    while (k < 3 * entries) { w8((5 * d + 3 * k) % 256); k += 1 }
    if (d % 4 != 1) {
      w8(0x21); w8(0xFF); w8(11)
      "NETSCAPE2.0".getBytes("US-ASCII").foreach(out.write(_))
      w8(3); w8(1); w16(d % 7); w8(0)
    }
    val nF = (1 + d % 4).toInt
    var f = 0
    while (f < nF) {
      val delayCs = 2 + (d + f) % 6
      val disposal = (d + f) % 4
      val transFlag = (d + f) % 3 == 0
      w8(0x21); w8(0xF9); w8(4)
      w8((disposal << 2) | (if (transFlag) 1L else 0L))
      w16(delayCs)
      w8(if (transFlag) (d + f) % 4 else 0L)
      w8(0)
      val hasLct = (d + f) % 5 == 2
      val ae = if (hasLct) 4 else entries
      val fw = (3 + (d + f) % 3).toInt
      val fh = (2 + (d + f) % 2).toInt
      w8(0x2C)
      w16(f); w16(f) // left, top — fits the canvas at ≤4 frames
      w16(fw); w16(fh)
      w8(if (hasLct) 0x81L else 0L) // LCT flag + size 1 → 4 entries
      if (hasLct) {
        k = 0
        while (k < 12) { w8((7 * d + 11 * k + f) % 256); k += 1 }
      }
      val minCode = if (hasLct) 2 else bits + 1
      w8(minCode)
      val idx = Array.tabulate(fw * fh)(i => ((d + f + i) % ae).toInt)
      val lzw = GifLzwEncoder.encodeLiterals(idx, minCode)
      out.write(lzw, 0, lzw.length)
      f += 1
    }
    w8(0x3B)
    out.toByteArray
  }
}

/** `gif_frames(payload) → struct<...6 doc fields, frames array>`;
  * see [[GifFramesKernel.parse]].
  */
case class GifFrames(child: Expression) extends UnaryExpression {
  private val frameType = StructType(Seq(
    StructField("frame_idx", LongType),
    StructField("delay_ms", LongType),
    StructField("disposal", LongType),
    StructField("transparent_idx", LongType),
    StructField("frame_left", LongType),
    StructField("frame_top", LongType),
    StructField("frame_w", LongType),
    StructField("frame_h", LongType),
    StructField("has_lct", BooleanType),
    StructField("n_pixels", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("peak_byte", LongType)))

  override def dataType: DataType = StructType(Seq(
    StructField("gif_valid", BooleanType),
    StructField("canvas_w", LongType),
    StructField("canvas_h", LongType),
    StructField("n_frames", LongType),
    StructField("loop_count", LongType),
    StructField("total_delay_ms", LongType),
    StructField("frames", ArrayType(frameType, containsNull = false))))
  override def nullable: Boolean = true
  override def prettyName: String = "gif_frames"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    GifFramesKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.GifFramesKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `gif_anim_synth(doc_id) → binary`; see [[GifAnimSynthKernel.synth]]. */
case class GifAnimSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gif_anim_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    GifAnimSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.GifAnimSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
