package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Zstandard container TRIAGE — the NINETEENTH family, and the
  * OTHER wire framing of shipped corpora (RedPajama/FineWeb shards
  * are `.jsonl.zst`; gzip covers the `.warc.gz` side). The kernel
  * walks RFC 8878 frames: the standard magic's frame header
  * (Frame_Header_Descriptor bit fields — FCS width, single-segment,
  * checksum and dictionary-ID flags, the must-be-zero reserved
  * bit), the window descriptor, the block chain (raw / RLE /
  * compressed, 3-byte little-endian headers, last-block flag), the
  * 4-byte XXH64 content checksum, and skippable frames
  * (0x184D2A5x) anywhere in the stream. Raw/RLE frame content is
  * reconstructed by the walk itself and its checksum verified with
  * Spark's own XXH64 (the zstd checksum IS the low 32 bits of
  * XXH64(content, seed 0)); frames carrying compressed blocks are
  * inflated through zstd-jni (the codec already on every Spark
  * classpath — the same platform-codec posture as gzip's
  * `Inflater`). Verdict lanes: `size_match` (declared
  * Frame_Content_Size vs actual, per declaring frame),
  * `checksum_ok`, `decode_ok`, wall-to-wall `consistent`.
  *
  * Reference behavior: beyond-reference (lshrs reads parquet only).
  * Never throws; per-frame and total output bomb-capped.
  */
object ZstdMetaKernel {
  val MaxFrames = 4096
  val MaxTotalBytes: Long = 1L << 28
  val MaxFrameBytes: Long = 1L << 24
  /** Checksum verification materializes raw/RLE frame content up to
    * this cap; bigger frames still count bytes (an RLE bomb expands
    * 2 MB per on-wire byte) but skip the XXH64 compare.
    */
  val ContentCap: Int = 1 << 22

  private def isStdMagic(p: Array[Byte], off: Int): Boolean =
    off + 4 <= p.length &&
      (p(off) & 0xFF) == 0x28 && (p(off + 1) & 0xFF) == 0xB5 &&
      (p(off + 2) & 0xFF) == 0x2F && (p(off + 3) & 0xFF) == 0xFD

  private def isSkipMagic(p: Array[Byte], off: Int): Boolean =
    off + 4 <= p.length &&
      (p(off) & 0xF0) == 0x50 && (p(off + 1) & 0xFF) == 0x2A &&
      (p(off + 2) & 0xFF) == 0x4D && (p(off + 3) & 0xFF) == 0x18

  def isZstd(p: Array[Byte]): Boolean =
    p.length >= 8 && (isStdMagic(p, 0) || isSkipMagic(p, 0))

  private def u32le(p: Array[Byte], off: Int): Long =
    (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)

  private def uLe(p: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var k = 0
    while (k < n) { v |= (p(off + k) & 0xFFL) << (8 * k); k += 1 }
    v
  }

  /** Low 32 bits of XXH64(content, seed 0) — the zstd content
    * checksum (RFC 8878 §3.1.1); Spark's own XXH64 does the work.
    */
  def contentChecksum(content: Array[Byte], len: Int): Long =
    XXH64.hashUnsafeBytes(content, Platform.BYTE_ARRAY_OFFSET, len, 0L) &
      0xFFFFFFFFL

  /** Decode one complete frame slice through zstd-jni, returning the
    * decompressed byte count (capped). Throws on corruption — the
    * caller owns the verdict.
    */
  private def decodeFrameJni(p: Array[Byte], start: Int, end: Int): Long = {
    val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
      new java.io.ByteArrayInputStream(p, start, end - start))
    try {
      val buf = new Array[Byte](8192)
      var total = 0L
      var n = in.read(buf)
      while (n >= 0 && total <= MaxFrameBytes) { total += n; n = in.read(buf) }
      total
    } finally in.close()
  }

  /** Struct of 18 triage fields (see [[ZstdMeta.dataType]]) or null
    * when the bytes carry no zstd magic / no complete frame.
    */
  def parse(p: Array[Byte]): InternalRow = {
    if (!isZstd(p)) return null
    var pos = 0
    var nFrames = 0L
    var nSkippable = 0L
    var skippableBytes = 0L
    var nBlocks = 0L
    var nRle = 0L
    var nCompressed = 0L
    var total = 0L
    var nDeclared = 0L
    var declaredBytes = 0L
    var sizeMatch = true
    var firstSingleSegment = false
    var firstWindowLog = -1L
    var dictId = -1L
    var nChecksummed = 0L
    var checksumOk = true
    var decodeOk = true
    var consistent = true
    var content = new Array[Byte](1024 min ContentCap)
    // grow-on-demand up to ContentCap; false = frame too big to verify
    def ensure(n: Int): Boolean =
      if (n <= content.length) true
      else if (n > ContentCap || n < 0) false
      else {
        var s = content.length
        while (s < n) s <<= 1
        content = java.util.Arrays.copyOf(content, s min ContentCap)
        true
      }
    while (pos + 4 <= p.length && consistent &&
        nFrames + nSkippable < MaxFrames) {
      if (isSkipMagic(p, pos)) {
        if (pos + 8 > p.length) consistent = false
        else {
          val sz = u32le(p, pos + 4)
          if (pos + 8 + sz > p.length) consistent = false
          else {
            skippableBytes += sz
            nSkippable += 1
            pos += 8 + sz.toInt
          }
        }
      } else if (isStdMagic(p, pos)) {
        val frameStart = pos
        var q = pos + 4
        if (q >= p.length) consistent = false
        else {
          val fhd = p(q) & 0xFF
          q += 1
          val fcsFlag = fhd >>> 6
          val ss = ((fhd >>> 5) & 1) == 1
          val ck = ((fhd >>> 2) & 1) == 1
          val didFlag = fhd & 3
          if (((fhd >>> 3) & 1) != 0) consistent = false // reserved bit
          var wlog = -1L
          if (consistent && !ss) {
            if (q >= p.length) consistent = false
            else {
              wlog = 10L + ((p(q) & 0xFF) >>> 3)
              q += 1
            }
          }
          val dictBytes = didFlag match {
            case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
          }
          var did = -1L
          if (consistent && dictBytes > 0) {
            if (q + dictBytes > p.length) consistent = false
            else { did = uLe(p, q, dictBytes); q += dictBytes }
          }
          val fcsBytes = fcsFlag match {
            case 0 => if (ss) 1 else 0
            case 1 => 2; case 2 => 4; case _ => 8
          }
          var declared = -1L
          if (consistent && fcsBytes > 0) {
            if (q + fcsBytes > p.length) consistent = false
            else {
              declared = uLe(p, q, fcsBytes)
              if (fcsBytes == 2) declared += 256L
              q += fcsBytes
            }
          }
          // block chain
          var hasCompressed = false
          var frameBytes = 0L
          var cLen = 0
          var last = false
          while (consistent && !last) {
            if (q + 3 > p.length) consistent = false
            else {
              val h = (p(q) & 0xFF) | ((p(q + 1) & 0xFF) << 8) |
                ((p(q + 2) & 0xFF) << 16)
              q += 3
              last = (h & 1) == 1
              val btype = (h >>> 1) & 3
              val bsize = h >>> 3
              btype match {
                case 0 => // raw
                  if (q + bsize > p.length) consistent = false
                  else {
                    if (!hasCompressed && cLen >= 0 && ensure(cLen + bsize)) {
                      System.arraycopy(p, q, content, cLen, bsize)
                      cLen += bsize
                    } else cLen = -1
                    frameBytes += bsize
                    q += bsize
                    nBlocks += 1
                  }
                case 1 => // RLE: one byte, repeated bsize times
                  if (q + 1 > p.length) consistent = false
                  else {
                    if (!hasCompressed && cLen >= 0 && ensure(cLen + bsize)) {
                      java.util.Arrays.fill(content, cLen, cLen + bsize, p(q))
                      cLen += bsize
                    } else cLen = -1
                    frameBytes += bsize
                    q += 1
                    nBlocks += 1
                    nRle += 1
                  }
                case 2 => // compressed — zstd-jni decodes the frame
                  if (q + bsize > p.length) consistent = false
                  else {
                    hasCompressed = true
                    q += bsize
                    nBlocks += 1
                    nCompressed += 1
                  }
                case _ => consistent = false // reserved block type
              }
              if (frameBytes > MaxFrameBytes ||
                  total + frameBytes > MaxTotalBytes) consistent = false
            }
          }
          var storedChecksum = -1L
          if (consistent && ck) {
            if (q + 4 > p.length) consistent = false
            else { storedChecksum = u32le(p, q); q += 4 }
          }
          if (consistent) {
            var actual = -1L
            if (!hasCompressed) {
              actual = frameBytes
              if (ck && cLen >= 0L && cLen.toLong == frameBytes) {
                if (contentChecksum(content, cLen) != storedChecksum)
                  checksumOk = false
              }
            } else {
              try actual = decodeFrameJni(p, frameStart, q)
              catch {
                case _: java.io.IOException =>
                  if (ck) checksumOk = false else decodeOk = false
              }
            }
            if (nFrames == 0L) {
              firstSingleSegment = ss
              firstWindowLog = wlog
            }
            if (dictId < 0L && did >= 0L) dictId = did
            if (ck) nChecksummed += 1
            if (declared >= 0L) {
              nDeclared += 1
              declaredBytes += declared
              if (actual >= 0L && actual != declared) sizeMatch = false
            }
            if (actual >= 0L) total += actual
            nFrames += 1
            pos = q
          }
        }
      } else consistent = false // garbage between frames
    }
    if (pos < p.length) consistent = false
    if (nFrames + nSkippable >= MaxFrames) consistent = false
    if (nFrames == 0L && nSkippable == 0L) return null
    new GenericInternalRow(Array[Any](
      true, nFrames, nSkippable, skippableBytes, nBlocks, nRle,
      nCompressed, total, nDeclared, declaredBytes,
      if (nDeclared == 0L) null else java.lang.Boolean.valueOf(sizeMatch),
      if (nFrames == 0L) null
      else java.lang.Boolean.valueOf(firstSingleSegment),
      if (firstWindowLog < 0L) null else java.lang.Long.valueOf(firstWindowLog),
      if (dictId < 0L) null else java.lang.Long.valueOf(dictId),
      nChecksummed,
      if (nChecksummed == 0L) null else java.lang.Boolean.valueOf(checksumOk),
      decodeOk, consistent))
  }
}

/** Deterministic multi-frame zstd synthesis from a doc_id — REAL
  * RFC 8878 frames built from raw + RLE blocks so every byte length
  * stays closed-form for the mixed-triage oracle (real zstd decodes
  * them — conformance is BOTH directions), rotating the container's
  * parameter space:
  *
  *  - `1 + d%3` frames; a skippable frame (`4 + d%9` content bytes,
  *    magic low nibble `d%16`) prefixes the stream when `d%7==2`;
  *  - frame i's FCS lane is `(d+i)%5`: 0 → 4-byte FCS, 1 → no FCS,
  *    2 → 8-byte FCS, 3 → single-segment with 1-byte FCS, 4 →
  *    2-byte FCS (offset 256 — that lane's content is
  *    `256 + d%50` bytes; all others `10 + (d+i)%40`);
  *  - a window descriptor `exponent = d%8` (window_log `10 + d%8`)
  *    on every non-single-segment frame;
  *  - a 1-byte dictionary ID `1 + d%255` when `(d+i)%6==4`;
  *  - one raw block when `(d+i)%2==0`, else raw + a 5-byte RLE tail;
  *  - an XXH64 content checksum when `(d+i)%3!=1` (at least one
  *    frame of every doc is checksummed), with the LAST checksummed
  *    frame's first checksum byte flipped when `d%20==9` — the
  *    family's integrity lane.
  *
  * Byte length: `(d%7==2 ? 12 + d%9 : 0)` + Σᵢ `5 + (ss?0:1) +
  * (dict?1:0) + fcsBytes + len + (rle?2:3) + (ck?4:0)`.
  */
object ZstdMetaSynthKernel {
  def synth(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    def u32le(v: Long): Unit = {
      var k = 0
      while (k < 4) { out.write(((v >>> (8 * k)) & 0xFF).toInt); k += 1 }
    }
    if (d % 7 == 2) {
      val sk = (4 + d % 9).toInt
      u32le(0x184D2A50L + (d % 16))
      u32le(sk.toLong)
      var j = 0
      while (j < sk) { out.write(((d * 11 + j * 5) % 256).toInt); j += 1 }
    }
    val nF = (1 + d % 3).toInt
    var lastCk = -1
    var i = 0
    while (i < nF) { if ((d + i) % 3 != 1) lastCk = i; i += 1 }
    i = 0
    while (i < nF) {
      val lane = ((d + i) % 5).toInt
      val len = if (lane == 4) (256 + d % 50).toInt
        else (10 + (d + i) % 40).toInt
      val ss = lane == 3
      val ck = (d + i) % 3 != 1
      val dict = (d + i) % 6 == 4
      val fcsFlag = lane match {
        case 0 => 2; case 1 => 0; case 2 => 3; case 3 => 0; case _ => 1
      }
      u32le(0xFD2FB528L)
      out.write((fcsFlag << 6) | (if (ss) 0x20 else 0) |
        (if (ck) 4 else 0) | (if (dict) 1 else 0))
      if (!ss) out.write(((d % 8) << 3).toInt)
      if (dict) out.write((1 + d % 255).toInt)
      val fcsBytes = fcsFlag match {
        case 0 => if (ss) 1 else 0
        case 1 => 2; case 2 => 4; case _ => 8
      }
      val fcsValue: Long = if (fcsFlag == 1) (len - 256).toLong else len.toLong
      var k = 0
      while (k < fcsBytes) {
        out.write(((fcsValue >>> (8 * k)) & 0xFF).toInt)
        k += 1
      }
      val content = new Array[Byte](len)
      val split = (d + i) % 2 == 1
      val rawLen = if (split) len - 5 else len
      var j = 0
      while (j < rawLen) {
        content(j) = ((d * 5 + i * 13 + j * 7) % 256).toByte
        j += 1
      }
      if (split) {
        val v = ((d * 3 + i * 7) % 256).toByte
        while (j < len) { content(j) = v; j += 1 }
      }
      // raw block header: size<<3 | type 0 | last flag
      val rawLast = if (split) 0 else 1
      val rh = (rawLen << 3) | rawLast
      out.write(rh & 0xFF); out.write((rh >>> 8) & 0xFF)
      out.write((rh >>> 16) & 0xFF)
      out.write(content, 0, rawLen)
      if (split) {
        val lh = (5 << 3) | (1 << 1) | 1 // RLE, last
        out.write(lh & 0xFF); out.write((lh >>> 8) & 0xFF)
        out.write((lh >>> 16) & 0xFF)
        out.write(content(len - 1).toInt & 0xFF)
      }
      if (ck) {
        var c = ZstdMetaKernel.contentChecksum(content, len)
        if (d % 20 == 9 && i == lastCk) c ^= 0xFFL // flipped-checksum lane
        u32le(c)
      }
      i += 1
    }
    out.toByteArray
  }
}

/** Zstd content codec faces for the `.tar.zst` composition: shards
  * ship zstd-compressed at rest, legally as MANY concatenated frames
  * (`zstd` itself, and any chunked writer, emits per-block frames —
  * RFC 8878 §3: a stream is a sequence of frames whose contents
  * concatenate), with skippable frames allowed in between. The
  * decode side streams ALL frames through zstd-jni (libzstd skips
  * skippable frames natively) under a total-output cap.
  */
object ZstdCodecKernel {
  def compress(b: Array[Byte]): Array[Byte] = {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try { ctx.setLevel(3); ctx.compress(b) } finally ctx.close()
  }

  /** All frames decoded and concatenated, or null on corruption /
    * truncation / trailing garbage / budget breach. The walk is
    * frame-by-frame through libzstd's own
    * `ZSTD_findFrameCompressedSize` — a bare stream read would EOF
    * SILENTLY on a truncated final frame, and a lossy reassembly
    * must never look like a clean one.
    */
  def concatFrames(p: Array[Byte], maxLen: Int): Array[Byte] = {
    if (p == null || p.length == 0) return null
    try {
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(64, p.length * 3), maxLen))
      var pos = 0
      while (pos < p.length) {
        val fs = com.github.luben.zstd.Zstd.findFrameCompressedSize(p, pos)
        if (com.github.luben.zstd.Zstd.isError(fs) || fs <= 0 ||
            pos + fs > p.length) return null
        val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
          new java.io.ByteArrayInputStream(p, pos, fs.toInt))
        try {
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0 && out.size() <= maxLen) {
            out.write(buf, 0, n); n = in.read(buf)
          }
        } finally in.close()
        if (out.size() > maxLen) return null
        pos += fs.toInt
      }
      out.toByteArray
    } catch {
      case _: java.io.IOException => null
      case _: com.github.luben.zstd.ZstdException => null
    }
  }
}

/** `zstd_compress(binary|string) → binary` — one deterministic zstd
  * frame (level 3); the synthesis-side inverse of [[ZstdConcat]].
  */
case class ZstdCompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "zstd_compress"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary input, got $other")
  }

  override def nullSafeEval(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String =>
      ZstdCodecKernel.compress(s.getBytes)
    case b: Array[Byte] => ZstdCodecKernel.compress(b)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val conv = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case _ => (c: String) => c
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ZstdCodecKernel.compress(${conv(c)});")
  }

  override protected def withNewChildInternal(c: Expression): ZstdCompress =
    copy(child = c)
}

/** `zstd_concat(blob) → binary` — every frame decoded and
  * concatenated; see [[ZstdCodecKernel.concatFrames]]. `maxLen` is a
  * plan literal: the decode budget is part of the operator, visible
  * in the plan, never runtime-data-controlled.
  */
case class ZstdConcat(child: Expression, maxLen: Int) extends UnaryExpression {
  require(maxLen > 0, s"maxLen=$maxLen must be positive")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "zstd_concat"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ZstdCodecKernel.concatFrames(v.asInstanceOf[Array[Byte]], maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.expressions.ZstdCodecKernel.concatFrames($c, $maxLen);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): ZstdConcat =
    copy(child = c)
}

/** `zstd_meta(payload) → struct<...18 fields>`; see
  * [[ZstdMetaKernel.parse]].
  */
case class ZstdMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("zstd_valid", BooleanType),
    StructField("n_frames", LongType),
    StructField("n_skippable", LongType),
    StructField("skippable_bytes", LongType),
    StructField("n_blocks", LongType),
    StructField("n_rle_blocks", LongType),
    StructField("n_compressed_blocks", LongType),
    StructField("uncompressed_bytes", LongType),
    StructField("n_declared", LongType),
    StructField("declared_bytes", LongType),
    StructField("size_match", BooleanType),
    StructField("single_segment", BooleanType),
    StructField("window_log", LongType),
    StructField("dict_id", LongType),
    StructField("n_checksummed", LongType),
    StructField("checksum_ok", BooleanType),
    StructField("decode_ok", BooleanType),
    StructField("consistent", BooleanType)))
  override def nullable: Boolean = true
  override def prettyName: String = "zstd_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    ZstdMetaKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.ZstdMetaKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `zstd_meta_synth(doc_id) → binary`; see
  * [[ZstdMetaSynthKernel.synth]].
  */
case class ZstdMetaSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "zstd_meta_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    ZstdMetaSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.ZstdMetaSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
