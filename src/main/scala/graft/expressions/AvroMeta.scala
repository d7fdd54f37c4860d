package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro Object Container File triage — the FIFTEENTH family: the
  * data-lake/event-log container a training corpus's structured side
  * arrives in (Kafka dumps, warehouse exports). The format is
  * varint-framed: magic `Obj\x01`, a metadata MAP (zigzag-varint
  * counted blocks of string→bytes pairs — `avro.schema` JSON and the
  * optional `avro.codec`), a 16-byte sync marker, then data blocks
  * (record count + byte size, both zigzag varints, payload, sync
  * marker repeated). So triage IS a varint walk, and the sync-marker
  * equality check is an integrity verdict in the CRC-lane tradition.
  *
  * The schema JSON is scanned minimally (no general JSON parse in a
  * triage kernel): top-level `"type"` value, record `"name"`, byte
  * length — the fields corpus bookkeeping keys on.
  *
  * Reference behavior: lshrs reads parquet tables only
  * (`io/parquet.py`); container-grain Avro triage is part of the
  * beyond-reference multimodal tier. Never throws; bounded
  * (MaxMetaEntries / MaxBlocks / schema capture cap).
  */
object AvroMetaKernel {
  val MaxMetaEntries = 1 << 10
  val MaxBlocks = 1 << 20
  val MaxSchemaBytes = 1 << 16

  def isAvro(p: Array[Byte]): Boolean =
    p.length >= 4 && p(0) == 'O' && p(1) == 'b' && p(2) == 'j' && p(3) == 1

  /** Little-endian base-128 varint, zigzag-decoded (Avro `long`).
    * Returns Long.MinValue as the failure sentinel (a legal zigzag
    * decode never produces it from ≤10 bytes with the bound checks
    * callers apply to counts/sizes — callers treat negative as
    * failure anyway).
    */
  private def readLong(p: Array[Byte], posIn: Int): (Long, Int) = {
    var pos = posIn
    var u = 0L
    var shift = 0
    while (shift < 64) {
      if (pos >= p.length) return (Long.MinValue, -1)
      val b = p(pos) & 0xFF
      pos += 1
      u |= (b & 0x7FL) << shift
      if ((b & 0x80) == 0) return ((u >>> 1) ^ -(u & 1L), pos)
      shift += 7
    }
    (Long.MinValue, -1)
  }

  /** Struct (avro_valid, codec, schema_type, schema_name,
    * schema_bytes, n_meta_entries, n_blocks, n_records, data_bytes,
    * sync_ok, consistent) or null for non-Avro bytes / an unwalkable
    * metadata map.
    */
  def parse(p: Array[Byte]): InternalRow = {
    if (!isAvro(p)) return null
    var pos = 4
    var codec = "null"
    var schema: Array[Byte] = null
    var nMeta = 0L
    // metadata map: counted blocks, 0-terminated
    var mapDone = false
    while (!mapDone) {
      val (cnt0, pos0) = readLong(p, pos)
      if (pos0 < 0) return null
      pos = pos0
      var cnt = cnt0
      if (cnt == 0L) mapDone = true
      else {
        if (cnt < 0) {
          // negative count: abs count follows a block byte-size long
          val (_, pos1) = readLong(p, pos)
          if (pos1 < 0) return null
          pos = pos1
          cnt = -cnt
        }
        if (cnt > MaxMetaEntries) return null
        var i = 0L
        while (i < cnt) {
          val (klen, pk) = readLong(p, pos)
          if (pk < 0 || klen < 0 || pk + klen > p.length) return null
          val key = new String(p, pk, klen.toInt, "UTF-8")
          pos = pk + klen.toInt
          val (vlen, pv) = readLong(p, pos)
          if (pv < 0 || vlen < 0 || pv + vlen > p.length) return null
          if (key == "avro.codec")
            codec = new String(p, pv, vlen.toInt, "UTF-8")
          else if (key == "avro.schema" && vlen <= MaxSchemaBytes) {
            schema = new Array[Byte](vlen.toInt)
            System.arraycopy(p, pv, schema, 0, vlen.toInt)
          }
          pos = pv + vlen.toInt
          nMeta += 1
          if (nMeta > MaxMetaEntries) return null
          i += 1
        }
      }
    }
    if (pos + 16 > p.length) return null
    val syncAt = pos
    pos += 16
    // data blocks
    var nBlocks = 0L
    var nRecords = 0L
    var dataBytes = 0L
    var syncOk = true
    var consistent = true
    while (pos < p.length && consistent && nBlocks < MaxBlocks) {
      val (cnt, p1) = readLong(p, pos)
      if (p1 < 0 || cnt < 0) { consistent = false }
      else {
        val (size, p2) = readLong(p, p1)
        if (p2 < 0 || size < 0 || p2 + size + 16 > p.length) consistent = false
        else {
          var k = 0
          var same = true
          val sOff = p2 + size.toInt
          while (k < 16) {
            if (p(sOff + k) != p(syncAt + k)) same = false
            k += 1
          }
          if (!same) syncOk = false
          nBlocks += 1
          nRecords += cnt
          dataBytes += size
          pos = sOff + 16
        }
      }
    }
    if (nBlocks >= MaxBlocks) consistent = false
    val (sType, sName) = schemaSignature(schema)
    new GenericInternalRow(Array[Any](
      true, UTF8String.fromString(codec),
      if (sType == null) null else UTF8String.fromString(sType),
      if (sName == null) null else UTF8String.fromString(sName),
      if (schema == null) null else schema.length.toLong,
      nMeta, nBlocks, nRecords, dataBytes, syncOk, consistent))
  }

  /** Minimal schema-JSON scan: the top-level `"type"` value (or the
    * bare quoted primitive form `"long"`), and for records the
    * `"name"` value. Index scans only — no general JSON parse in a
    * triage kernel; nested values past the first occurrence are the
    * record-decode tier's concern, not triage's.
    */
  private[expressions] def schemaSignature(s: Array[Byte]): (String, String) = {
    if (s == null || s.length == 0) return (null, null)
    val str = new String(s, "UTF-8")
    val t = str.trim
    if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 3)
      return (t.substring(1, t.length - 1), null)
    val ty = quotedValueAfter(str, "\"type\"")
    val nm = quotedValueAfter(str, "\"name\"")
    (ty, if (ty == "record") nm else null)
  }

  private def quotedValueAfter(s: String, key: String): String = {
    val at = s.indexOf(key)
    if (at < 0) return null
    var i = at + key.length
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == ':')) i += 1
    if (i >= s.length || s.charAt(i) != '"') return null
    val end = s.indexOf('"', i + 1)
    if (end < 0) return null
    s.substring(i + 1, end)
  }
}

/** FLAT-RECORD decode tier behind the Avro triage row: event-log
  * Avro is overwhelmingly a flat record of primitives, and THAT
  * shape decodes without a general schema interpreter — the fields
  * array is scanned in order for primitive type names, then every
  * record in every (null-codec) block is a fixed sequence of
  * primitive reads: zigzag varints (long/int), length-prefixed
  * strings/bytes, IEEE-754 LE doubles/floats, 1-byte booleans.
  * Emits record-grain aggregates: record count, the sum of every
  * integer field, the total string byte count, the boolean true
  * count — the signals a corpus audit of an event dump starts from.
  *
  * Out of scope (null fields, triage covers the rest): non-"null"
  * codecs, nested/union/array/map/enum/fixed fields — a corpus user
  * hits those through Spark's own Avro reader; this tier is the
  * payload-BYTES audit path.
  */
object AvroRecordsKernel {
  val MaxFields = 64

  /** Field type codes: 0 long/int, 1 string/bytes, 2 double, 3
    * float, 4 boolean, -1 unsupported.
    */
  private def fieldTypes(schema: Array[Byte]): Array[Int] = {
    if (schema == null) return null
    val s = new String(schema, "UTF-8")
    val fa = s.indexOf("\"fields\"")
    if (fa < 0) return null
    val types = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = s.indexOf('[', fa)
    if (i < 0) return null
    var depth = 0
    var done = false
    while (!done && i < s.length) {
      val c = s.charAt(i)
      if (c == '[') depth += 1
      else if (c == ']') { depth -= 1; if (depth == 0) done = true }
      else if (c == '{' && depth == 1) {
        // one field object: find its "type" value
        val end = s.indexOf('}', i)
        if (end < 0) return null
        val obj = s.substring(i, end + 1)
        val ta = obj.indexOf("\"type\"")
        if (ta < 0) return null
        var j = ta + 6
        while (j < obj.length && (obj.charAt(j) == ' ' || obj.charAt(j) == ':')) j += 1
        if (j >= obj.length || obj.charAt(j) != '"') return null
        val e2 = obj.indexOf('"', j + 1)
        if (e2 < 0) return null
        val ty = obj.substring(j + 1, e2)
        types += (ty match {
          case "long" | "int" => 0
          case "string" | "bytes" => 1
          case "double" => 2
          case "float" => 3
          case "boolean" => 4
          case _ => -1
        })
        if (types.length > MaxFields) return null
        i = end
      }
      i += 1
    }
    if (!done || types.isEmpty || types.contains(-1)) return null
    types.toArray
  }

  private def readLong(p: Array[Byte], posIn: Int): (Long, Int) = {
    var pos = posIn
    var u = 0L
    var shift = 0
    while (shift < 64) {
      if (pos >= p.length) return (0L, -1)
      val b = p(pos) & 0xFF
      pos += 1
      u |= (b & 0x7FL) << shift
      if ((b & 0x80) == 0) return ((u >>> 1) ^ -(u & 1L), pos)
      shift += 7
    }
    (0L, -1)
  }

  /** Struct (avro_valid, decode_ok, n_fields, n_records, int_sum,
    * string_bytes, bool_trues, double_sum) or null for non-Avro
    * bytes. `decode_ok` false for non-flat schemas, non-null codecs,
    * or byte-level damage.
    */
  def stats(p: Array[Byte]): InternalRow = {
    if (!AvroMetaKernel.isAvro(p)) return null
    val meta = AvroMetaKernel.parse(p)
    if (meta == null) return null
    def fail = new GenericInternalRow(Array[Any](
      true, false, null, null, null, null, null, null))
    if (!meta.getBoolean(10)) return fail // inconsistent container
    if (meta.getUTF8String(1).toString != "null") return fail
    // re-walk: skip the metadata map, then decode every block
    var pos = 4
    var schema: Array[Byte] = null
    var mapDone = false
    while (!mapDone) {
      val (cnt0, pos0) = readLong(p, pos)
      if (pos0 < 0) return fail
      pos = pos0
      var cnt = cnt0
      if (cnt == 0L) mapDone = true
      else {
        if (cnt < 0) {
          val (_, pos1) = readLong(p, pos)
          if (pos1 < 0) return fail
          pos = pos1
          cnt = -cnt
        }
        var i = 0L
        while (i < cnt) {
          val (klen, pk) = readLong(p, pos)
          if (pk < 0 || klen < 0 || pk + klen > p.length) return fail
          val key = new String(p, pk, klen.toInt, "UTF-8")
          pos = pk + klen.toInt
          val (vlen, pv) = readLong(p, pos)
          if (pv < 0 || vlen < 0 || pv + vlen > p.length) return fail
          if (key == "avro.schema" && vlen <= AvroMetaKernel.MaxSchemaBytes) {
            schema = new Array[Byte](vlen.toInt)
            System.arraycopy(p, pv, schema, 0, vlen.toInt)
          }
          pos = pv + vlen.toInt
          i += 1
        }
      }
    }
    val types = fieldTypes(schema)
    if (types == null) return fail
    pos += 16 // header sync
    var nRecords = 0L
    var intSum = 0L
    var strBytes = 0L
    var boolTrues = 0L
    var dblSum = 0.0
    while (pos < p.length) {
      val (cnt, p1) = readLong(p, pos)
      if (p1 < 0 || cnt < 0) return fail
      val (size, p2) = readLong(p, p1)
      if (p2 < 0 || size < 0 || p2 + size + 16 > p.length) return fail
      var rp = p2
      val blockEnd = p2 + size.toInt
      var r = 0L
      while (r < cnt) {
        var f = 0
        while (f < types.length) {
          types(f) match {
            case 0 =>
              val (v, np) = readLong(p, rp)
              if (np < 0 || np > blockEnd) return fail
              intSum += v
              rp = np
            case 1 =>
              val (l, np) = readLong(p, rp)
              if (np < 0 || l < 0 || np + l > blockEnd) return fail
              strBytes += l
              rp = np + l.toInt
            case 2 =>
              if (rp + 8 > blockEnd) return fail
              var bits = 0L
              var k = 7
              while (k >= 0) { bits = (bits << 8) | (p(rp + k) & 0xFFL); k -= 1 }
              dblSum += java.lang.Double.longBitsToDouble(bits)
              rp += 8
            case 3 =>
              if (rp + 4 > blockEnd) return fail
              var bits = 0
              var k = 3
              while (k >= 0) { bits = (bits << 8) | (p(rp + k) & 0xFF); k -= 1 }
              dblSum += java.lang.Float.intBitsToFloat(bits).toDouble
              rp += 4
            case _ =>
              if (rp + 1 > blockEnd) return fail
              if (p(rp) == 1) boolTrues += 1
              rp += 1
          }
          f += 1
        }
        r += 1
      }
      if (rp != blockEnd) return fail // records must fill the block
      nRecords += cnt
      pos = blockEnd + 16
    }
    new GenericInternalRow(Array[Any](
      true, true, types.length.toLong, nRecords, intSum, strBytes,
      boolTrues, dblSum))
  }
}

/** Deterministic Avro OCF synthesis from a doc_id — REAL container
  * files: a flat-record schema (`Rec<d%7>`: long f1, string f2,
  * boolean f3), the optional `avro.codec` entry rotating
  * absent/null/deflate (the deflate lane carries deflate-compressed
  * block PAYLOAD BYTES — triage walks it by size, the record tier
  * refuses it), closed-form sync bytes, 1-3 blocks of REAL
  * Avro-encoded records (zigzag longs, length-prefixed strings,
  * booleans), and a d%20==11 lane with a flipped final sync byte
  * (structure intact, integrity verdict false). Byte LENGTH is
  * closed-form (varint widths pinned by the value ranges), so the
  * mixed-triage oracle can re-derive `payload_bytes` exactly.
  */
object AvroSynthKernel {
  /** The schema template — `%N` is the single rotating digit. Its
    * byte length is the oracle's `schema_bytes` constant.
    */
  def schemaJson(d: Long): String =
    s"""{"type":"record","name":"Rec${d % 7}","fields":[{"name":"f1","type":"long"},{"name":"f2","type":"string"},{"name":"f3","type":"boolean"}]}"""

  val SchemaLen: Int = schemaJson(0L).length

  private def zig(v: Long): Array[Byte] = {
    var u = (v << 1) ^ (v >> 63)
    val out = new java.io.ByteArrayOutputStream(4)
    do {
      val b = (u & 0x7F).toInt
      u >>>= 7
      out.write(if (u != 0) b | 0x80 else b)
    } while (u != 0)
    out.toByteArray
  }

  /** One record's bytes: f1 = (d+i)%30 (1-byte zigzag), f2 = 3 chars
    * `(d+i)%26+'a'` repeated (1-byte len + 3), f3 = (d+i)%2. Record
    * size is exactly 6 bytes — the closed-form block-size anchor.
    */
  private def record(d: Long, i: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8)
    out.write(zig((d + i) % 30), 0, 1)
    out.write(zig(3L), 0, 1)
    val c = ('a' + ((d + i) % 26)).toInt
    out.write(c); out.write(c); out.write(c)
    out.write(((d + i) % 2).toInt)
    out.toByteArray
  }

  val RecordLen = 6

  def synth(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    out.write('O'); out.write('b'); out.write('j'); out.write(1)
    val codecLane = (d % 3).toInt // 0 absent, 1 "null", 2 "deflate"
    val schema = schemaJson(d).getBytes("UTF-8")
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      val l = zig(b.length.toLong)
      out.write(l, 0, l.length)
      out.write(b, 0, b.length)
    }
    val nMeta = if (codecLane == 0) 1 else 2
    out.write(zig(nMeta.toLong), 0, 1)
    str("avro.schema")
    val sl = zig(schema.length.toLong)
    out.write(sl, 0, sl.length)
    out.write(schema, 0, schema.length)
    if (codecLane == 1) { str("avro.codec"); str("null") }
    if (codecLane == 2) { str("avro.codec"); str("deflate") }
    out.write(zig(0L), 0, 1) // map terminator
    val sync = new Array[Byte](16)
    var k = 0
    while (k < 16) { sync(k) = ((d * 7 + k * 13) % 256).toByte; k += 1 }
    out.write(sync, 0, 16)
    val nBlocks = (1 + d % 3).toInt
    var b = 0
    var recBase = 0L
    while (b < nBlocks) {
      val cnt = (2 + (d + b) % 4).toInt
      val raw = new java.io.ByteArrayOutputStream(64)
      var i = 0
      while (i < cnt) {
        val rb = record(d, recBase + i)
        raw.write(rb, 0, rb.length)
        i += 1
      }
      recBase += cnt
      val payload =
        if (codecLane == 2) {
          // REAL deflate-compressed block bytes (raw deflate, the
          // Avro convention: no zlib wrapper) — STORED blocks so the
          // compressed length stays closed-form (5-byte header +
          // data; the mixed-triage oracle re-derives payload_bytes)
          val defl = new java.util.zip.Deflater(
            java.util.zip.Deflater.NO_COMPRESSION, true)
          defl.setInput(raw.toByteArray)
          defl.finish()
          val buf = new Array[Byte](256)
          val o = new java.io.ByteArrayOutputStream(128)
          while (!defl.finished()) {
            val n = defl.deflate(buf)
            o.write(buf, 0, n)
          }
          defl.end()
          o.toByteArray
        } else raw.toByteArray
      out.write(zig(cnt.toLong), 0, 1)
      val szv = zig(payload.length.toLong)
      out.write(szv, 0, szv.length)
      out.write(payload, 0, payload.length)
      out.write(sync, 0, 16)
      b += 1
    }
    val bytes = out.toByteArray
    if (d % 20 == 11) {
      // flip one byte of the LAST sync marker: structure intact,
      // integrity verdict false
      bytes(bytes.length - 8) = (bytes(bytes.length - 8) ^ 0x5A).toByte
    }
    bytes
  }
}

/** `avro_meta(payload) → struct<...11 fields>`; see
  * [[AvroMetaKernel.parse]].
  */
case class AvroMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("avro_valid", BooleanType),
    StructField("codec", StringType),
    StructField("schema_type", StringType),
    StructField("schema_name", StringType),
    StructField("schema_bytes", LongType),
    StructField("n_meta_entries", LongType),
    StructField("n_blocks", LongType),
    StructField("n_records", LongType),
    StructField("data_bytes", LongType),
    StructField("sync_ok", BooleanType),
    StructField("consistent", BooleanType)))
  override def nullable: Boolean = true
  override def prettyName: String = "avro_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    AvroMetaKernel.parse(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.AvroMetaKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `avro_record_stats(payload) → struct<...8 fields>`; see
  * [[AvroRecordsKernel.stats]].
  */
case class AvroRecordStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("avro_valid", BooleanType),
    StructField("decode_ok", BooleanType),
    StructField("n_fields", LongType),
    StructField("n_records", LongType),
    StructField("int_sum", LongType),
    StructField("string_bytes", LongType),
    StructField("bool_trues", LongType),
    StructField("double_sum", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "avro_record_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    AvroRecordsKernel.stats(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.AvroRecordsKernel.stats($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `avro_synth(doc_id) → binary`; see [[AvroSynthKernel.synth]]. */
case class AvroSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "avro_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    AvroSynthKernel.synth(d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.AvroSynthKernel.synth($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
