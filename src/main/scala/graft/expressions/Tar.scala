package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** POSIX ustar (tar) member kernels — the shard framing multimodal
  * training corpora actually ship in: WebDataset stores each sample
  * as adjacently-named members of a plain tar ("000123.jpg",
  * "000123.txt", …), chosen precisely because the format is a
  * sequential 512-byte-block walk with no central index — a reader
  * streams samples without seeking. Ingest therefore needs the member
  * walk: header block (name, octal size, checksum over the header
  * with the checksum field blanked), data rounded up to 512, repeat;
  * two zero blocks end the archive.
  *
  * Null (never a throw) on structural violations: short/misaligned
  * blobs, a header checksum mismatch, a non-octal size, a member
  * overrunning the blob, or more than [[MaxMembers]] members. Only
  * regular-file members (typeflag '0' or NUL) are emitted; directory
  * and PAX/GNU metadata members are SKIPPED (their sizes still drive
  * the walk) — the fields a training-data reader keys on are the name
  * and the bytes.
  */
object TarKernel {
  val MaxMembers = 65536

  private def octal(p: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    // leading spaces/NULs tolerated, terminated by space/NUL
    while (i < end && (p(i) == ' ' || p(i) == 0)) i += 1
    var v = 0L
    var digits = 0
    while (i < end && p(i) >= '0' && p(i) <= '7') {
      v = v * 8 + (p(i) - '0')
      digits += 1
      if (v > Int.MaxValue) return -1L
      i += 1
    }
    if (digits == 0) -1L else v
  }

  private def checksum(p: Array[Byte], off: Int): Long = {
    var s = 0L
    var i = 0
    while (i < 512) {
      // the checksum field itself (148..155) counts as spaces
      s += (if (i >= 148 && i < 156) ' '.toLong else (p(off + i) & 0xFF).toLong)
      i += 1
    }
    s
  }

  /** Split a tar blob into `(name, data)` rows for its regular-file
    * members, or null.
    */
  def members(p: Array[Byte]): ArrayData = {
    if (p.length % 512 != 0) return null
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var pos = 0
    while (pos + 512 <= p.length) {
      // end-of-archive: a zero block (conventionally two)
      var allZero = true
      var z = 0
      while (allZero && z < 512) { if (p(pos + z) != 0) allZero = false; z += 1 }
      if (allZero) return new GenericArrayData(out.toArray)
      if (out.length >= MaxMembers) return null
      val declared = octal(p, pos + 148, 8)
      if (declared < 0 || declared != checksum(p, pos)) return null
      val size = octal(p, pos + 124, 12)
      if (size < 0) return null
      var nameLen = 0
      while (nameLen < 100 && p(pos + nameLen) != 0) nameLen += 1
      val name = new String(p, pos, nameLen, "UTF-8")
      val typeflag = p(pos + 156)
      val dataStart = pos + 512
      val dataEnd = dataStart + size
      if (dataEnd > p.length) return null
      if (typeflag == '0' || typeflag == 0) {
        val data = java.util.Arrays.copyOfRange(p, dataStart, dataEnd.toInt)
        out += InternalRow(UTF8String.fromString(name), data)
      }
      pos = (dataEnd.toInt + 511) / 512 * 512
    }
    // no terminator blocks: accept a cleanly-exhausted blob
    new GenericArrayData(out.toArray)
  }

  /** One ustar member: 512-byte header (mode 0644, uid/gid 0,
    * mtime 0 — fully deterministic) + data padded to 512. Names are
    * limited to the classic 100-byte field.
    */
  def member(name: Array[Byte], data: Array[Byte]): Array[Byte] = {
    require(name.length > 0 && name.length <= 100,
      s"tar member name length ${name.length} not in 1..100")
    val size = data.length
    val padded = (size + 511) / 512 * 512
    val out = new Array[Byte](512 + padded)
    System.arraycopy(name, 0, out, 0, name.length)
    def putOctal(off: Int, len: Int, v: Long): Unit = {
      val s = ("%0" + (len - 1) + "o").format(v)
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, off, len - 1)
      out(off + len - 1) = 0
    }
    putOctal(100, 8, 420) // mode 0644
    putOctal(108, 8, 0) // uid
    putOctal(116, 8, 0) // gid
    putOctal(124, 12, size.toLong)
    putOctal(136, 12, 0) // mtime
    out(156) = '0' // regular file
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, out, 257, 5)
    out(263) = '0'; out(264) = '0' // version "00"
    // checksum: field = spaces during the sum, then octal + NUL + space
    java.util.Arrays.fill(out, 148, 156, ' '.toByte)
    var s = 0L
    var i = 0
    while (i < 512) { s += out(i) & 0xFF; i += 1 }
    System.arraycopy("%06o".format(s).getBytes("US-ASCII"), 0, out, 148, 6)
    out(154) = 0
    out(155) = ' '
    System.arraycopy(data, 0, out, 512, size)
    out
  }

  /** The end-of-archive marker: two zero blocks. */
  val Terminator: Array[Byte] = new Array[Byte](1024)
}

/** `tar_member(name, data) → binary` — one deterministic ustar member
  * (the writer face / synthesis device); concatenate members +
  * [[TarKernel.Terminator]] for a full shard.
  */
case class TarMemberWrite(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "tar_member"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string name, binary data), got $other")
    }

  override def nullSafeEval(name: Any, data: Any): Any =
    TarKernel.member(name.asInstanceOf[UTF8String].getBytes,
      data.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, d) => s"""
      |${ev.value} = graft.expressions.TarKernel.member($n.getBytes(), $d);
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `tar_members(blob) → array<struct<name string, data binary>>` —
  * regular-file members of a tar shard; see [[TarKernel.members]].
  */
case class TarMembers(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("data", BinaryType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "tar_members"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    TarKernel.members(d.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.TarKernel.members($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
