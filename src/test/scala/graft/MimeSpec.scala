package graft

import org.apache.spark.sql.functions._

import graft.expressions.{MimePartsKernel, MimeSynthKernel}

/** MIME decode (RFC 2045/2046): synth round trips over the lane
  * grid, quoted-printable / base64 / boundary edge cases from the
  * RFC text, structural traps, and the driver-row shape. External
  * conformance posture: no independent MIME library ships in the
  * JDK or on the Spark classpath, so the wire side leans on the
  * JDK's own Base64 MIME codec (encoder in the synth, decoder in
  * the kernel — both sides of the same RFC 2045 table) plus
  * hand-built vectors for the QP and boundary rules.
  */
class MimeSpec extends SparkSpec {

  private def parts(raw: String): Seq[org.apache.spark.sql.catalyst.InternalRow] = {
    val arr = MimePartsKernel.parse(raw.getBytes("UTF-8"))
    if (arr == null) null
    else (0 until arr.numElements()).map(i => arr.getStruct(i, 9))
  }

  test("synth round trips: every lane decodes to its closed form") {
    for (d <- 1L to 200L if d % 10 != 0) {
      val raw = MimeSynthKernel.synth(d, "sample text for doc " * 8)
      val arr = MimePartsKernel.parse(raw)
      assert(arr != null, s"d=$d: null")
      val nl = (d % 3) match { case 0 => 2; case 1 => 3; case _ => 5 }
      assert(arr.numElements() === nl, s"d=$d: leaf count")
      val p0 = arr.getStruct(0, 9)
      assert(p0.getUTF8String(1).toString === "text/plain")
      assert(p0.getUTF8String(2).toString === "utf-8")
      assert(p0.getUTF8String(3).toString === "quoted-printable")
      val exp0 = s"part0 doc $d: caffè 100% =sign, tail y${d % 7}"
      assert(p0.getUTF8String(8).toString === exp0, s"d=$d: QP decode")
      assert(p0.getLong(6) === exp0.getBytes("UTF-8").length.toLong)
      val p1 = arr.getStruct(1, 9)
      assert(p1.getUTF8String(2).toString === "us-ascii", "quoted param unquoted")
      assert(p1.getUTF8String(3).toString === "base64", "BASE64 lowercased")
      assert(p1.getUTF8String(8).toString.startsWith(s"b64 doc $d :: "),
        s"d=$d: b64 text decode")
      if (nl >= 3) {
        val p2 = arr.getStruct(2, 9)
        assert(p2.getUTF8String(1).toString === "application/octet-stream")
        assert(p2.getBoolean(4), "attachment disposition")
        assert(p2.getUTF8String(5).toString === s"f$d.bin", "filename param")
        val len = (30 + d % 50).toInt
        assert(p2.getLong(6) === len.toLong)
        var sum = 0L
        for (j <- 0 until len) sum += (d * 7 + j * 3) % 256
        assert(p2.getLong(7) === sum, s"d=$d: binary b64 byte sum")
        assert(p2.isNullAt(8), "binary leaf has no text")
      }
      if (nl == 5) {
        assert(arr.getStruct(3, 9).getUTF8String(8).toString ===
          s"plain alt doc $d", "nested plain leaf")
        val h = arr.getStruct(4, 9)
        assert(h.getUTF8String(1).toString === "text/html")
        assert(h.getUTF8String(3).toString === "7bit", "default encoding")
        assert(h.getUTF8String(8).toString === s"<b>alt html doc $d</b>")
      }
    }
  }

  test("quoted-printable: RFC 2045 rules — soft breaks (CRLF and LF), =3D, invalid escape literal") {
    val msg = "Content-Type: text/plain\r\n" +
      "Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
      "a=3Db line that soft=\r\nwraps and bare=\nwraps, =C3=A8, bad =zz end"
    val ps = parts(msg)
    assert(ps != null && ps.length === 1)
    assert(ps.head.getUTF8String(8).toString ===
      "a=b line that softwraps and barewraps, è, bad =zz end")
  }

  test("boundary rules: preamble/epilogue skipped, trailing WS on delimiter lines, CRLF owned by delimiter") {
    val msg = "Content-Type: multipart/mixed; boundary=XX\r\n\r\n" +
      "this is a preamble\r\nstill preamble\r\n" +
      "--XX  \t\r\n" + // trailing whitespace is legal on delimiter lines
      "Content-Type: text/plain\r\n\r\n" +
      "body one\r\n" + // this CRLF belongs to the next delimiter
      "--XX\r\n" +
      "Content-Type: text/plain\r\n\r\n" +
      "body two ends without newline" +
      "\r\n--XX--\r\n" +
      "epilogue\r\n"
    val ps = parts(msg)
    assert(ps != null && ps.length === 2)
    assert(ps(0).getUTF8String(8).toString === "body one",
      "the CRLF before a delimiter is the delimiter's")
    assert(ps(1).getUTF8String(8).toString === "body two ends without newline")
  }

  test("header folding and case-insensitivity") {
    val msg = "content-TYPE: multipart/mixed;\r\n\tboundary=yy\r\n" +
      "Subject: folded\r\n over two lines\r\n\r\n" +
      "--yy\r\ncontent-type: TEXT/Plain; CHARSET=UTF-8\r\n" +
      "CONTENT-TRANSFER-ENCODING: 8BIT\r\n\r\nok\r\n--yy--\r\n"
    val ps = parts(msg)
    assert(ps != null && ps.length === 1)
    assert(ps.head.getUTF8String(1).toString === "text/plain")
    assert(ps.head.getUTF8String(2).toString === "UTF-8",
      "param VALUES keep their case; only names/types lowercase")
    assert(ps.head.getUTF8String(3).toString === "8bit")
    assert(ps.head.getUTF8String(8).toString === "ok")
  }

  test("traps: no blank line, no content-type, missing boundary, unclosed multipart, bad base64 → null") {
    assert(MimePartsKernel.parse("no headers here just text".getBytes) == null)
    assert(MimePartsKernel.parse(
      "Subject: x\r\n\r\nbody without content-type".getBytes) == null)
    assert(MimePartsKernel.parse(
      "Content-Type: multipart/mixed\r\n\r\n--a\r\n\r\nx\r\n--a--\r\n"
        .getBytes) == null, "multipart without boundary param")
    assert(MimePartsKernel.parse(
      ("Content-Type: multipart/mixed; boundary=q\r\n\r\n--q\r\n" +
        "Content-Type: text/plain\r\n\r\nnever closed").getBytes) == null,
      "no closing delimiter → strict refusal")
    assert(MimePartsKernel.parse(
      ("Content-Type: text/plain\r\nContent-Transfer-Encoding: base64" +
        "\r\n\r\n!!!not base64!!!").getBytes) == null)
    // never-throw sweep: truncations of a full synth message
    val full = MimeSynthKernel.synth(23L, "text " * 40)
    for (cut <- 0 until full.length)
      MimePartsKernel.parse(java.util.Arrays.copyOf(full, cut))
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val g = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(g)
      MimePartsKernel.parse(g)
    }
  }

  test("mail headers: RFC 2047 B and Q forms, adjacent-word merge, mailbox split") {
    import graft.expressions.MailHeadersKernel
    for (d <- 1L to 100L if d % 10 != 0) {
      val row = MailHeadersKernel.parse(
        MimeSynthKernel.synth(d, "text " * 10))
      assert(row != null, s"d=$d")
      assert(row.getUTF8String(0).toString === s"sender$d@example.com")
      val expName = (d % 4) match {
        case 0 => null
        case 1 => s"Sender $d"
        case _ => s"Señor $d"
      }
      if (expName == null) assert(row.isNullAt(1), s"d=$d: no display name")
      else assert(row.getUTF8String(1).toString === expName, s"d=$d: name")
      assert(row.getUTF8String(2).toString === s"rcpt$d@example.org")
      val expSubj = (d % 5) match {
        case 0 => s"doc $d plain"
        case 4 => "plain then año"
        case _ => s"Tema $d año"
      }
      assert(row.getUTF8String(3).toString === expSubj,
        s"d=$d: subject (lane ${d % 5})")
      assert(row.getUTF8String(5).toString === s"<m$d@example.com>")
    }
    // RFC 2047 §6.2 hand vectors
    def subj(h: String): String = {
      val row = MailHeadersKernel.parse(
        (s"From: a@b\r\nSubject: $h\r\n\r\nbody").getBytes("UTF-8"))
      if (row.isNullAt(3)) null else row.getUTF8String(3).toString
    }
    assert(subj("=?UTF-8?B?aGk=?=   =?UTF-8?B?IHlv?=") === "hi yo",
      "multi-space between adjacent words drops entirely")
    assert(subj("x =?UTF-8?Q?a_b?= y") === "x a b y",
      "Q underscores are spaces; plain-side spaces survive")
    assert(subj("=?bogus") === "=?bogus", "malformed passes through verbatim")
    assert(subj("=?UTF-8?X?zz?= t") === "=?UTF-8?X?zz?= t",
      "unknown encoding letter passes through")
    // quoted display name, folded subject
    val folded = MailHeadersKernel.parse(
      ("From: \"Quoted Name\" <q@ex.com>\r\nSubject: part one\r\n" +
        " and folded\r\n\r\nbody").getBytes("UTF-8"))
    assert(folded.getUTF8String(1).toString === "Quoted Name")
    assert(folded.getUTF8String(3).toString === "part one and folded")
    assert(MailHeadersKernel.parse("no headers".getBytes) == null)
    assert(MailHeadersKernel.parse(
      "Subject: x\r\n\r\nno from".getBytes) == null)
  }

  test("driver-row shape: Mime.parts over the docs synth") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 40)
    val d = col("doc_id")
    val raw = when(d % 10 === 0, col("text").cast("binary"))
      .otherwise(org.apache.spark.sql.GraftColumnBridge.column(
        graft.expressions.MimeSynth(
          org.apache.spark.sql.GraftColumnBridge.expression(d),
          org.apache.spark.sql.GraftColumnBridge.expression(col("text")))))
    val out = graft.sources.Mime.parts(docs.select(d, raw.as("raw")), col("raw"))
    val rows = out.select("doc_id", "mime_valid", "part_idx").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, rs) =>
      if (id % 10 == 0) {
        assert(rs.length === 1 && !rs.head.getBoolean(1), s"doc $id text lane")
      } else {
        val nl = (id % 3) match { case 0 => 2; case 1 => 3; case _ => 5 }
        assert(rs.length === nl, s"doc $id leaves")
        assert(rs.forall(_.getBoolean(1)), s"doc $id valid")
      }
    }
  }
}
