package graft

import graft.expressions.{SubtitleCuesKernel, SubtitleSynthKernel}

class SubtitlesSpec extends SparkSpec {

  private def cuesOf(raw: Array[Byte]) = {
    val row = SubtitleCuesKernel.parse(raw)
    if (row == null) null
    else (row.getUTF8String(0).toString, row.getArray(1))
  }

  test("synth round trips: every lane parses to its closed form") {
    for (d <- 1L to 100L if d % 10 != 0) {
      val text = s"Doc $d body text with enough words to pass sixty chars of prose here"
      val parsed = cuesOf(SubtitleSynthKernel.synth(d, text))
      assert(parsed != null, s"d=$d")
      val (kind, cues) = parsed
      assert(kind === (if (d % 2 == 0) "srt" else "vtt"), s"d=$d: kind")
      val n = (2 + d % 3).toInt
      assert(cues.numElements() === n, s"d=$d: n cues")
      val splice = text.substring(0, math.min(60, text.length))
        .replace('\r', ' ').replace('\n', ' ')
      for (j <- 0 until n) {
        val c = cues.getStruct(j, 4)
        assert(c.getLong(0) === j.toLong, s"d=$d j=$j: idx")
        val start = j * 2000L + (d % 7) * 100L
        assert(c.getLong(1) === start, s"d=$d j=$j: start")
        assert(c.getLong(2) === start + 1500L + (d % 5) * 20L,
          s"d=$d j=$j: end")
        val exp =
          if (j == n - 1) splice
          else if (j == 0) s"Cue 0 of doc $d"
          else if (j == 1) s"line one of $d\na & b <c>"
          else s"cue $j of doc $d"
        assert(c.getUTF8String(3).toString === exp, s"d=$d j=$j: text")
      }
    }
  }

  test("hand vectors: BOM, CRLF, short stamps, settings, NOTE, malformed") {
    def vtt(body: String): Array[Byte] =
      ("WEBVTT\n\n" + body).getBytes("UTF-8")
    // BOM + CRLF SRT
    val srt = "\uFEFF1\r\n00:00:01,000 --> 00:00:02,500\r\nhello\r\n\r\n" +
      "2\r\n00:00:03,000 --> 00:00:04,000\r\nworld line\r\nsecond\r\n"
    val (k1, c1) = cuesOf(srt.getBytes("UTF-8"))
    assert(k1 === "srt" && c1.numElements() === 2)
    assert(c1.getStruct(0, 4).getLong(1) === 1000L)
    assert(c1.getStruct(0, 4).getLong(2) === 2500L)
    assert(c1.getStruct(1, 4).getUTF8String(3).toString === "world line\nsecond")
    // VTT short stamp + settings + identifier
    val (k2, c2) = cuesOf(vtt(
      "intro-cue\n01:02.345 --> 01:03.456 align:start position:10%\nhi\n"))
    assert(k2 === "vtt" && c2.numElements() === 1)
    assert(c2.getStruct(0, 4).getLong(1) === 62345L)
    assert(c2.getStruct(0, 4).getLong(2) === 63456L)
    // NOTE / STYLE blocks skipped; malformed timing block skipped
    val (k3, c3) = cuesOf(vtt(
      "NOTE a comment\nspanning lines\n\nSTYLE\n::cue { color: red }\n\n" +
        "00:00:01.000 --> 00:xx:02.000\nbad\n\n" +
        "00:00:01.000 --> 00:00:02.000\ngood\n"))
    assert(k3 === "vtt" && c3.numElements() === 1)
    assert(c3.getStruct(0, 4).getUTF8String(3).toString === "good")
    // tag strip before entity decode: literal &lt;i&gt; survives as <i>
    val (_, c4) = cuesOf(vtt(
      "00:00:00.000 --> 00:00:01.000\n<v Ann>x &lt;i&gt; y</v>\n"))
    assert(c4.getStruct(0, 4).getUTF8String(3).toString === "x <i> y")
    // hours in VTT, comma rejected in a dot position is still a
    // parseable SRT-style stamp ONLY for srt kind — vtt accepts both
    // separators per the shared grammar
    val (_, c5) = cuesOf(vtt("01:00:00.000 --> 01:00:01.500\nh\n"))
    assert(c5.getStruct(0, 4).getLong(1) === 3600000L)
    // non-subtitle text, empty, and headerless prose are null
    assert(SubtitleCuesKernel.parse("just some prose\n".getBytes) == null)
    assert(SubtitleCuesKernel.parse(Array.emptyByteArray) == null)
    assert(SubtitleCuesKernel.parse(
      "12\nno timing follows\n".getBytes) == null)
    // WEBVTTx is not a vtt header
    assert(SubtitleCuesKernel.parse(
      "WEBVTTx\n\n00:00:00.000 --> 00:00:01.000\nq\n".getBytes) == null)
    // vtt with zero cues is still a valid (empty) vtt
    val (k6, c6) = cuesOf("WEBVTT\n".getBytes("UTF-8"))
    assert(k6 === "vtt" && c6.numElements() === 0)
  }

  test("never-throw: truncation and bit flips over both kinds") {
    for (seed <- Seq(4L, 7L)) { // srt and vtt lanes
      val full = SubtitleSynthKernel.synth(seed, "text " * 30)
      for (cut <- 0 until full.length)
        SubtitleCuesKernel.parse(java.util.Arrays.copyOf(full, cut))
      val rnd = new scala.util.Random(11 + seed)
      for (_ <- 0 until 300) {
        val g = full.clone()
        g(rnd.nextInt(g.length)) =
          (g(rnd.nextInt(g.length)) ^ (1 << rnd.nextInt(8))).toByte
        SubtitleCuesKernel.parse(g)
      }
    }
  }

  test("driver-row shape: Subtitles.cues over the docs synth") {
    import org.apache.spark.sql.functions._
    val q = SparkEntry.queries("text_subtitles")(spark, sfDir)
      .where(col("doc_id") < 40)
    val rows = q.collect()
    assert(rows.nonEmpty)
    val valid = rows.filter(_.getBoolean(1))
    assert(valid.nonEmpty && valid.forall(r => r.getLong(5) > r.getLong(4)),
      "end_ms > start_ms on every valid cue")
    assert(rows.filter(!_.getBoolean(1)).forall(_.isNullAt(3)),
      "invalid docs keep one null row")
  }
}
