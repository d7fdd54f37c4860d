package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.CharsetDetectKernel

/** Charset sniff + decode: the four gate lanes round-trip at kernel
  * level (including supplementary characters through both UTF-16
  * byte orders and 4-byte UTF-8), the BOM-less UTF-16 heuristic, the
  * Latin-1 fallback, strict RFC 3629 rejection shapes (overlong,
  * surrogate range, beyond U+10FFFF, bare continuation, truncation),
  * and never-throw garbage.
  */
class CharsetSpec extends AnyFunSuite {

  private def detect(p: Array[Byte]) = {
    val r = CharsetDetectKernel.detect(p)
    assert(r != null)
    (r.getUTF8String(0).toString, r.getBoolean(1), r.getBoolean(2),
      r.getUTF8String(3).toString)
  }

  private val samples = Seq(
    "plain ascii text with words",
    "accents: café naïve über",
    "CJK: 中文文本 and kana カタカナ",
    "emoji 😀 and math 𝔸 (supplementary planes)",
    "")

  test("UTF-8 bare and BOM'd round-trip verbatim") {
    for (s <- samples) {
      val bare = detect(s.getBytes("UTF-8"))
      assert(bare._1 === "utf-8" && !bare._2 && bare._3)
      assert(bare._4 === s)
      val bom = detect(
        Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ s.getBytes("UTF-8"))
      assert(bom._1 === "utf-8" && bom._2 && bom._3)
      assert(bom._4 === s)
    }
  }

  test("UTF-16LE/BE with BOMs round-trip verbatim (incl. surrogate pairs)") {
    for (s <- samples) {
      val le = detect(
        Array[Byte](0xFF.toByte, 0xFE.toByte) ++ s.getBytes("UTF-16LE"))
      assert(le._1 === "utf-16le" && le._2 && le._3)
      assert(le._4 === s)
      val be = detect(
        Array[Byte](0xFE.toByte, 0xFF.toByte) ++ s.getBytes("UTF-16BE"))
      assert(be._1 === "utf-16be" && be._2 && be._3)
      assert(be._4 === s)
    }
  }

  test("BOM-less UTF-16 heuristic: ASCII-heavy text detected by NUL parity") {
    val s = "plain ascii text, long enough for the parity signal"
    val le = detect(s.getBytes("UTF-16LE"))
    assert(le._1 === "utf-16le" && !le._2 && !le._3, s"got $le")
    assert(le._4 === s)
    val be = detect(s.getBytes("UTF-16BE"))
    assert(be._1 === "utf-16be" && !be._2 && !be._3)
    assert(be._4 === s)
  }

  test("Latin-1 fallback: invalid UTF-8 decodes 1:1, never fails") {
    val p = Array[Byte]('c', 'a', 'f', 0xE9.toByte, '!', 0x80.toByte)
    val r = detect(p)
    assert(r._1 === "latin-1" && !r._2 && !r._3)
    assert(r._4 === "café!")
  }

  test("strict RFC 3629: overlong, surrogates, >U+10FFFF, continuation shapes fall back") {
    val traps = Seq(
      Array[Byte](0xC0.toByte, 0xAF.toByte), // overlong '/'
      Array[Byte](0xE0.toByte, 0x80.toByte, 0xAF.toByte), // overlong 3-byte
      Array[Byte](0xED.toByte, 0xA0.toByte, 0x80.toByte), // surrogate U+D800
      Array[Byte](0xF4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte), // > U+10FFFF
      Array[Byte](0xF0.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte), // overlong 4-byte
      Array[Byte](0x80.toByte), // bare continuation
      Array[Byte](0xC3.toByte), // truncated 2-byte
      Array[Byte]('a', 0xE4.toByte, 0xB8.toByte)) // truncated 3-byte
    for (t <- traps) {
      val r = detect(t)
      assert(r._1 === "latin-1", s"${t.toSeq}: must not validate as utf-8")
    }
    // the valid boundary shapes DO validate
    for (ok <- Seq("߿", "ࠀ", "퟿", "", "�",
        new String(Character.toChars(0x10FFFF))))
      assert(detect(ok.getBytes("UTF-8"))._1 === "utf-8", s"U+${ok.codePointAt(0)}")
  }

  test("a UTF-8 BOM followed by invalid bytes falls back honestly") {
    val p = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte, 0xC0.toByte, 0x20)
    val r = detect(p)
    assert(r._1 === "latin-1" && !r._2 && !r._3)
    assert(r._4.length === p.length, "fallback decodes ALL bytes incl. the BOM")
  }

  test("garbage never throws; output always produced") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val g = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(g)
      val r = CharsetDetectKernel.detect(g)
      assert(r != null, "the fallback means detect never nulls on sane sizes")
    }
  }
}
