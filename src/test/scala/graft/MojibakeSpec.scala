package graft

import org.apache.spark.unsafe.types.UTF8String
import graft.expressions.{MojibakeKernel, MojibakeSynthKernel}

class MojibakeSpec extends SparkSpec {

  private def fix(s: String): (String, Boolean, Long) = {
    val r = MojibakeKernel.repair(UTF8String.fromString(s))
    (r.getUTF8String(0).toString, r.getBoolean(1), r.getLong(2))
  }

  test("synth round trips: every lane repairs to its closed form") {
    for (d <- 1L to 100L) {
      val text = s"Doc $d prefix text that is long enough for forty chars"
      val planted = MojibakeSynthKernel.synth(d, text)
      val (fixed, had, depth) = fix(planted)
      val prefix = text.substring(0, math.min(40, text.length))
      val expPayload = (d % 5) match {
        case 0 => s"plain $d"
        case 1 => s"café é $d"
        case 2 => s"café $d"
        case 3 => s"é $d"
        case _ => s"€ ’ ™ $d"
      }
      assert(fixed === prefix + " | " + expPayload, s"d=$d (lane ${d % 5})")
      assert(had === (d % 5 >= 2), s"d=$d: had_mojibake")
      val expDepth = (d % 5) match {
        case 0 | 1 => 0L
        case 3 => 2L
        case _ => 1L
      }
      assert(depth === expDepth, s"d=$d: depth")
    }
  }

  test("hand vectors: classic damage repairs, clean text never changes") {
    // cafÃ© → café (the canonical single-step case)
    assert(fix("cafÃ©")._1 === "café")
    // donâ€™t → don’t (a cp1252-special: 0x99 = ™ must map back)
    assert(fix("donâ€™t")._1 === "don’t")
    // round trips through the forward-damage helper, incl. the
    // U+009D control char Java's cp1252 maps the undefined 0x9D to
    // (the right-double-quote → â€<0x9D> case)
    for (clean <- Seq("Â nbsp damage",
        "“both” smart quotes",
        "é ü ñ € ™ mixed")) {
      val (f, had, depth) = fix(MojibakeKernel.mojibake(clean))
      assert(f === clean && had && depth === 1L, s"round trip '$clean'")
    }
    // the no-false-positive battery: legit text is untouched
    for (clean <- Seq("plain ascii only", "café",
        "naïve résumé déjà vu",
        "André's Über-straße",
        "ñ and ü alone", "price € 10",
        "日本語テキスト",
        "mixed 中文 and ascii",
        "emoji 😀 text")) {
      val (f, had, depth) = fix(clean)
      assert(f === clean, s"'$clean' must not change")
      assert(!had && depth === 0L, s"'$clean' flags")
    }
    // triple mojibake hits the depth cap and still lands clean
    val m3 = MojibakeKernel.mojibake(
      MojibakeKernel.mojibake(MojibakeKernel.mojibake("é end")))
    val (f3, _, d3) = fix(m3)
    assert(f3 === "é end" && d3 === 3L, "triple repairs at the cap")
    // never-throw sweep over adversarial code points
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 500) {
      val s = new String(Array.fill(20)(rnd.nextInt(0x300).toChar))
      MojibakeKernel.repair(UTF8String.fromString(s))
    }
  }

  test("driver-row shape: repair over the docs synth") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("text_mojibake")(spark, sfDir)
      .where(col("doc_id") < 50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lane = r.getLong(0) % 5
      assert(r.getBoolean(1) === (lane >= 2), s"doc ${r.getLong(0)}")
      assert(!r.getString(3).contains("Ã"),
        "no residual mojibake marker")
    }
  }
}
