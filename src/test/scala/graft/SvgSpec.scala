package graft

import org.apache.spark.unsafe.types.UTF8String
import graft.expressions.{SvgMetaKernel, SvgSynthKernel}

class SvgSpec extends SparkSpec {

  private def parse(s: String) =
    SvgMetaKernel.parse(UTF8String.fromString(s))

  test("synth round trips: every lane parses to its closed form") {
    for (d <- 1L to 120L if d % 10 != 0) {
      val text = s"Doc $d prefix words enough here"
      val r = parse(SvgSynthKernel.synth(d, text))
      assert(r != null, s"d=$d")
      val w0 = 100 + d % 400
      val h = 50 + d % 300
      if (d % 3 == 2) assert(r.isNullAt(0) && r.isNullAt(1), s"d=$d: absent wh")
      else {
        val expW = w0 + (if (d % 8 == 5) 0.5 else 0.0)
        assert(r.getDouble(0) === expW, s"d=$d: width")
        assert(r.getDouble(1) === h.toDouble, s"d=$d: height")
      }
      assert(r.getDouble(2) === w0.toDouble && r.getDouble(3) === h.toDouble,
        s"d=$d: viewBox")
      val expShapes = d % 4 + (d + 1) % 3 + (if (d % 2 == 0) 1 else 0)
      assert(r.getLong(4) === expShapes, s"d=$d: shapes")
      assert(r.getLong(5) === 1L && r.getLong(6) === d % 3, s"d=$d: g/text")
      assert(r.getBoolean(7) === (d % 7 == 3), s"d=$d: script")
      if (d % 4 == 0) assert(r.isNullAt(8), s"d=$d: no title")
      else {
        val snip = text.substring(0, math.min(20, text.length))
        assert(r.getUTF8String(8).toString === s"Icon & art $d $snip",
          s"d=$d: title")
      }
    }
  }

  test("hand vectors: units, boundaries, doctype, relative sizes") {
    // % is relative → null dims; viewBox with commas still parses
    val r1 = parse("""<svg width="100%" height="50%" viewBox="0,0,24,16"><path d="M0 0"/></svg>""")
    assert(r1 != null && r1.isNullAt(0) && r1.isNullAt(1))
    assert(r1.getDouble(2) === 24.0 && r1.getDouble(3) === 16.0)
    assert(r1.getLong(4) === 1L)
    // unit suffixes strip; DOCTYPE + declaration + comment all skip
    val r2 = parse("<?xml version=\"1.0\"?>\n" +
      "<!DOCTYPE svg PUBLIC \"-//W3C//DTD SVG 1.1//EN\" \"x\">\n" +
      "<!-- hi -->\n<svg width=\"2.5em\" height=\"12pt\"></svg>")
    assert(r2 != null && r2.getDouble(0) === 2.5 && r2.getDouble(1) === 12.0)
    // boundary: <pathological-elem/> and <linearGradient> count as
    // nothing; <glyph> is not <g>; data-width= is not width=
    val r3 = parse("""<svg data-width="9"><pathological-elem/>""" +
      """<linearGradient/><glyph/><line x1="0"/></svg>""")
    assert(r3 != null && r3.isNullAt(0))
    assert(r3.getLong(4) === 1L, "only the <line> counts")
    assert(r3.getLong(5) === 0L, "no groups")
    // script detection and title entity decode
    val r4 = parse("<svg><title>a &amp; b &#33;</title>" +
      "<script>alert(1)</script></svg>")
    assert(r4.getBoolean(7) === true)
    assert(r4.getUTF8String(8).toString === "a & b !")
    // non-SVG refusals: prose, other XML roots, <svgfoo>
    assert(parse("plain prose, no markup") == null)
    assert(parse("<html><body>x</body></html>") == null)
    assert(parse("<svgfoo></svgfoo>") == null)
    assert(parse("<?xml version=\"1.0\"?><rss/>") == null)
    // never-throw sweep: truncations of a full doc
    val full = SvgSynthKernel.synth(17L, "text " * 10)
    for (cut <- 0 until full.length) parse(full.substring(0, cut))
  }

  test("driver-row shape over the docs synth") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("mm_svg_meta")(spark, sfDir)
      .where(col("doc_id") < 50).collect()
    assert(rows.nonEmpty)
    assert(rows.filter(!_.getBoolean(1)).forall(_.isNullAt(6)),
      "invalid docs keep null counts")
  }
}
