package graft

import graft.expressions.{AvifMetaKernel, AvifSynthKernel}

class AvifSpec extends SparkSpec {

  test("synth round trips: every lane parses to its closed form") {
    for (d <- 1L to 120L if d % 10 != 0) {
      val r = AvifMetaKernel.parse(AvifSynthKernel.synth(d))
      assert(r != null, s"d=$d")
      assert(r.getUTF8String(0).toString ===
        (if (d % 2 == 0) "avif" else "heic"), s"d=$d: brand")
      assert(r.getLong(1) === 64 + d % 512, s"d=$d: width")
      assert(r.getLong(2) === 48 + d % 256, s"d=$d: height")
      assert(r.getLong(3) === 1 + d % 3, s"d=$d: n_items")
      assert(r.getUTF8String(4).toString ===
        (if (d % 2 == 0) "av01" else "hvc1"), s"d=$d: primary")
      assert(r.getBoolean(5) === (d % 3 >= 1), s"d=$d: alpha")
      assert(r.getBoolean(6) === (d % 3 == 2), s"d=$d: exif")
      assert(r.getLong(7) === 100 + d % 900,
        s"d=$d: mdat (largesize lane at d%20==9)")
      // byte-length closed form (the triage-oracle anchor)
      val expLen = 233 + 21 * (1 + d % 3) +
        (if (d % 3 >= 1) 17 else 0) + d % 900 +
        (if (d % 20 == 9) 16 else 8)
      assert(AvifSynthKernel.synth(d).length.toLong === expLen,
        s"d=$d: container length")
    }
  }

  test("refusals and never-throw: non-HEIF, truncation, bit flips") {
    import graft.expressions.AvifMetaKernel.{parse => p}
    assert(p("not a container at all".getBytes) == null)
    assert(p(Array[Byte](0, 0, 0, 8, 'f', 'r', 'e', 'e')) == null,
      "BMFF but not ftyp-first")
    // mp4 brand refuses (this is the image walk, not the video one)
    val mp4ish = {
      val b = AvifSynthKernel.synth(2L)
      val c = b.clone()
      System.arraycopy("isom".getBytes, 0, c, 8, 4)
      c
    }
    assert(p(mp4ish) == null, "isom brand routes to mp4, not heif")
    for (seed <- Seq(9L, 12L, 29L)) { // 29: largesize lane
      val full = AvifSynthKernel.synth(seed)
      for (cut <- 0 until full.length)
        p(java.util.Arrays.copyOf(full, cut))
      val rnd = new scala.util.Random(5 + seed)
      for (_ <- 0 until 300) {
        val g = full.clone()
        g(rnd.nextInt(g.length)) =
          (g(rnd.nextInt(g.length)) ^ (1 << rnd.nextInt(8))).toByte
        p(g)
      }
    }
  }

  test("driver-row shape over the docs synth") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("mm_avif_meta")(spark, sfDir)
      .where(col("doc_id") < 50).collect()
    assert(rows.nonEmpty)
    assert(rows.filter(_.getBoolean(1)).forall(r => r.getLong(3) >= 64),
      "valid docs carry real dimensions")
  }
}
