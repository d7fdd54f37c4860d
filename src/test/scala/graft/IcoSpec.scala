package graft

import org.apache.spark.sql.functions._

import graft.expressions.{IcoMetaKernel, IcoSynthKernel}

/** ICO container + pixel tier (family twenty): synth round trips
  * over the lane grid, PNG-entry conformance against ImageIO's own
  * PNG writer embedded in a hand-assembled container (no independent
  * ICO writer exists on the classpath — the documented posture; the
  * PNG and DIB payload decoders are the conformance surface), the
  * 0-means-256 rule, structural traps, and never-throw sweeps.
  */
class IcoSpec extends SparkSpec {

  test("ico synth round trips: every lane parses to its closed form") {
    for (d <- 1L to 200L if d % 10 != 0) {
      val row = IcoMetaKernel.parse(IcoSynthKernel.synth(d))
      assert(row != null, s"d=$d: null")
      assert(row.getBoolean(0), s"d=$d: ico_valid")
      val ni = (1 + d % 3).toInt
      assert(row.getLong(1) === ni.toLong, s"d=$d: n_icons")
      val kinds = (0 until ni).map(i => (d + i) % 3)
      assert(row.getLong(2) === kinds.count(_ == 2).toLong, s"d=$d: png")
      assert(row.getLong(3) === kinds.count(_ != 2).toLong, s"d=$d: dib")
      val declW = (0 until ni).map(i =>
        (if (d % 20 == 11 && i == 0) 5 else 4) + (d + i) % 5)
      val hs = (0 until ni).map(i => 3 + (d + i) % 4)
      assert(row.getLong(4) === declW.max, s"d=$d: max_width")
      assert(row.getLong(5) === hs.max, s"d=$d: max_height")
      assert(row.getBoolean(6), s"d=$d: entries_ok")
      assert(row.getLong(7) === ni.toLong, s"d=$d: n_decoded")
      var sum = 0L
      for (i <- 0 until ni) {
        val w = 4 + (d + i) % 5
        val h = 3 + (d + i) % 4
        for (k <- 0L until 3 * w * h) sum += (5 * d + 17 * i + k) % 256
      }
      assert(row.getLong(8) === sum,
        s"d=$d: pixel sum across DIB-24/DIB-32/real-PNG entries")
      assert(row.getBoolean(9) === (d % 20 != 11), s"d=$d: dims_match")
    }
  }

  test("PNG-entry conformance: ImageIO's own PNG inside a hand-assembled ICO decodes sum-exact") {
    val w = 11
    val h = 7
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var expected = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 31 + y * 7) % 256
      val g = (x * 13 + y * 3) % 256
      val b = (x * 5 + y * 11) % 256
      expected += r + g + b
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val pngOut = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", pngOut))
    val png = pngOut.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0, 0, 1, 0, 1, 0), 0, 6)
    out.write(w); out.write(h); out.write(0); out.write(0)
    out.write(1); out.write(0); out.write(24); out.write(0)
    for (k <- 0 until 4) out.write((png.length >> (8 * k)) & 0xFF)
    for (k <- 0 until 4) out.write((22 >> (8 * k)) & 0xFF)
    out.write(png, 0, png.length)
    val row = IcoMetaKernel.parse(out.toByteArray)
    assert(row != null && row.getBoolean(0))
    assert(row.getLong(2) === 1L, "PNG entry routed")
    assert(row.getLong(7) === 1L, "ImageIO's PNG decoded through the shared zlib+unfilter path")
    assert(row.getLong(8) === expected, "RGB sum exact vs the BufferedImage")
    assert(row.getBoolean(9), "dims agree")
  }

  test("0-means-256 rule, cursor refusal, structural traps, never-throw") {
    // a directory entry with 0 width/height bytes declares 256×256;
    // the tiny DIB behind it then disagrees → dims_match false
    val base = IcoSynthKernel.synth(1L)
    val zeroed = base.clone()
    zeroed(6) = 0 // entry 0 width byte
    zeroed(7) = 0 // entry 0 height byte
    val zrow = IcoMetaKernel.parse(zeroed)
    assert(zrow.getLong(4) === 256L && zrow.getLong(5) === 256L,
      "0 means 256")
    assert(!zrow.getBoolean(9), "decoded dims disagree with 256")
    // type 2 (cursor) is not an icon stream
    val cur = base.clone()
    cur(2) = 2
    assert(IcoMetaKernel.parse(cur) == null, "cursor refused")
    // out-of-bounds image offset flags entries_ok
    val oob = base.clone()
    oob(18) = ((oob(18) & 0xFF) ^ 0x40).toByte // offset low byte
    val orow = IcoMetaKernel.parse(oob)
    if (orow != null) assert(!orow.getBoolean(6) || orow.getLong(7) < orow.getLong(1))
    // truncation + garbage sweeps
    for (cut <- 0 until base.length)
      IcoMetaKernel.parse(java.util.Arrays.copyOf(base, cut))
    val rnd = new scala.util.Random(29)
    for (_ <- 0 until 300) {
      val g = new Array[Byte](22 + rnd.nextInt(300))
      rnd.nextBytes(g)
      g(0) = 0; g(1) = 0; g(2) = 1; g(3) = 0
      IcoMetaKernel.parse(g)
    }
  }

  test("driver-row shape: Binary.Ico over the docs synth") {
    import graft.multimodal.Binary
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 40)
    val rows = Binary.Ico.parse(Binary.Ico.synthFromDocs(docs))
      .select("doc_id", "ico_valid", "n_icons", "pixel_sum").collect()
    assert(rows.length === 40)
    rows.foreach { r =>
      val d = r.getLong(0)
      if (d % 10 == 0) assert(!r.getBoolean(1), s"d=$d text lane")
      else {
        assert(r.getBoolean(1) && r.getLong(2) === 1 + d % 3, s"d=$d")
        assert(!r.isNullAt(3), s"d=$d decoded")
      }
    }
  }
}
