package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.functions._

import graft.expressions.{JpegDecodeKernel, JpegEncoder}
import graft.multimodal.Binary

/** Baseline-JPEG decode kernel: the synth encoder's flat-tile streams
  * must round-trip EXACTLY (DC-only blocks survive any conforming
  * IDCT bit-for-bit), ImageIO must accept our encoder's output as a
  * legal JPEG, our decoder must agree with ImageIO sample-for-sample
  * on real full-AC streams (the libjpeg integer-arithmetic claim),
  * and every unsupported/corrupt shape must null, never throw.
  */
class JpegPixelsSpec extends SparkSpec {
  import spark.implicits._

  /** The decoder's fixed-point YCbCr→RGB (libjpeg constants) — the
    * spec-side mirror used to compute expected flat-tile stats.
    */
  private def yccToRgb(y: Int, cb0: Int, cr0: Int): (Int, Int, Int) = {
    val cb = cb0 - 128; val cr = cr0 - 128
    def cl(v: Int) = math.max(0, math.min(255, v))
    (cl(y + ((91881 * cr + 32768) >> 16)),
      cl(y + ((-22554 * cb - 46802 * cr + 32768) >> 16)),
      cl(y + ((116130 * cb + 32768) >> 16)))
  }

  test("flat-tile synth round-trips exactly: gray, 4:4:4, 4:2:0, restart markers") {
    // every (mode, ri) combination, incl. multi-tile grids where DC
    // prediction and restart-interval resets both fire
    for (mode <- 0 to 2; ri <- Seq(0, 2); tw <- Seq(1, 3); th <- Seq(1, 2)) {
      val n = tw * th
      val tiles =
        if (mode == 0) Array.tabulate(n)(t => (7 * t * t + 31) % 256)
        else Array.tabulate(3 * n) { i =>
          val t = i / 3
          i % 3 match {
            case 0 => (7 * t + 31) % 256
            case 1 => (5 * t + 99) % 256
            case _ => (3 * t + 180) % 256
          }
        }
      val bytes = JpegEncoder.encodeFlatTiles(tiles, tw, th, mode, ri)
      val st = JpegDecodeKernel.stats(bytes)
      assert(st != null, s"mode=$mode ri=$ri ${tw}x$th: decode failed")
      val side = if (mode == 2) 16 else 8
      val area = side * side
      if (mode == 2 && n > 1) {
        // multi-tile 4:2:0: fancy upsampling (r14) blends chroma
        // across tile boundaries, so flat-tile arithmetic no longer
        // predicts the edges — the ground truth is the INDEPENDENT
        // decoder: our samples must equal ImageIO's (the JDK's
        // libjpeg) pixel for pixel
        val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        assert(ref != null)
        val dec = JpegDecodeKernel.decodePixels(bytes)
        assert(dec != null)
        val (dw, dh, ours) = dec
        assert(dw === ref.getWidth && dh === ref.getHeight)
        var (xr, xg, xb, xp) = (0L, 0L, 0L, 0L)
        for (y <- 0 until dh; x <- 0 until dw) {
          val theirs = ref.getRGB(x, y) & 0xFFFFFF
          assert(ours(y * dw + x) === theirs,
            s"mode=2 ri=$ri ${tw}x$th ($x,$y): " +
              s"0x${ours(y * dw + x).toHexString} != 0x${theirs.toHexString}")
          xr += (theirs >> 16) & 0xFF; xg += (theirs >> 8) & 0xFF
          xb += theirs & 0xFF
          xp = math.max(xp, math.max((theirs >> 16) & 0xFF,
            math.max((theirs >> 8) & 0xFF, theirs & 0xFF)).toLong)
        }
        val got = st.toLongArray()
        assert(got(1) === xr && got(2) === xg && got(3) === xb && got(4) === xp,
          s"mode=2 ri=$ri ${tw}x$th: stats disagree with the per-pixel decode")
      } else locally {
      var (sr, sg, sb, peak) = (0L, 0L, 0L, 0L)
      for (t <- 0 until n) {
        val (r, g, b) =
          if (mode == 0) { val v = tiles(t); (v, v, v) }
          else yccToRgb(tiles(3 * t), tiles(3 * t + 1), tiles(3 * t + 2))
        sr += r.toLong * area; sg += g.toLong * area; sb += b.toLong * area
        peak = math.max(peak, math.max(r, math.max(g, b)).toLong)
      }
      val got = st.toLongArray()
      assert(got(0) === (n * area).toLong, s"mode=$mode ri=$ri: n_pixels")
      assert(got(1) === sr && got(2) === sg && got(3) === sb,
        s"mode=$mode ri=$ri ${tw}x$th: sums ${got.mkString(",")} != $sr,$sg,$sb")
      assert(got(4) === peak, s"mode=$mode ri=$ri: peak")
      }
    }
  }

  test("ImageIO accepts our encoder's streams and decodes the same pixels") {
    // legality proof: an independent decoder (the JDK's libjpeg) reads
    // our 4:4:4 color bytes and lands on the identical flat values
    val tiles = Array(40, 100, 200, 200, 60, 128, 128, 128, 128)
    val bytes = JpegEncoder.encodeFlatTiles(tiles, 3, 1, 1, 0)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected our baseline JPEG")
    assert(img.getWidth === 24 && img.getHeight === 8)
    val dec = JpegDecodeKernel.decodePixels(bytes)
    assert(dec != null)
    val (w, h, ours) = dec
    for (y <- 0 until h; x <- 0 until w) {
      val theirs = img.getRGB(x, y) & 0xFFFFFF
      assert(ours(y * w + x) === theirs,
        s"($x,$y): ours=0x${ours(y * w + x).toHexString} imageio=0x${theirs.toHexString}")
    }
    // and the 4:2:0 lane: flat 16x16 tiles make every upsampler agree
    val t420 = Array(90, 77, 201)
    val b420 = JpegEncoder.encodeFlatTiles(t420, 1, 1, 2, 0)
    val i420 = ImageIO.read(new java.io.ByteArrayInputStream(b420))
    assert(i420 != null && i420.getWidth === 16 && i420.getHeight === 16)
    val (r0, g0, b0) = yccToRgb(90, 77, 201)
    val exp = (r0 << 16) | (g0 << 8) | b0
    for (y <- 0 until 16; x <- 0 until 16)
      assert((i420.getRGB(x, y) & 0xFFFFFF) === exp, s"4:2:0 flat ($x,$y)")
    val d420 = JpegDecodeKernel.decodePixels(b420)
    assert(d420 != null && d420._3.forall(_ === exp))
  }

  test("full-AC conformance: our decoder matches ImageIO sample-for-sample on a real gradient") {
    // grayscale sidesteps subsampling and color-convert variation: a
    // real quantized full-AC scan where the libjpeg-conformant islow
    // IDCT must agree with the JDK's decoder on every sample,
    // including edge MCUs (37x23 is not a multiple of 8)
    val (w, h) = (37, 23)
    val src = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 7 + y * 13) % 256)
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.8f)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(src, null, null), param)
    ios.close(); writer.dispose()
    val bytes = out.toByteArray

    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val dec = JpegDecodeKernel.decodePixels(bytes)
    assert(dec != null, "decoder rejected ImageIO's baseline grayscale stream")
    val (dw, dh, ours) = dec
    assert(dw === w && dh === h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val theirs = ref.getRaster.getSample(x, y, 0)
      val mine = ours(y * w + x) & 0xFF
      maxDiff = math.max(maxDiff, math.abs(mine - theirs))
    }
    assert(maxDiff === 0,
      s"islow IDCT must be sample-exact vs the JDK decoder; max |diff| = $maxDiff")
  }

  test("unsupported and corrupt shapes null, never throw") {
    val good = JpegEncoder.encodeFlatTiles(Array(100), 1, 1, 0, 0)
    assert(JpegDecodeKernel.stats(good) != null)
    // truncated mid-scan and mid-header
    assert(JpegDecodeKernel.stats(good.take(good.length - 6)) == null)
    assert(JpegDecodeKernel.stats(good.take(20)) == null)
    // corrupt entropy data (flip bits in the scan)
    val bad = good.clone()
    bad(good.length - 4) = 0x55
    // a flipped bit may still decode to SOME stats, but must not throw
    JpegDecodeKernel.stats(bad)
    // progressive streams DECODE as of r13 (SOF2 routes to the
    // progressive decoder) — a truncated one still nulls
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_GRAY)
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val progBytes = out.toByteArray
    assert(JpegDecodeKernel.stats(progBytes) != null,
      "a well-formed progressive stream must decode (r13)")
    assert(JpegDecodeKernel.stats(progBytes.take(progBytes.length - 8)) == null,
      "a truncated progressive stream must null, never throw")
    // non-JPEG
    assert(JpegDecodeKernel.stats("plain text".getBytes) == null)
    assert(JpegDecodeKernel.stats(Array[Byte]()) == null)
  }

  test("progressive conformance: SOF2 decode matches ImageIO sample-for-sample (r13)") {
    // the JDK writer's progressive scan script is the jcparam-style
    // one: spectral selection AND successive approximation — this
    // exercises DC first/refine and AC first/refine with EOB runs.
    // Grayscale sidesteps subsampling/color-convert variation, so the
    // reconstructed coefficients (lossless entropy) plus the already-
    // conformant islow IDCT must agree with the JDK decoder EXACTLY.
    val (w, h) = (37, 23) // edge MCUs: not a multiple of 8
    val src = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 7 + y * 13) % 256)
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.8f)
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(src, null, null), param)
    ios.close(); writer.dispose()
    val bytes = out.toByteArray
    assert(JpegDecodeKernel.sofMarker(bytes) === 0xC2, "writer must emit SOF2")
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val dec = JpegDecodeKernel.decodePixels(bytes)
    assert(dec != null, "decoder rejected ImageIO's progressive stream")
    val (dw, dh, ours) = dec
    assert(dw === w && dh === h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val theirs = ref.getRaster.getSample(x, y, 0)
      val mine = ours(y * w + x) & 0xFF
      maxDiff = math.max(maxDiff, math.abs(mine - theirs))
    }
    assert(maxDiff === 0,
      s"progressive decode must be sample-exact vs the JDK decoder; max |diff| = $maxDiff")
  }

  test("progressive ≡ baseline on flat tiles: the synth's SOF2 lane round-trips exactly") {
    // the flat-tile synth now has a progressive lane (spectral
    // selection + DC successive approximation); the coefficients are
    // identical to the baseline encode, so the decoded stats must be
    // BIT-identical — which is what keeps the mm_jpeg_pixels oracle
    // closed-form with zero changes
    for (mode <- 0 to 2) {
      val vals = if (mode == 0) 1 else 3
      val tiles = Array.tabulate(6 * vals)(i => (37 + i * 41) % 256)
      val base = JpegEncoder.encodeFlatTiles(tiles, 3, 2, mode, 0)
      val prog = JpegEncoder.encodeFlatTiles(tiles, 3, 2, mode, 0,
        progressive = true)
      assert(JpegDecodeKernel.sofMarker(base) === 0xC0)
      assert(JpegDecodeKernel.sofMarker(prog) === 0xC2)
      val sb = JpegDecodeKernel.stats(base)
      val sp = JpegDecodeKernel.stats(prog)
      assert(sb != null && sp != null, s"mode $mode lane rejected")
      assert((0 until 5).forall(i => sb.getLong(i) === sp.getLong(i)),
        s"mode $mode: progressive stats must equal baseline: " +
          s"${(0 until 5).map(sb.getLong)} vs ${(0 until 5).map(sp.getLong)}")
      // and ImageIO agrees with both (the independent referee)
      val ib = ImageIO.read(new java.io.ByteArrayInputStream(base))
      val ip = ImageIO.read(new java.io.ByteArrayInputStream(prog))
      assert(ib != null && ip != null, s"mode $mode: ImageIO rejected a lane")
      for (y <- 0 until ib.getHeight; x <- 0 until ib.getWidth)
        assert(ib.getRGB(x, y) === ip.getRGB(x, y),
          s"mode $mode: ImageIO sees different pixels at ($x,$y)")
    }
  }

  /** Spec-side mirror of libjpeg h2v2 fancy upsampling for a chroma
    * plane given as a sample accessor — the same closed form the
    * DuckDB oracle encodes, validated here against the kernel.
    */
  private def fancy420(x: Int, y: Int, cW: Int, cH: Int,
      c: (Int, Int) => Int): Int = {
    val cyN = math.min(y >> 1, cH - 1)
    var cyF = if ((y & 1) == 0) cyN - 1 else cyN + 1
    if (cyF < 0) cyF = 0
    if (cyF > cH - 1) cyF = cH - 1
    def colsum(k: Int) = 3 * c(k, cyN) + c(k, cyF)
    val k = x >> 1
    if (cW == 1) {
      if ((x & 1) == 0) (colsum(0) * 4 + 8) >> 4 else (colsum(0) * 4 + 7) >> 4
    } else if (x == 0) (colsum(0) * 4 + 8) >> 4
    else if ((x & 1) == 0) (colsum(k) * 3 + colsum(k - 1) + 8) >> 4
    else if (k == cW - 1) (colsum(k) * 4 + 7) >> 4
    else (colsum(k) * 3 + colsum(k + 1) + 7) >> 4
  }

  test("driver-row shape: synthPixelsFromDocs → pixelStats matches spec-side recompute") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(60)
    val media = Binary.Jpeg.synthPixelsFromDocs(docs)
    val rows = Binary.Jpeg.pixelStats(media)
      .select("doc_id", "jpeg_valid", "pixels_decoded", "mean_r", "mean_g",
        "mean_b", "peak_byte")
      .collect()
    assert(rows.length === 60)
    var validSeen = 0
    for (r <- rows) {
      val d = r.getAs[Long]("doc_id")
      if (d % 10 == 0) {
        assert(!r.getAs[Boolean]("jpeg_valid"), s"doc $d: invalid lane")
        assert(r.isNullAt(r.fieldIndex("pixels_decoded")))
      } else {
        validSeen += 1
        assert(r.getAs[Boolean]("jpeg_valid"), s"doc $d: valid lane rejected")
        val mode = (d % 3).toInt
        val tw = (2 + d % 3).toInt
        val th = (1 + (d / 3) % 2).toInt
        val side = if (mode == 2) 16 else 8
        val n = tw * th
        val area = side * side
        var (sr, sg, sb, peak) = (0L, 0L, 0L, 0L)
        if (mode == 2) {
          // fancy upsampling (r14): chroma blends across tile
          // boundaries — recompute per PIXEL with the h2v2 mirror
          val cW = 8 * tw; val cH = 8 * th
          def cbAt(cx: Int, cy: Int) =
            ((5 * d + 11 * ((cy / 8) * tw + cx / 8)) % 256).toInt
          def crAt(cx: Int, cy: Int) =
            ((3 * d + 17 * ((cy / 8) * tw + cx / 8)) % 256).toInt
          for (y <- 0 until 16 * th; x <- 0 until 16 * tw) {
            val yv = ((7 * d + 13 * ((y / 16) * tw + x / 16)) % 256).toInt
            val (rr, gg, bb) = yccToRgb(yv,
              fancy420(x, y, cW, cH, cbAt), fancy420(x, y, cW, cH, crAt))
            sr += rr; sg += gg; sb += bb
            peak = math.max(peak, math.max(rr, math.max(gg, bb)).toLong)
          }
        } else {
          for (t <- 0 until n) {
            val yv = ((7 * d + 13 * t) % 256).toInt
            val cb = ((5 * d + 11 * t) % 256).toInt
            val cr = ((3 * d + 17 * t) % 256).toInt
            val (rr, gg, bb) =
              if (mode == 0) (yv, yv, yv) else yccToRgb(yv, cb, cr)
            sr += rr.toLong * area; sg += gg.toLong * area; sb += bb.toLong * area
            peak = math.max(peak, math.max(rr, math.max(gg, bb)).toLong)
          }
        }
        val np = (n * area).toLong
        assert(r.getAs[Long]("pixels_decoded") === np, s"doc $d n_pixels")
        assert(r.getAs[Double]("mean_r") === sr.toDouble / np, s"doc $d mean_r")
        assert(r.getAs[Double]("mean_g") === sg.toDouble / np, s"doc $d mean_g")
        assert(r.getAs[Double]("mean_b") === sb.toDouble / np, s"doc $d mean_b")
        assert(r.getAs[Long]("peak_byte") === peak, s"doc $d peak")
      }
    }
    assert(validSeen > 40)
  }

  test("decode plan is a pure codegen projection: no UDF, no shuffle") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(20)
    val plan = Binary.Jpeg.pixelStats(Binary.Jpeg.synthPixelsFromDocs(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }
}
