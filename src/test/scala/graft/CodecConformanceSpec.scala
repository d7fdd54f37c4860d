package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._

import graft.multimodal.Binary

/** Real-encoder conformance fixtures (r11 verdict item #4): every
  * prior multimodal proof decoded `synthFromDocs` payloads whose
  * generator shares layout assumptions with the parser. Here the
  * payloads come from the JDK's STANDARD encoders — ImageIO's PNG/
  * BMP/JPEG writers and javax.sound's WAV writer, independent
  * codebases that share nothing with graft — and the parsers must
  * recover the metadata fields and the pixel/sample statistics
  * EXACTLY from pixels/samples this spec planted.
  */
class CodecConformanceSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic RGB test raster (planted, so expected stats are
    * recomputable from the source pixels, not from any decoder).
    */
  private def plantRgb(w: Int, h: Int, imgType: Int): BufferedImage = {
    val img = new BufferedImage(w, h, imgType)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 17 + y * 5) % 256
      val g = (255 - x * 3 + y) % 256
      val b = (x * y + 31) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def channelSums(img: BufferedImage): (Long, Long, Long, Long) = {
    var (sr, sg, sb, peak) = (0L, 0L, 0L, 0L)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      val (r, g, b) = ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
      sr += r; sg += g; sb += b
      peak = math.max(peak, math.max(r, math.max(g, b)).toLong)
    }
    (sr, sg, sb, peak)
  }

  test("PNG from ImageIO (independent encoder): meta and pixel stats field-exact") {
    // two sizes, both small enough for the writer's single-IDAT output
    for ((w, h) <- Seq((16, 9), (31, 23))) {
      val img = plantRgb(w, h, BufferedImage.TYPE_INT_RGB)
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", out), "JDK PNG writer unavailable")
      val df = Seq((1L, out.toByteArray)).toDF("doc_id", "payload")
      val row = Binary.PngPixels.pixelStats(df).head()
      def f[T](n: String): T = row.getAs[T](n)
      assert(f[Boolean]("png_valid") && f[Boolean]("ihdr_crc_ok") &&
        f[Boolean]("header_consistent"), s"PNG ${w}x$h header rejected: $row")
      assert(f[Long]("width") === w.toLong && f[Long]("height") === h.toLong)
      assert(f[Long]("color_type") === 2L && f[Long]("bit_depth") === 8L &&
        f[Long]("interlace") === 0L)
      val n = (w * h).toLong
      val (sr, sg, sb, peak) = channelSums(img)
      assert(f[Long]("pixels_decoded") === n,
        s"PNG ${w}x$h: adaptive-filtered IDAT must fully decode")
      assert(f[Double]("mean_r") === sr.toDouble / n)
      assert(f[Double]("mean_g") === sg.toDouble / n)
      assert(f[Double]("mean_b") === sb.toDouble / n)
      assert(f[Long]("peak_byte") === peak)
    }
  }

  test("Adam7 interlaced PNG from ImageIO: channel stats field-exact (r13)") {
    // the JDK writer's progressive mode IS Adam7; (3,2) leaves four
    // of the seven passes empty — the degenerate-pass lane
    for ((w, h) <- Seq((16, 9), (13, 7), (3, 2))) {
      val img = plantRgb(w, h, BufferedImage.TYPE_INT_RGB)
      val writer = ImageIO.getImageWritersByFormatName("png").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val df = Seq((1L, out.toByteArray)).toDF("doc_id", "payload")
      val row = Binary.PngPixels.pixelStats(df).head()
      def f[T](n: String): T = row.getAs[T](n)
      assert(f[Boolean]("png_valid"), s"interlaced PNG ${w}x$h rejected: $row")
      assert(f[Long]("interlace") === 1L, "writer must have emitted Adam7")
      val n = (w * h).toLong
      val (sr, sg, sb, peak) = channelSums(img)
      assert(f[Long]("pixels_decoded") === n,
        s"interlaced ${w}x$h: all seven passes must unfilter " +
          s"(pre-r13 this lane nulled): $row")
      assert(f[Double]("mean_r") === sr.toDouble / n)
      assert(f[Double]("mean_g") === sg.toDouble / n)
      assert(f[Double]("mean_b") === sb.toDouble / n)
      assert(f[Long]("peak_byte") === peak)
    }
  }

  test("GIF from ImageIO (independent encoder): screen descriptor field-exact") {
    for ((w, h) <- Seq((13, 7), (40, 25))) {
      val img = plantRgb(w, h, BufferedImage.TYPE_INT_RGB)
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "gif", out), "JDK GIF writer unavailable")
      val df = Seq((1L, out.toByteArray)).toDF("doc_id", "payload")
      val row = Binary.Gif.parse(df).head()
      def f[T](n: String): T = row.getAs[T](n)
      assert(f[Boolean]("gif_valid"), s"GIF ${w}x$h rejected: $row")
      assert(f[String]("version") === "89a", "ImageIO writes GIF89a")
      assert(f[Long]("width") === w.toLong && f[Long]("height") === h.toLong)
      // the quantized palette rides as a global color table
      assert(f[Boolean]("has_gct"))
      assert(Set(2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L)
        .contains(f[Long]("gct_entries")), s"GCT entries: $row")
      // a REAL stream carries image data between GCT and trailer, so
      // the minimal-stream consistency flag must be false — not null
      assert(f[Boolean]("header_consistent") === false)
    }
    // traps: truncated header and a stream missing its trailer
    val junk = Seq((1L, "GIF89a12".getBytes("US-ASCII"))).toDF("doc_id", "payload")
    assert(!Binary.Gif.parse(junk).head().getAs[Boolean]("gif_valid"))
  }

  test("GIF LZW decode vs ImageIO's REAL encoder: channel sums exact through dictionary growth") {
    // an INDEXED image with a known palette: ImageIO's GIF writer
    // preserves the color map losslessly (no quantization), so the
    // planted per-pixel RGB sums are exact ground truth — and its LZW
    // stream grows the dictionary (runs of repeated indices), the
    // path the literal-mode synth encoder deliberately never takes
    val pal = Array(0x102030, 0x405060, 0x708090, 0xA0B0C0)
    val icm = new java.awt.image.IndexColorModel(2, 4,
      pal.map(p => ((p >> 16) & 0xFF).toByte),
      pal.map(p => ((p >> 8) & 0xFF).toByte),
      pal.map(p => (p & 0xFF).toByte))
    for ((w, h) <- Seq((23, 11), (64, 32))) {
      val img = new BufferedImage(w, h,
        BufferedImage.TYPE_BYTE_INDEXED, icm)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        // long runs (x/7) force dictionary codes incl. KwKwK shapes
        val idx = ((x / 7) + y) % 4
        img.getRaster.setSample(x, y, 0, idx)
        sr += (pal(idx) >> 16) & 0xFF
        sg += (pal(idx) >> 8) & 0xFF
        sb += pal(idx) & 0xFF
      }
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "gif", out), "JDK GIF writer unavailable")
      val df = Seq((1L, out.toByteArray)).toDF("doc_id", "payload")
      val row = Binary.Gif.pixelStats(df).head()
      def f[T](n: String): T = row.getAs[T](n)
      assert(f[Boolean]("gif_valid"), s"GIF ${w}x$h rejected: $row")
      val n = (w * h).toLong
      assert(f[Long]("pixels_decoded") === n,
        s"GIF ${w}x$h: LZW stream must fully decode: $row")
      assert(f[Double]("mean_r") === sr.toDouble / n)
      assert(f[Double]("mean_g") === sg.toDouble / n)
      assert(f[Double]("mean_b") === sb.toDouble / n)
      assert(f[Long]("peak_byte") === 0xC0L)
    }
  }

  test("BMP from ImageIO (independent encoder): meta and pixel stats field-exact") {
    for ((w, h) <- Seq((16, 9), (13, 7))) { // 13 → non-trivial stride padding
      val img = plantRgb(w, h, BufferedImage.TYPE_3BYTE_BGR)
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "bmp", out), "JDK BMP writer unavailable")
      val df = Seq((1L, out.toByteArray)).toDF("doc_id", "payload")
      val row = Binary.Bmp.pixelStats(df).head()
      def f[T](n: String): T = row.getAs[T](n)
      assert(f[Boolean]("bmp_valid") && f[Boolean]("header_consistent"),
        s"BMP ${w}x$h header rejected: $row")
      assert(f[Long]("width") === w.toLong && f[Long]("height") === h.toLong)
      assert(f[Long]("bits_per_pixel") === 24L && f[Long]("compression") === 0L)
      assert(f[Boolean]("bmp_top_down") === false) // JDK writes bottom-up
      assert(f[Long]("row_stride") === ((w * 24 + 31) / 32 * 4).toLong)
      val n = (w * h).toLong
      val (sr, sg, sb, peak) = channelSums(img)
      // channel sums are row-order independent — bottom-up storage
      // still yields the planted means exactly
      assert(f[Long]("pixels_decoded") === n)
      assert(f[Double]("mean_r") === sr.toDouble / n)
      assert(f[Double]("mean_g") === sg.toDouble / n)
      assert(f[Double]("mean_b") === sb.toDouble / n)
      assert(f[Long]("peak_byte") === peak)
    }
  }

  test("WAV from javax.sound (independent encoder): meta and sample stats field-exact") {
    // 16-bit mono with planted clipping
    val samples = Array.tabulate(500) { i =>
      if (i % 101 == 0) 32767 else (math.sin(i * 0.1) * 12000).toInt
    }
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = v.toByte; pcm(2 * i + 1) = (v >> 8).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    val df = Seq((1L, out.toByteArray)).toDF("doc_id", "payload")
    val row = Binary.Wav.sampleStats(df).head()
    def f[T](n: String): T = row.getAs[T](n)
    assert(f[Boolean]("wav_valid") && f[Boolean]("header_consistent"),
      s"WAV header rejected: $row")
    assert(f[Long]("channels") === 1L && f[Long]("sample_rate") === 8000L &&
      f[Long]("bits_per_sample") === 16L && f[Long]("block_align") === 2L &&
      f[Long]("data_bytes") === (samples.length * 2).toLong)
    // expected stats recomputed from the planted SAMPLES, not bytes
    val n = samples.length.toLong
    val sum = samples.map(_.toLong).sum
    val sumSq = samples.map(v => v.toLong * v.toLong).sum
    assert(f[Long]("n_samples") === n)
    assert(f[Long]("peak_abs") === 32767L)
    assert(f[Long]("n_clipped") === samples.count(v => math.abs(v) >= 32767).toLong)
    assert(f[Double]("rms") === math.sqrt(sumSq.toDouble / n))
    assert(f[Double]("dc_mean") === sum.toDouble / n)
  }

  test("JPEG tiny-width 4:2:0 from ImageIO: fancy-upsample edge columns sample-exact (r15)") {
    // ImageIO's encoder writes 4:2:0 at default quality, so chroma
    // width cw = ceil(w/2) hits 1, 2, 3 here — pinning the decoder's
    // narrow-image upsample behavior against the JDK's own libjpeg
    for (w <- Seq(1, 2, 3, 4, 5, 8); h <- Seq(2, 4, 5)) {
      val img = plantRgb(w, h, BufferedImage.TYPE_INT_RGB)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpeg", bos)
      val bytes = bos.toByteArray
      val ours = graft.expressions.JpegDecodeKernel.decodePixels(bytes)
      assert(ours != null, s"w=$w h=$h: decode rejected")
      val ref = ImageIO.read(new ByteArrayInputStream(bytes))
      for (y <- 0 until h; x <- 0 until w)
        assert((ref.getRGB(x, y) & 0xFFFFFF) === (ours._3(y * w + x) & 0xFFFFFF),
          s"w=$w h=$h: pixel ($x,$y) differs")
    }
  }

  test("JPEG from ImageIO (independent encoder): baseline AND progressive SOF walk") {
    val img = plantRgb(24, 17, BufferedImage.TYPE_INT_RGB)
    def encode(progressive: Boolean): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      if (progressive) param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      out.toByteArray
    }
    val df = Seq((1L, encode(false)), (2L, encode(true))).toDF("doc_id", "payload")
    val rows = Binary.Jpeg.parse(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    for ((id, prog) <- Seq(1L -> false, 2L -> true)) {
      val r = rows(id)
      assert(r.getAs[Boolean]("jpeg_valid") && r.getAs[Boolean]("header_consistent"),
        s"JPEG(progressive=$prog) rejected: $r")
      assert(r.getAs[Boolean]("jfif_present"))
      assert(r.getAs[Long]("width") === 24L && r.getAs[Long]("height") === 17L)
      assert(r.getAs[Long]("n_components") === 3L &&
        r.getAs[Long]("precision_bits") === 8L)
      assert(r.getAs[Boolean]("progressive") === prog,
        s"SOF marker class wrong for progressive=$prog")
    }
    // the walk, not a constant: baseline and progressive streams put
    // SOF at different offsets past different segment trains
    assert(rows(1L).getAs[Long]("sof_offset") > 2L)
  }

  test("GPS strip on a REAL ImageIO JPEG: exif intact, gps destroyed, pixels bit-identical (r14)") {
    // a real entropy-coded stream from the independent encoder, with
    // a hand-planted Exif APP1 (big-endian TIFF: Make offset-addressed,
    // Orientation, GPS pointer -> sub-IFD with refs + out-of-line
    // deg/min/sec rationals) spliced in after SOI — the layout real
    // cameras write
    val img = plantRgb(20, 14, BufferedImage.TYPE_INT_RGB)
    val base = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "jpeg", out)
      out.toByteArray
    }
    val tiff = {
      val bb = java.nio.ByteBuffer.allocate(200)
      bb.put("MM".getBytes("US-ASCII")).putShort(42).putInt(8)
      bb.putShort(3) // IFD0: Make, Orientation, GPS pointer
      val makeOff = 8 + 2 + 3 * 12 + 4 // past entries + next-IFD
      bb.putShort(0x010F.toShort).putShort(2).putInt(6).putInt(makeOff)
      bb.putShort(0x0112.toShort).putShort(3).putInt(1).putInt(3 << 16)
      val gpsOff = makeOff + 6
      bb.putShort(0x8825.toShort).putShort(4).putInt(1).putInt(gpsOff)
      bb.putInt(0) // next IFD
      bb.put("Acme".getBytes("US-ASCII")).putShort(0)
      // GPS sub-IFD: latref, lat, lonref, lon
      val latOff = gpsOff + 2 + 4 * 12 + 4
      bb.putShort(4)
      bb.putShort(1).putShort(2).putInt(2).put('S'.toByte).put(0.toByte).putShort(0)
      bb.putShort(2).putShort(5).putInt(3).putInt(latOff)
      bb.putShort(3).putShort(2).putInt(2).put('W'.toByte).put(0.toByte).putShort(0)
      bb.putShort(4).putShort(5).putInt(3).putInt(latOff + 24)
      bb.putInt(0)
      for (v <- Seq(37, 1, 46, 1, 302, 10, 122, 1, 25, 1, 117, 10))
        bb.putInt(v)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    val app1 = {
      val body = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
      val len = body.length + 2
      Array[Byte](0xFF.toByte, 0xE1.toByte,
        (len >> 8).toByte, (len & 0xFF).toByte) ++ body
    }
    val withExif = base.take(2) ++ app1 ++ base.drop(2)
    val df = Seq((1L, withExif)).toDF("doc_id", "payload")
    val pre = Binary.Jpeg.exif(df).collect()(0)
    assert(pre.getAs[Boolean]("exif_present") && pre.getAs[Boolean]("has_gps"))
    assert(math.abs(pre.getAs[Double]("gps_lat") -
      -(37.0 + 46.0 / 60 + 30.2 / 3600)) < 1e-9)
    assert(math.abs(pre.getAs[Double]("gps_lon") -
      -(122.0 + 25.0 / 60 + 11.7 / 3600)) < 1e-9)
    val stripped = Binary.Jpeg.stripGps(df).select(col("payload"))
      .collect()(0).getAs[Array[Byte]](0)
    // exif intact, gps gone — on the REAL re-parse
    val post = Binary.Jpeg.exif(Seq((1L, stripped)).toDF("doc_id", "payload"))
      .collect()(0)
    assert(post.getAs[Boolean]("exif_present"), "strip killed the EXIF")
    assert(!post.getAs[Boolean]("has_gps"), "gps pointer survived the strip")
    assert(post.getAs[String]("make") === "Acme")
    assert(post.getAs[Long]("orientation") === 3L)
    assert(post.getAs[Long]("n_ifd0_entries") === 2L)
    assert(post.isNullAt(post.fieldIndex("gps_lat")))
    // pixels bit-identical: every byte outside the APP1 segment is
    // untouched (which IS the entropy-coded stream), and ImageIO
    // decodes both to the same raster
    assert(stripped.length === withExif.length)
    assert(java.util.Arrays.equals(stripped.take(2), withExif.take(2)))
    assert(java.util.Arrays.equals(stripped.drop(2 + app1.length),
      withExif.drop(2 + app1.length)), "bytes outside APP1 changed")
    val d1 = ImageIO.read(new ByteArrayInputStream(withExif))
    val d2 = ImageIO.read(new ByteArrayInputStream(stripped))
    for (y <- 0 until d1.getHeight; x <- 0 until d1.getWidth)
      assert(d1.getRGB(x, y) === d2.getRGB(x, y), s"pixel ($x,$y) differs")
    // the coordinate BYTES are destroyed, not just unlinked: the
    // rational area inside the stripped APP1 is all zeros now
    val tiffBase = 2 + 4 + 6
    val latAt = tiffBase + (8 + 2 + 3 * 12 + 4 + 6 + 2 + 4 * 12 + 4)
    assert(stripped.slice(latAt, latAt + 48).forall(_ == 0),
      "gps rationals survive in the stripped bytes")
    assert(withExif.slice(latAt, latAt + 48).exists(_ != 0))
    // idempotent, and a gps-less payload passes through byte-equal
    val again = Binary.Jpeg.stripGps(
      Seq((1L, stripped)).toDF("doc_id", "payload"))
      .select(col("payload")).collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(again, stripped))
    val plain = Binary.Jpeg.stripGps(Seq((1L, base)).toDF("doc_id", "payload"))
      .select(col("payload")).collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(plain, base))
  }

  test("TIFF from ImageIO (independent encoder): every compression type decodes sample-exact (r15)") {
    // the JDK bundles a full TIFF plugin (since 9): its writer is an
    // independent codebase whose LZW grows the dictionary, whose
    // PackBits restarts per row, and whose ZLib/Deflate lanes cover
    // both deflate tags — the kernel must recover the planted sums
    // from all of them, RGB and grayscale
    for (compType <- Seq(null, "LZW", "PackBits", "ZLib", "Deflate");
         gray <- Seq(false, true)) {
      val (w, h) = (21, 13)
      val img =
        if (gray) {
          val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
          for (y <- 0 until h; x <- 0 until w)
            g.getRaster.setSample(x, y, 0, (x * 19 + y * 7) % 256)
          g
        } else plantRgb(w, h, BufferedImage.TYPE_3BYTE_BGR)
      val writers = ImageIO.getImageWritersByFormatName("tiff")
      assert(writers.hasNext, "JDK TIFF writer unavailable")
      val writer = writers.next()
      val param = writer.getDefaultWriteParam
      if (compType != null) {
        param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(compType)
      }
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
      ios.close()
      writer.dispose()
      // raw raster sums (not getRGB: gray→sRGB conversion would
      // gamma-shift the bytes; the kernel reads raw samples)
      var (sr, sg, sb, peak) = (0L, 0L, 0L, 0L)
      val bands = img.getRaster.getNumBands
      for (y <- 0 until h; x <- 0 until w) {
        val r = img.getRaster.getSample(x, y, 0)
        val g = if (bands > 1) img.getRaster.getSample(x, y, 1) else r
        val b = if (bands > 2) img.getRaster.getSample(x, y, 2) else r
        sr += r; sg += g; sb += b
        peak = math.max(peak, math.max(r, math.max(g, b)).toLong)
      }
      val df = Seq((1L, out.toByteArray)).toDF("doc_id", "payload")
      val row = Binary.Tiff.pixelStats(df).head()
      def f[T](n: String): T = row.getAs[T](n)
      val label = s"TIFF ${if (gray) "gray" else "rgb"}/$compType"
      assert(f[Boolean]("tiff_valid"), s"$label rejected: $row")
      val n = (w * h).toLong
      assert(f[Long]("pixels_decoded") === n, s"$label must fully decode: $row")
      assert(f[Double]("mean_r") === sr.toDouble / n, label)
      assert(f[Double]("mean_g") === sg.toDouble / n, label)
      assert(f[Double]("mean_b") === sb.toDouble / n, label)
      assert(f[Long]("peak_byte") === peak, label)
    }
  }

  test("TIFF synth lanes read back by ImageIO: encoder conformance both directions (r15)") {
    // the reverse direction: the synth's own LZW / PackBits / Deflate
    // streams (incl. the predictor and multi-tile lanes) must be
    // legal to the JDK's independent TIFF READER, and decode to the
    // same closed-form raster the kernel reports. RGB lanes only —
    // gray readback goes through a gamma-mapped gray ColorModel.
    // d values: 0 none, 18 LZW, 12 PackBits+tiles, 6 Deflate,
    // 66 LZW+predictor, 87 Deflate+tiles(+predictor? d%7=3 yes)
    for (d <- Seq(0L, 6L, 12L, 18L, 66L, 87L)) {
      val bytes = graft.expressions.TiffPixelSynthKernel.synth(d)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, s"doc $d unreadable by ImageIO")
      val spp = if (d % 3 == 0) 3 else 1
      val tiles = d % 5 == 2
      val w = (5 + d % 12 + (if (tiles) 16 else 0)).toInt
      val h = (4 + d % 9 + (if (tiles) 16 else 0)).toInt
      assert(img.getWidth === w && img.getHeight === h, s"doc $d dims")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until spp) {
        val j = (y * w + x) * spp + c
        val want = ((7 * d + 13 * j) % 256).toInt
        val band = if (spp == 3) c else 0
        assert(img.getRaster.getSample(x, y, band) === want,
          s"doc $d pixel ($x,$y) band $band")
      }
    }
  }
}
