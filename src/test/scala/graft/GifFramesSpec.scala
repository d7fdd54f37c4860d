package graft

import java.io.ByteArrayOutputStream
import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
import javax.imageio.metadata.IIOMetadataNode

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{GifAnimSynthKernel, GifFramesKernel, GifLzwEncoder}

/** Animated GIF frame walk: synth round trips over the full lane
  * grid (frame counts × loop extension × GCE delay/disposal/
  * transparency × local-color-table frames), conformance against
  * the JDK's OWN animated GIF writer (per-frame delays, disposal,
  * frame count, and per-frame channel sums through ImageIO's
  * dictionary-growing LZW streams), GCE-less frames, structural
  * traps, and never-throw sweeps.
  */
class GifFramesSpec extends AnyFunSuite {

  // closed-form mirror of one frame's channel sums
  private def frameSums(d: Long, f: Long): (Long, Long, Long, Long) = {
    val e = 1L << (d % 3 + 2).toInt
    val lct = (d + f) % 5 == 2
    val ae = if (lct) 4L else e
    val fw = 3 + (d + f) % 3
    val fh = 2 + (d + f) % 2
    var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0L
    for (i <- 0L until fw * fh) {
      val j = (d + f + i) % ae
      for (c <- 0 to 2) {
        val v = if (lct) (7 * d + 33 * j + 11 * c + f) % 256
          else (5 * d + 9 * j + 3 * c) % 256
        if (c == 0) sr += v else if (c == 1) sg += v else sb += v
        if (v > peak) peak = v
      }
    }
    (sr, sg, sb, peak)
  }

  test("round trips: every lane parses and decodes to its closed form") {
    for (d <- 1L to 140L if d % 10 != 0) {
      val row = GifFramesKernel.parse(GifAnimSynthKernel.synth(d))
      assert(row != null, s"d=$d: null")
      assert(row.getBoolean(0), s"d=$d: gif_valid")
      assert(row.getLong(1) === 10 + d % 6, s"d=$d: canvas_w")
      assert(row.getLong(2) === 8 + d % 5, s"d=$d: canvas_h")
      val nf = 1 + d % 4
      assert(row.getLong(3) === nf, s"d=$d: n_frames")
      if (d % 4 != 1) assert(row.getLong(4) === d % 7, s"d=$d: loop_count")
      else assert(row.isNullAt(4), s"d=$d: loop_count null")
      var total = 0L
      for (f <- 0L until nf) total += 10 * (2 + (d + f) % 6)
      assert(row.getLong(5) === total, s"d=$d: total_delay_ms")
      val frames = row.getArray(6)
      assert(frames.numElements() === nf.toInt, s"d=$d: frames array")
      for (fi <- 0 until nf.toInt) {
        val fr = frames.getStruct(fi, 14)
        val f = fi.toLong
        assert(fr.getLong(0) === f, s"d=$d f=$f: frame_idx")
        assert(fr.getLong(1) === 10 * (2 + (d + f) % 6), s"d=$d f=$f: delay")
        assert(fr.getLong(2) === (d + f) % 4, s"d=$d f=$f: disposal")
        if ((d + f) % 3 == 0)
          assert(fr.getLong(3) === (d + f) % 4, s"d=$d f=$f: trans idx")
        else assert(fr.isNullAt(3), s"d=$d f=$f: trans null")
        assert(fr.getLong(4) === f && fr.getLong(5) === f, s"d=$d f=$f: pos")
        assert(fr.getLong(6) === 3 + (d + f) % 3, s"d=$d f=$f: fw")
        assert(fr.getLong(7) === 2 + (d + f) % 2, s"d=$d f=$f: fh")
        assert(fr.getBoolean(8) === ((d + f) % 5 == 2), s"d=$d f=$f: lct")
        val (sr, sg, sb, peak) = frameSums(d, f)
        assert(fr.getLong(10) === sr, s"d=$d f=$f: sum_r")
        assert(fr.getLong(11) === sg, s"d=$d f=$f: sum_g")
        assert(fr.getLong(12) === sb, s"d=$d f=$f: sum_b")
        assert(fr.getLong(13) === peak, s"d=$d f=$f: peak")
      }
    }
  }

  test("animated GIF from ImageIO (independent encoder): frames, delays, sums exact") {
    // the sequence writer QUANTIZES (it emits its own 256-color web
    // palette and remaps pixels), so ground truth is ImageIO's own
    // READER on the bytes it wrote — both decoders must agree on
    // every frame's dimensions and channel sums, and the planted GCE
    // metadata must survive verbatim
    val pal = Array(0x102030, 0x405060, 0x708090, 0xA0B0C0)
    val icm = new java.awt.image.IndexColorModel(2, 4,
      pal.map(p => ((p >> 16) & 0xFF).toByte),
      pal.map(p => ((p >> 8) & 0xFF).toByte),
      pal.map(p => (p & 0xFF).toByte))
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val delays = Seq(7, 13, 25) // centiseconds
    for (k <- delays.indices) {
      val (w, h) = (17 + 3 * k, 9 + 2 * k)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, ((x / 5) + y + k) % 4)
      val spec = ImageTypeSpecifier.createFromRenderedImage(img)
      val meta = writer.getDefaultImageMetadata(spec, writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      // set the GCE delay on the writer's own metadata tree
      var gce: IIOMetadataNode = null
      val kids = root.getChildNodes
      for (i <- 0 until kids.getLength)
        if (kids.item(i).getNodeName == "GraphicControlExtension")
          gce = kids.item(i).asInstanceOf[IIOMetadataNode]
      if (gce == null) {
        gce = new IIOMetadataNode("GraphicControlExtension")
        root.appendChild(gce)
      }
      gce.setAttribute("disposalMethod", "doNotDispose")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("transparentColorIndex", "0")
      gce.setAttribute("delayTime", delays(k).toString)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    ios.close()
    val bytes = out.toByteArray
    val row = GifFramesKernel.parse(bytes)
    assert(row != null && row.getBoolean(0), "ImageIO animation rejected")
    assert(row.getLong(3) === 3L, "frame count")
    val frames = row.getArray(6)
    val rdr = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    rdr.setInput(iis)
    assert(rdr.getNumImages(true) === 3, "reader frame count")
    for (k <- delays.indices) {
      val fr = frames.getStruct(k, 14)
      assert(fr.getLong(1) === delays(k) * 10L, s"frame $k delay")
      // disposal 'doNotDispose' is code 1
      assert(fr.getLong(2) === 1L, s"frame $k disposal")
      val im = rdr.read(k)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until im.getHeight; x <- 0 until im.getWidth) {
        val rgb = im.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
      }
      assert(fr.getLong(6) === im.getWidth.toLong, s"frame $k width")
      assert(fr.getLong(7) === im.getHeight.toLong, s"frame $k height")
      assert(fr.getLong(9) === im.getWidth.toLong * im.getHeight, s"frame $k pixels")
      assert(fr.getLong(10) === sr, s"frame $k sum_r")
      assert(fr.getLong(11) === sg, s"frame $k sum_g")
      assert(fr.getLong(12) === sb, s"frame $k sum_b")
    }
  }

  test("GCE-less frames parse with null timing; GCE scope is one image") {
    // hand-built: GCT, frame 0 WITHOUT a GCE, frame 1 WITH one — the
    // delay must attach to frame 1 only
    val out = new ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(8); w16(8); w8(0xF1); w8(0); w8(0) // 4-entry GCT (size bits 1)
    for (k <- 0 until 12) w8(10 * k)
    def frame(): Unit = {
      w8(0x2C); w16(0); w16(0); w16(2); w16(2); w8(0)
      w8(2) // minCode
      val lzw = GifLzwEncoder.encodeLiterals(Array(0, 1, 2, 3), 2)
      out.write(lzw, 0, lzw.length)
    }
    frame()
    w8(0x21); w8(0xF9); w8(4); w8(2 << 2); w16(33); w8(0); w8(0)
    frame()
    w8(0x3B)
    val row = GifFramesKernel.parse(out.toByteArray)
    assert(row != null && row.getBoolean(0))
    assert(row.getLong(3) === 2L)
    val frames = row.getArray(6)
    assert(frames.getStruct(0, 14).isNullAt(1), "frame 0 has no delay")
    assert(frames.getStruct(0, 14).isNullAt(2), "frame 0 has no disposal")
    assert(frames.getStruct(1, 14).getLong(1) === 330L, "frame 1 delay")
    assert(row.getLong(5) === 330L, "total is the one timed frame")
  }

  test("structural traps: trailing bytes, no trailer, zero frames, bad label") {
    val good = GifAnimSynthKernel.synth(3L)
    assert(GifFramesKernel.parse(good :+ 0x00.toByte) == null,
      "bytes after the trailer")
    assert(GifFramesKernel.parse(good.dropRight(1)) == null, "no trailer")
    // header + GCT + immediate trailer: a GIF with no image
    val empty = new ByteArrayOutputStream()
    empty.write("GIF89a".getBytes("US-ASCII"))
    empty.write(Array[Byte](8, 0, 8, 0, 0xF1.toByte, 0, 0))
    for (k <- 0 until 12) empty.write(k)
    empty.write(0x3B)
    assert(GifFramesKernel.parse(empty.toByteArray) == null, "zero frames")
    assert(GifFramesKernel.parse("plain text here padded".getBytes) == null)
  }

  test("truncation sweep and garbage never throw") {
    val full = GifAnimSynthKernel.synth(7L)
    for (cut <- 0 until full.length) {
      assert(GifFramesKernel.parse(java.util.Arrays.copyOf(full, cut)) == null,
        s"cut $cut must be rejected (trailer can't close a truncation)")
    }
    val rnd = new scala.util.Random(1234)
    for (_ <- 0 until 300) {
      val g = new Array[Byte](14 + rnd.nextInt(300))
      rnd.nextBytes(g)
      "GIF89a".getBytes("US-ASCII").copyToArray(g, 0)
      GifFramesKernel.parse(g) // must not throw
    }
  }
}
