package graft

import org.apache.spark.sql.functions._

import graft.expressions.{ImageHashKernel, JpegEncoder}

/** Perceptual dHash: content-not-bytes collision across codecs and
  * re-encodes, locality under small edits, and the dedup row shape.
  */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  /** 24-bit bottom-up BMP of a gray raster (r=g=b). */
  private def bmpOf(gray: Array[Int], w: Int, h: Int): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val out = new Array[Byte](54 + stride * h)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, out.length); le32(10, 54); le32(14, 40)
    le32(18, w); le32(22, h)
    out(26) = 1; out(28) = 24
    le32(34, stride * h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = gray(y * w + x).toByte
      val base = 54 + (h - 1 - y) * stride + 3 * x
      out(base) = v; out(base + 1) = v; out(base + 2) = v
    }
    out
  }

  private def flatTileGray(tiles: Array[Int], tw: Int, th: Int): Array[Int] = {
    val w = tw * 8; val h = th * 8
    Array.tabulate(w * h)(i => tiles(((i / w) / 8) * tw + ((i % w) / 8)))
  }

  test("same raster through JPEG and BMP collides; re-encode with restarts collides") {
    val tiles = Array.tabulate(72)(t => (t * 37 + 11) % 256)
    val jpeg = JpegEncoder.encodeFlatTiles(tiles, 9, 8, 0, 0)
    val jpegRst = JpegEncoder.encodeFlatTiles(tiles, 9, 8, 0, 3)
    val bmp = bmpOf(flatTileGray(tiles, 9, 8), 72, 64)
    val hJ = ImageHashKernel.dhash(jpeg)
    val hR = ImageHashKernel.dhash(jpegRst)
    val hB = ImageHashKernel.dhash(bmp)
    assert(hJ != null && hR != null && hB != null)
    assert(hJ === hR, "a re-encode (different entropy framing) must collide")
    assert(hJ === hB, "the same raster through two codecs must collide")
    // locality: perturbing ONE tile flips at most a few gradient bits
    val tweaked = tiles.clone(); tweaked(40) = (tiles(40) + 120) % 256
    val hT = ImageHashKernel.dhash(JpegEncoder.encodeFlatTiles(tweaked, 9, 8, 0, 0))
    val dist = java.lang.Long.bitCount(hJ.longValue() ^ hT.longValue())
    assert(dist >= 1 && dist <= 4, s"one-tile edit moved $dist bits")
    // undecodable payloads null
    assert(ImageHashKernel.dhash("not an image".getBytes) == null)
    assert(ImageHashKernel.dhash(Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0x55)) == null)
    // r13: a PROGRESSIVE (SOF2) re-encode of the same raster collides
    // — the layout a real corpus ships 10-20% of the time; pre-r13
    // the hash nulled and perceptual dedup was blind to these
    val hP = ImageHashKernel.dhash(
      JpegEncoder.encodeFlatTiles(tiles, 9, 8, 0, 0, progressive = true))
    assert(hP != null, "progressive stream must hash")
    assert(hJ === hP, "baseline/progressive re-encode pair must collide")
  }

  test("EXIF orientation applied: all 8 dihedral re-posts collide with the upright original (r15)") {
    val up = Array.tabulate(72)(t => (t * 37 + 11) % 256) // 9×8 upright tile grid
    val base = ImageHashKernel.dhash(JpegEncoder.encodeFlatTiles(up, 9, 8, 0, 0))
    assert(base != null)
    for (o <- 1 to 8) {
      val (sw, sh) = if (o >= 5) (8, 9) else (9, 8) // stored grid dims
      val stored = new Array[Int](72)
      for (yy <- 0 until 8; xx <- 0 until 9) {
        // the same inverse maps the kernel applies, at tile grain
        // (flat 8×8 tiles make block- and pixel-level rotation equal)
        val src = o match {
          case 1 => yy * sw + xx
          case 2 => yy * sw + (sw - 1 - xx)
          case 3 => (sh - 1 - yy) * sw + (sw - 1 - xx)
          case 4 => (sh - 1 - yy) * sw + xx
          case 5 => xx * sw + yy
          case 6 => (sh - 1 - xx) * sw + yy
          case 7 => (sh - 1 - xx) * sw + (sw - 1 - yy)
          case _ => xx * sw + (sw - 1 - yy)
        }
        stored(src) = up(yy * 9 + xx)
      }
      val tagged = JpegEncoder.encodeFlatTiles(stored, sw, sh, 0, 0, false, o)
      val h = ImageHashKernel.dhash(tagged)
      assert(h != null, s"orientation $o: decode rejected")
      assert(h === base, s"orientation $o: rotated re-post must collide")
    }
    // an orientation-less JPEG and an orientation-1 tag are identical
    val o1 = ImageHashKernel.dhash(JpegEncoder.encodeFlatTiles(up, 9, 8, 0, 0, false, 1))
    assert(o1 === base)
  }

  test("same raster through WebP (VP8L) and BMP collides — the codec-divide route (r15)") {
    val tiles = Array.tabulate(72)(t => (t * 53 + 7) % 256)
    val gray = flatTileGray(tiles, 9, 8)
    val argb = gray.map(v => (255 << 24) | (v << 16) | (v << 8) | v)
    val bmp = bmpOf(gray, 72, 64)
    for (lane <- 0 to 3; sg <- Seq(false, true)) {
      // lane 0 needs ≤2 symbols per channel only for the SIMPLE-code
      // path; the encoder falls back to normal codes per tree, so all
      // lanes are legal on this raster
      val webp = graft.expressions.Vp8lEncoder.encode(argb, 72, lane, sg,
        if (lane == 3) 6 else 0)
      val hW = ImageHashKernel.dhash(webp)
      val hB = ImageHashKernel.dhash(bmp)
      assert(hW != null && hB != null)
      assert(hW === hB,
        s"lane $lane sg $sg: the same raster through WebP and BMP must collide")
    }
    // a VP8 (lossy) or garbage RIFF payload routes to null, not a throw
    val junk = "RIFFxxxxWEBPVP8 ".getBytes("US-ASCII") ++ Array.fill(16)(0.toByte)
    assert(ImageHashKernel.dhash(junk) == null)
  }

  test("same raster through TIFF (LZW strips) and BMP/JPEG collides; upright tag-274 frame (r15)") {
    val tiles = Array.tabulate(72)(t => (t * 41 + 3) % 256)
    val gray = flatTileGray(tiles, 9, 8)
    val tiff = graft.expressions.TiffGrayEncodeKernel.encode(gray, 72)
    val hT = ImageHashKernel.dhash(tiff)
    val hB = ImageHashKernel.dhash(bmpOf(gray, 72, 64))
    val hJ = ImageHashKernel.dhash(JpegEncoder.encodeFlatTiles(tiles, 9, 8, 0, 0))
    assert(hT != null && hB != null && hJ != null)
    assert(hT === hB, "the same raster through TIFF and BMP must collide")
    assert(hT === hJ, "the same raster through TIFF and JPEG must collide")
    // a multi-strip PackBits synth doc and its own stats agree with
    // the hash route's decode (both go through the same Layout walk)
    assert(ImageHashKernel.dhash(
      graft.expressions.TiffPixelSynthKernel.synth(5L)) != null)
    // orientation tag 274: a stored-rotated TIFF hashes upright. Build
    // the orientation-6 stored frame (8×9 tile grid rotated 90° CCW),
    // encode as gray LZW TIFF, then patch an Orientation entry in by
    // rewriting the payload with one extra IFD entry.
    val stored = new Array[Int](72) // 8×9 tile grid (sw=8, sh=9)
    for (yy <- 0 until 8; xx <- 0 until 9)
      stored((9 - 1 - xx) * 8 + yy) = tiles(yy * 9 + xx)
    val storedGray = flatTileGray(stored, 8, 9)
    val base = graft.expressions.TiffGrayEncodeKernel.encode(storedGray, 64)
    // splice entry (0x0112, SHORT, 1, 6) into the 9-entry IFD after
    // tag 0x0111 and shift every offset-valued field by 12
    val nE = 9
    val patched = new java.io.ByteArrayOutputStream()
    patched.write(base, 0, 8) // header (IFD0 offset 8 unchanged)
    patched.write(nE + 1); patched.write(0)
    val entries = (0 until nE).map(i => base.slice(10 + 12 * i, 22 + 12 * i))
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    for (e <- entries) {
      val tag = (e(0) & 0xFF) | ((e(1) & 0xFF) << 8)
      if (tag == 0x0111) {
        // strip offset moves by the 12 bytes the new entry adds
        val old = (e(8) & 0xFF) | ((e(9) & 0xFF) << 8) |
          ((e(10) & 0xFF) << 16) | ((e(11) & 0xFF) << 24)
        patched.write(e, 0, 8)
        patched.write(le32(old + 12), 0, 4)
      } else patched.write(e, 0, 12)
      if (tag == 0x0111) { // ascending order: 0x0112 right after
        patched.write(Array[Byte](0x12, 0x01, 3, 0), 0, 4)
        patched.write(le32(1), 0, 4)
        patched.write(Array[Byte](6, 0, 0, 0), 0, 4)
      }
    }
    patched.write(le32(0), 0, 4) // next-IFD
    patched.write(base, 10 + 12 * nE + 4,
      base.length - (10 + 12 * nE + 4)) // strip bytes
    val hRot = ImageHashKernel.dhash(patched.toByteArray)
    assert(hRot != null, "orientation-tagged TIFF must decode")
    assert(hRot === hT, "a stored-rotated TIFF must hash in the upright frame")
  }

  test("audio fingerprint: sample-content identity, width routing, locality, short-stream null") {
    import graft.expressions.AudioHashKernel
    val n = AudioHashKernel.Windows * 4
    def pcm16(amp: Int => Int): Array[Byte] = {
      val out = new Array[Byte](2 * n)
      for (i <- 0 until n) {
        val v = amp(i / 4) & 0xFFFF
        out(2 * i) = v.toByte; out(2 * i + 1) = (v >> 8).toByte
      }
      out
    }
    val a = pcm16(w => (w * 37 + 5) % 500)
    val h1 = AudioHashKernel.ahash(a, 16)
    assert(h1 != null)
    // identity is the SAMPLES: a byte-identical stream re-hashed in a
    // different container (rate, riff size) is the caller's concern —
    // the kernel sees data+width only, so equal data must collide
    assert(AudioHashKernel.ahash(a.clone(), 16) === h1)
    // one-window envelope edit moves few bits
    val b = pcm16(w => if (w == 30) 499 else (w * 37 + 5) % 500)
    val h2 = AudioHashKernel.ahash(b, 16)
    val dist = java.lang.Long.bitCount(h1.longValue() ^ h2.longValue())
    assert(dist >= 1 && dist <= 4, s"one-window edit moved $dist bits")
    // width routing differs (the same bytes as 8-bit are different samples)
    assert(AudioHashKernel.ahash(a, 8) !== h1)
    // too short / bad width → null
    assert(AudioHashKernel.ahash(a.take(64), 16) == null)
    assert(AudioHashKernel.ahash(a, 24) == null)
  }

  test("imageDedupStream: stream-static seen-filter on decoded fingerprints, batch-identical") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tilesA = Array.tabulate(72)(t => (t * 31 + 7) % 256)
    val tilesB = Array.tabulate(72)(t => (t * 17 + 99) % 256)
    def jpg(tiles: Array[Int]) = JpegEncoder.encodeFlatTiles(tiles, 9, 8, 0, 0)
    // the landed corpus knows image A (as decoded from a RE-ENCODE:
    // restart framing differs, content identical)
    val landed = Seq(Tuple1(
      graft.expressions.ImageHashKernel.dhash(
        JpegEncoder.encodeFlatTiles(tilesA, 9, 8, 0, 3)).longValue()))
      .toDF("dhash")
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    mem.addData(Seq(
      (1L, jpg(tilesA)), // seen (content collides across framings)
      (2L, jpg(tilesB)), // fresh
      (3L, "junk".getBytes))) // undecodable
    val streamed = graft.streaming.Streams.imageDedupStream(
      mem.toDF().toDF("doc_id", "payload"), landed)
    val got = graft.streaming.Streams.runOnce(spark, streamed, "img_dedup_stream",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Boolean]("seen") && !got(1L).getAs[Boolean]("keep"),
      "a re-encoded landed image must be seen")
    assert(!got(2L).getAs[Boolean]("seen") && got(2L).getAs[Boolean]("keep"))
    assert(!got(3L).getAs[Boolean]("image_valid") && !got(3L).getAs[Boolean]("keep"))
  }

  test("imageDedup: planted pairs group, keeper is min doc_id, invalid lane nulls") {
    val rows = SparkEntry.queries("mm_image_dedup")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size === 500)
    for ((d, r) <- rows) {
      if (d % 10 == 0) {
        assert(!r.getAs[Boolean]("image_valid"))
        assert(r.isNullAt(r.fieldIndex("n_copies")))
      } else {
        val partner = if (d % 2 == 0) d + 1 else d - 1
        val partnerValid = rows.contains(partner) && partner % 10 != 0
        // pairs share the planted pattern; n_copies reflects the pair
        // unless the partner fell on the invalid lane (or a chance
        // cross-pattern collision grew the group)
        val nc = r.getAs[Long]("n_copies")
        if (partnerValid) assert(nc >= 2L, s"doc $d expected its pair: $r")
        assert(r.getAs[Long]("keeper_id") <= d)
        assert(r.getAs[Boolean]("is_canonical") === (r.getAs[Long]("keeper_id") == d))
      }
    }
  }
}
