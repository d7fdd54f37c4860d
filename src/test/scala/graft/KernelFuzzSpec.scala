package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Never-throw fuzz over the r13 kernels (plus the decoders they
  * route into): every byte-level walk in the engine claims
  * "null-not-throw on arbitrary garbage" — on a 100 TB crawl the
  * inputs ARE arbitrary garbage, and one uncaught exception kills a
  * whole stage. ScalaCheck drives random bytes/strings through the
  * kernel entry points directly (no Spark job per case); structured
  * prefixes bias the generators toward the parsers' deep paths.
  */
class KernelFuzzSpec extends SparkSpec {

  private val params =
    ScTest.Parameters.default.withMinSuccessfulTests(120).withInitialSeed(1337L)

  private def checkProp(p: Prop): Unit = {
    val res = ScTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  private val genBytes: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 2048)
    bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bs.toArray

  /** Random bytes behind a format-magic prefix: exercises the walk
    * past the cheap magic check into the offset/length arithmetic.
    */
  private def withPrefix(prefix: Array[Byte]): Gen[Array[Byte]] =
    genBytes.map(prefix ++ _)

  test("HtmlEntityKernel.decode never throws; output length is bounded") {
    val genStr = Gen.oneOf(
      Gen.asciiPrintableStr,
      // entity-shaped fragments: & # x digits ; stacked randomly
      Gen.listOf(Gen.oneOf("&", "#", "x", ";", "amp", "lt", "9", "2019",
        "1F600", "D800", "&#", "&#x", "é", "a")).map(_.mkString))
    checkProp(Prop.forAllNoShrink(genStr) { s =>
      val out = graft.expressions.HtmlEntityKernel.decode(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      // decoding only ever shrinks or preserves length in chars
      out != null && out.toString.length <= s.length
    })
  }

  test("PdfStreamsKernel.streams never throws on garbage or trap-shaped bytes") {
    val genPdf = Gen.oneOf(
      genBytes,
      withPrefix("%PDF-1.6\n/Length ".getBytes("US-ASCII")),
      withPrefix("%PDF-1.6\n1 0 obj\n<< /Length 5 0 R >>\nstream\n".getBytes("US-ASCII")),
      withPrefix("%PDF\n/Length 99999999999 stream\n".getBytes("US-ASCII")))
    checkProp(Prop.forAllNoShrink(genPdf) { p =>
      graft.expressions.PdfStreamsKernel.streams(p)
      true // value or null, never a throw
    })
  }

  test("Zip/Tar/Gzip/WarcSplit walks never throw on garbage behind their magics") {
    val genAny = Gen.oneOf(
      genBytes,
      withPrefix(Array[Byte]('P', 'K', 5, 6)),
      withPrefix(Array[Byte]('P', 'K', 3, 4)),
      withPrefix(Array[Byte](0x1f, 0x8b.toByte, 8, 0)),
      withPrefix("WARC/1.0\r\nContent-Length: 12\r\n".getBytes("US-ASCII")))
    checkProp(Prop.forAllNoShrink(genAny) { p =>
      graft.expressions.ZipKernel.entries(p, 1 << 16)
      graft.expressions.TarKernel.members(p)
      graft.expressions.GzipKernel.members(p, 1 << 16)
      graft.expressions.WarcSplitKernel.split(p)
      true
    })
  }

  test("JPEG decoders (baseline AND progressive) never throw on corrupted streams") {
    // real encodes with random byte corruption: the deepest decode
    // paths (Huffman tables, scan arithmetic, marker walk) see
    // near-valid streams, not just noise
    val tiles = Array.tabulate(12)(i => (i * 37 + 5) % 256)
    val base = graft.expressions.JpegEncoder.encodeFlatTiles(tiles, 4, 3, 0, 0)
    val prog = graft.expressions.JpegEncoder.encodeFlatTiles(tiles, 4, 3, 0, 0,
      progressive = true)
    val genCase = for {
      src <- Gen.oneOf(base, prog)
      nFlips <- Gen.choose(1, 6)
      flips <- Gen.listOfN(nFlips, for {
        pos <- Gen.choose(2, src.length - 1)
        v <- Gen.choose(Byte.MinValue, Byte.MaxValue)
      } yield (pos, v))
    } yield {
      val c = src.clone()
      flips.foreach { case (pos, v) => c(pos) = v }
      c
    }
    checkProp(Prop.forAllNoShrink(genCase) { p =>
      graft.expressions.JpegDecodeKernel.stats(p)
      graft.expressions.ImageHashKernel.dhash(p)
      graft.expressions.JpegExifKernel.parse(p)
      true
    })
    // and pure garbage behind the SOI magic
    checkProp(Prop.forAllNoShrink(
      withPrefix(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte))) { p =>
      graft.expressions.JpegDecodeKernel.stats(p)
      graft.expressions.JpegExifKernel.parse(p)
      true
    })
    // garbage behind a well-formed Exif APP1 prefix: the TIFF/IFD
    // walk's bounds checks, not the marker walk, carry the load
    checkProp(Prop.forAllNoShrink(withPrefix(
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte,
        0x7F, 0xFF.toByte) ++ "Exif".getBytes ++ Array[Byte](0, 0))) { p =>
      graft.expressions.JpegExifKernel.parse(p)
      true
    })
  }

  test("PngFilterKernel.stats never throws on arbitrary rasters/geometry") {
    val genCase = for {
      raster <- genBytes
      w <- Gen.choose(-5L, 64L)
      h <- Gen.choose(-5L, 64L)
      il <- Gen.choose(-1L, 3L)
    } yield (raster, w, h, il)
    checkProp(Prop.forAllNoShrink(genCase) { case (raster, w, h, il) =>
      graft.expressions.PngFilterKernel.stats(raster,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](w, h, il)))
      true
    })
  }
}
