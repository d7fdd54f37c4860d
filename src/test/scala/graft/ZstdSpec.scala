package graft

import org.apache.spark.sql.functions._

import graft.expressions.{ZstdMetaKernel, ZstdMetaSynthKernel}

/** Zstd container triage (family nineteen): synth round trips over
  * the lane grids, conformance BOTH directions against zstd-jni —
  * the real libzstd compressor's frames parse field-exact, and the
  * synth's hand-built raw/RLE frames decode byte-exact through the
  * real libzstd decoder — plus structural traps and never-throw
  * sweeps.
  */
class ZstdSpec extends SparkSpec {

  private case class Lane(len: Int, rle: Boolean, dict: Boolean,
    ck: Boolean, fcs: Int, ss: Boolean)

  private def lanes(d: Long): Seq[Lane] = {
    val nF = (1 + d % 3).toInt
    (0 until nF).map { i =>
      val lane = ((d + i) % 5).toInt
      val len = if (lane == 4) (256 + d % 50).toInt
        else (10 + (d + i) % 40).toInt
      val fcs = lane match {
        case 0 => 4; case 1 => 0; case 2 => 8; case 3 => 1; case _ => 2
      }
      Lane(len, (d + i) % 2 == 1, (d + i) % 6 == 4, (d + i) % 3 != 1,
        fcs, lane == 3)
    }
  }

  private def expectedContent(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    lanes(d).zipWithIndex.foreach { case (l, i) =>
      val rawLen = if (l.rle) l.len - 5 else l.len
      for (j <- 0 until rawLen)
        out.write(((d * 5 + i * 13 + j * 7) % 256).toInt)
      if (l.rle) {
        val v = ((d * 3 + i * 7) % 256).toInt
        for (_ <- 0 until 5) out.write(v)
      }
    }
    out.toByteArray
  }

  test("zstd synth round trips: every lane parses to its closed form") {
    for (d <- 1L to 200L if d % 10 != 0) {
      val p = ZstdMetaSynthKernel.synth(d)
      val row = ZstdMetaKernel.parse(p)
      assert(row != null, s"d=$d: null")
      assert(row.getBoolean(0), s"d=$d: zstd_valid")
      val ls = lanes(d)
      assert(row.getLong(1) === ls.size.toLong, s"d=$d: n_frames")
      assert(row.getLong(2) === (if (d % 7 == 2) 1L else 0L),
        s"d=$d: n_skippable")
      assert(row.getLong(3) === (if (d % 7 == 2) 4 + d % 9 else 0L),
        s"d=$d: skippable_bytes")
      assert(row.getLong(4) === ls.map(l => if (l.rle) 2L else 1L).sum,
        s"d=$d: n_blocks")
      assert(row.getLong(5) === ls.count(_.rle).toLong, s"d=$d: n_rle")
      assert(row.getLong(6) === 0L, s"d=$d: n_compressed")
      assert(row.getLong(7) === ls.map(_.len.toLong).sum, s"d=$d: bytes")
      val decl = ls.filter(_.fcs > 0)
      assert(row.getLong(8) === decl.size.toLong, s"d=$d: n_declared")
      assert(row.getLong(9) === decl.map(_.len.toLong).sum,
        s"d=$d: declared_bytes")
      if (decl.isEmpty) assert(row.isNullAt(10), s"d=$d: size_match null")
      else assert(row.getBoolean(10), s"d=$d: size_match")
      assert(row.getBoolean(11) === ls.head.ss, s"d=$d: single_segment")
      if (ls.head.ss) assert(row.isNullAt(12), s"d=$d: window_log null")
      else assert(row.getLong(12) === 10 + d % 8, s"d=$d: window_log")
      if (ls.exists(_.dict)) assert(row.getLong(13) === 1 + d % 255,
        s"d=$d: dict_id")
      else assert(row.isNullAt(13), s"d=$d: dict_id null")
      assert(row.getLong(14) === ls.count(_.ck).toLong, s"d=$d: n_ck")
      assert(row.getBoolean(15) === (d % 20 != 9), s"d=$d: checksum_ok")
      assert(row.getBoolean(16), s"d=$d: decode_ok")
      assert(row.getBoolean(17), s"d=$d: consistent")
      // byte-length closed form (the triage-oracle anchor)
      val skLen = if (d % 7 == 2) 12 + (d % 9).toInt else 0
      val expLen = skLen + ls.map { l =>
        5 + (if (l.ss) 0 else 1) + (if (l.dict) 1 else 0) + l.fcs +
          l.len + (if (l.rle) 2 else 3) + (if (l.ck) 4 else 0)
      }.sum
      assert(p.length === expLen, s"d=$d: length")
    }
  }

  test("conformance: libzstd's own compressor parses field-exact") {
    val content = Array.tabulate(10000)(i => ((i * 31) % 251).toByte)
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      ctx.setLevel(3).setChecksum(true)
      val frame = ctx.compress(content)
      val row = ZstdMetaKernel.parse(frame)
      assert(row != null && row.getBoolean(0), "real zstd frame rejected")
      assert(row.getLong(1) === 1L, "one frame")
      assert(row.getLong(6) >= 1L, "compressible content → compressed blocks")
      assert(row.getLong(7) === content.length.toLong,
        "uncompressed total through REAL libzstd inflate")
      assert(row.getLong(8) === 1L && row.getLong(9) === content.length.toLong,
        "libzstd declares FCS when the source size is known")
      assert(row.getBoolean(10), "size_match")
      assert(row.getLong(14) === 1L && row.getBoolean(15),
        "checksum written and verified")
      assert(row.getBoolean(16) && row.getBoolean(17), "clean verdicts")
      // flip the trailing checksum byte: the walk stays consistent,
      // the decode-side verification flags exactly the checksum
      val lied = frame.clone()
      lied(lied.length - 1) = (lied(lied.length - 1) ^ 0x5A).toByte
      val lrow = ZstdMetaKernel.parse(lied)
      assert(lrow != null && lrow.getBoolean(17), "walk still consistent")
      assert(!lrow.getBoolean(15), "checksum lie must be flagged")
      // no checksum + no flip: cheapest real-world shard shape
      val ctx2 = new com.github.luben.zstd.ZstdCompressCtx()
      try {
        ctx2.setLevel(1).setChecksum(false)
        val row2 = ZstdMetaKernel.parse(ctx2.compress(content))
        assert(row2.getLong(14) === 0L && row2.isNullAt(15),
          "no checksum → verdict null")
        assert(row2.getLong(7) === content.length.toLong)
      } finally ctx2.close()
    } finally ctx.close()
  }

  test("conformance: the synth's hand-built frames decode byte-exact through real libzstd") {
    def jniDecode(p: Array[Byte]): Array[Byte] = {
      val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
        new java.io.ByteArrayInputStream(p))
      val out = new java.io.ByteArrayOutputStream()
      try {
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      out.toByteArray
    }
    var decoded = 0
    for (d <- 1L to 60L
         if d % 10 != 0 && d % 20 != 9 && !lanes(d).exists(_.dict)) {
      assert(java.util.Arrays.equals(
        jniDecode(ZstdMetaSynthKernel.synth(d)), expectedContent(d)),
        s"d=$d: libzstd decode of the hand-built stream")
      decoded += 1
    }
    assert(decoded >= 20, "dict-free lane coverage")
    // a REAL format property, pinned: libzstd refuses a frame that
    // declares a dictionary ID without that dictionary — regardless
    // of block types — while the triage walk still reconstructs the
    // raw/RLE content and reports the dict_id so a pipeline can go
    // fetch it (the synth's (d+i)%6==4 lane exists for exactly that)
    val dictDoc = (1L to 60L).find(d =>
      d % 10 != 0 && d % 20 != 9 && lanes(d).exists(_.dict)).get
    intercept[java.io.IOException] {
      jniDecode(ZstdMetaSynthKernel.synth(dictDoc))
    }
    val row = ZstdMetaKernel.parse(ZstdMetaSynthKernel.synth(dictDoc))
    assert(row.getLong(13) === 1 + dictDoc % 255 && row.getBoolean(17),
      "triage walks the dict frame libzstd refuses")
  }

  test("never-throw: truncation, garbage behind both magics, flipped-checksum lane") {
    val full = ZstdMetaSynthKernel.synth(23L) // skippable-prefix doc
    for (cut <- 0 until full.length) {
      val r = ZstdMetaKernel.parse(java.util.Arrays.copyOf(full, cut))
      // frame boundaries are valid shorter files (the Avro lesson)
      if (r != null && r.getBoolean(17))
        assert(r.getLong(1) + r.getLong(2) < 4L, s"cut $cut fully consistent")
    }
    val rnd = new scala.util.Random(19)
    for (k <- 0 until 300) {
      val g = new Array[Byte](8 + rnd.nextInt(300))
      rnd.nextBytes(g)
      if (k % 2 == 0) {
        g(0) = 0x28; g(1) = 0xB5.toByte; g(2) = 0x2F; g(3) = 0xFD.toByte
      } else {
        g(0) = 0x50; g(1) = 0x2A; g(2) = 0x4D; g(3) = 0x18
      }
      ZstdMetaKernel.parse(g)
    }
    // the flipped-checksum lane parses with exactly one red verdict
    val flipped = ZstdMetaKernel.parse(ZstdMetaSynthKernel.synth(9L))
    assert(flipped.getBoolean(17) && !flipped.getBoolean(15))
    assert(ZstdMetaKernel.parse("plain text, no magic".getBytes) == null)
  }

  test("driver-row shape: Binary.Zstd over the docs synth") {
    import graft.multimodal.Binary
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 40)
    val parsed = Binary.Zstd.parse(Binary.Zstd.synthFromDocs(docs))
    val rows = parsed.select("doc_id", "zstd_valid", "n_frames",
      "uncompressed_bytes", "checksum_ok", "header_consistent").collect()
    assert(rows.length === 40)
    rows.foreach { r =>
      val d = r.getLong(0)
      if (d % 10 == 0) assert(!r.getBoolean(1), s"d=$d text lane")
      else {
        assert(r.getBoolean(1), s"d=$d valid")
        assert(r.getLong(2) === 1 + d % 3, s"d=$d frames")
        assert(r.getBoolean(4) === (d % 20 != 9), s"d=$d checksum")
        assert(r.getBoolean(5), s"d=$d consistent")
      }
    }
  }
}
