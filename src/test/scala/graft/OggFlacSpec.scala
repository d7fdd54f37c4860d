package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{AudioHashKernel, FlacAudioKernel, FlacAudioSynthKernel, OggFlacKernel, OggFlacSynthKernel, OggMetaKernel}

/** Ogg-FLAC sample tier: page unwrap + packet reassembly composed
  * with the bare-FLAC frame decode. Round trips across the synth's
  * lane grid (the FLAC audio synth's coding lanes × frames-per-page
  * × the split-comment cross-page lane × both CRC-flip lanes),
  * hand-built pages for a >255-byte AUDIO packet spanning pages,
  * structural lies, the non-FLAC-codec refusal, cross-codec
  * fingerprint equality (WAV ↔ bare FLAC ↔ Ogg-FLAC), the
  * audioDedup driver shape, and never-throw sweeps. No Ogg muxer or
  * FLAC codec exists in the JDK — the documented conformance
  * posture: the closed-form oracle plus these spec-side streams.
  */
class OggFlacSpec extends SparkSpec {

  // closed-form mirror of the decoded sample stats (the
  // FlacAudioSynthKernel formulas — Ogg wrapping changes no sample)
  private def expected(d: Long): (Int, Int, Int, Long, Long, Long) = {
    val ch = (1 + d % 2).toInt
    val bps = if (d % 3 == 0) 8 else 16
    val m = if (bps == 8) 160L else 2000L
    val n = (96 + (d % 5) * 32).toInt
    var sum = 0L; var sumSq = 0L; var peak = 0L
    for (c <- 0 until ch; j <- 0 until n) {
      val v = if (j < 64) (d * 13 + c * 29) % m - m / 2
        else ((d + 1) * 31 + c * 17 + j * 7) % m - m / 2
      sum += v; sumSq += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
    }
    (ch, bps, n, sum, sumSq, peak)
  }

  test("round trips: every lane unwraps and decodes to the closed-form stats") {
    for (d <- 1L to 120L if d % 10 != 0) {
      val p = OggFlacSynthKernel.synth(d)
      val row = OggFlacKernel.stats(p)
      assert(row != null, s"d=$d: stats null")
      val (ch, bps, n, sum, sumSq, peak) = expected(d)
      val frames = (n + 63) / 64
      val fpp = (1 + d % 2).toInt
      val pages = 1 + (if (d % 5 == 4) 2 else 1) + (frames + fpp - 1) / fpp
      assert(row.getBoolean(0), s"d=$d: oggflac_valid")
      assert(row.getLong(1) === pages.toLong, s"d=$d: n_pages")
      assert(row.getBoolean(2) === (d % 20 != 7), s"d=$d: pages_crc_ok")
      assert(row.getBoolean(3), s"d=$d: decode_ok")
      assert(row.getLong(4) === ch.toLong, s"d=$d: channels")
      assert(row.getLong(5) === bps.toLong, s"d=$d: bps")
      assert(row.getLong(6) === frames.toLong, s"d=$d: n_frames")
      assert(row.getLong(7) === n.toLong, s"d=$d: n_samples")
      assert(row.getLong(8) === sum, s"d=$d: sum")
      assert(row.getLong(9) === sumSq, s"d=$d: sum_sq")
      assert(row.getLong(10) === peak, s"d=$d: peak")
      assert(row.getBoolean(11) === (d % 20 != 5), s"d=$d: frame_crc_ok")
      assert(row.getBoolean(12), s"d=$d: matches_streaminfo")
    }
  }

  test("unwrapped decode agrees with the bare-FLAC decode bit for bit") {
    for (d <- Seq(1L, 2L, 3L, 4L, 7L, 24L, 63L)) {
      val ogg = OggFlacKernel.stats(OggFlacSynthKernel.synth(d))
      val bare = FlacAudioKernel.stats(FlacAudioSynthKernel.synth(d))
      for ((oi, bi) <- Seq(4 -> 2, 5 -> 3, 6 -> 4, 7 -> 5, 8 -> 6, 9 -> 7, 10 -> 8))
        assert(ogg.getLong(oi) === bare.getLong(bi), s"d=$d field $oi")
      assert(ogg.getBoolean(11) === bare.getBoolean(9), s"d=$d frame crc")
    }
  }

  // hand-built page with a real CRC (the OggSpec helper)
  private def page(hdrType: Int, granule: Long, serial: Long, seq: Long,
      lacings: Array[Int], body: Array[Byte]): Array[Byte] = {
    val pg = new Array[Byte](27 + lacings.length + body.length)
    pg(0) = 'O'; pg(1) = 'g'; pg(2) = 'g'; pg(3) = 'S'
    pg(5) = hdrType.toByte
    for (k <- 0 until 8) pg(6 + k) = ((granule >>> (8 * k)) & 0xFF).toByte
    for (k <- 0 until 4) pg(14 + k) = ((serial >>> (8 * k)) & 0xFF).toByte
    for (k <- 0 until 4) pg(18 + k) = ((seq >>> (8 * k)) & 0xFF).toByte
    pg(26) = lacings.length.toByte
    for (i <- lacings.indices) pg(27 + i) = lacings(i).toByte
    System.arraycopy(body, 0, pg, 27 + lacings.length, body.length)
    val crc = OggMetaKernel.pageCrc(pg, 0, pg.length, 22)
    for (k <- 0 until 4) pg(22 + k) = ((crc >>> (8 * k)) & 0xFF).toByte
    pg
  }

  test("a >255-byte AUDIO packet spanning pages reassembles and decodes") {
    // pack ALL frames into ONE packet (the reassembled bare stream is
    // identical — frames are self-delimiting) and split it at the
    // 255-boundary across two pages with the continuation flag
    val d = 3L // 16-bit stereo, 192 samples → 3 frames, > 255 bytes total
    val (hdr, frames) = FlacAudioSynthKernel.synthParts(d)
    val big = frames.flatten.toArray
    assert(big.length > 255, "need a packet that must span pages")
    val p0pkt = Array[Byte](0x7F.toByte, 'F', 'L', 'A', 'C', 1, 0, 0, 0) ++ hdr
    val k = big.length / 255
    val cut = 255 * k
    val built =
      page(2, 0, 9, 0, Array(p0pkt.length), p0pkt) ++
      page(0, 0, 9, 1, Array.fill(k)(255), big.take(cut)) ++
      page(5, 192, 9, 2, Array(big.length - cut), big.drop(cut))
    val row = OggFlacKernel.stats(built)
    assert(row != null && row.getBoolean(0) && row.getBoolean(3),
      "split audio packet must decode")
    val bare = FlacAudioKernel.stats(hdr ++ big)
    assert(row.getLong(8) === bare.getLong(6), "sum")
    assert(row.getLong(9) === bare.getLong(7), "sum_sq")
    assert(row.getLong(7) === bare.getLong(5), "n_samples")
    // nHeaders = 0 here: zero declared header packets, frames start
    // at packet 1 — the skip arithmetic is exercised at both 0 and 1
  }

  test("structural lies: sequence gap breaks validity, not the walk") {
    val good = OggFlacSynthKernel.synth(2L)
    // corrupt the second page's sequence number field (bytes 18-21 of
    // that page) — find page 2's offset by walking lengths
    var at = 0
    var pageIdx = 0
    var secondAt = -1
    while (at + 27 <= good.length && secondAt < 0) {
      val nSegs = good(at + 26) & 0xFF
      var body = 0
      for (i <- 0 until nSegs) body += good(at + 27 + i) & 0xFF
      if (pageIdx == 1) secondAt = at
      at += 27 + nSegs + body
      pageIdx += 1
    }
    val bad = good.clone()
    bad(secondAt + 18) = 9 // sequence lie
    val row = OggFlacKernel.stats(bad)
    assert(row != null && !row.getBoolean(0),
      "sequence gap must fail oggflac_valid")
    assert(OggFlacKernel.ahash(bad) == null, "no fingerprint on damage")
  }

  test("non-FLAC Ogg codecs refuse the sample tier (triage's job)") {
    // OggSynthKernel codec lanes: d%3==0 vorbis, 1 opus — both null
    assert(OggFlacKernel.stats(graft.expressions.OggSynthKernel.synth(3L)) == null)
    assert(OggFlacKernel.stats(graft.expressions.OggSynthKernel.synth(4L)) == null)
    assert(OggFlacKernel.ahash(graft.expressions.OggSynthKernel.synth(3L)) == null)
    // non-Ogg bytes
    assert(OggFlacKernel.stats("not ogg at all".getBytes("UTF-8")) == null)
  }

  test("re-mux fingerprints identically to WAV and bare FLAC") {
    for (key <- Seq(0L, 2L, 14L, 96L, 1234L)) {
      val flacHash = FlacAudioKernel.ahash(
        FlacAudioSynthKernel.synthWindowed(key, 4))
      val oggHash = OggFlacKernel.ahash(
        OggFlacSynthKernel.synthWindowed(key, 4))
      assert(flacHash != null && oggHash != null, s"key $key: null hash")
      assert(flacHash.longValue() === oggHash.longValue(),
        s"key $key: cross-container fingerprint mismatch")
    }
  }

  test("audioDedup groups a WAV member with its Ogg-FLAC re-mux") {
    import graft.multimodal.Binary
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 40)
    val k = expr("(doc_id div 2) * 2")
    val wavM = Binary.Wav.synthWindowedFromDocs(docs, k)
      .select(col("doc_id"), col("payload").as("wp"))
    val oggM = Binary.Ogg.synthWindowedFromDocs(docs, k)
      .select(col("doc_id"), col("payload").as("op"))
    val media = wavM.join(oggM, Seq("doc_id"))
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, col("wp")).otherwise(col("op"))
          .as("payload"))
    val out = Binary.audioDedup(media)
      .select("doc_id", "audio_valid", "n_copies", "keeper_id", "is_canonical")
      .collect().map(r => r.getLong(0) -> r).toMap
    // docs 2 (WAV) and 3 (Ogg-FLAC) share key 2 — one group of 2
    assert(out(2L).getBoolean(1) && out(3L).getBoolean(1))
    assert(out(2L).getLong(2) === 2L && out(3L).getLong(2) === 2L)
    assert(out(2L).getLong(3) === 2L && out(3L).getLong(3) === 2L)
    assert(out(2L).getBoolean(4) && !out(3L).getBoolean(4))
  }

  test("truncation sweep never throws and never claims validity") {
    val full = OggFlacSynthKernel.synth(14L)
    for (cut <- 0 until full.length by 7) {
      val p = java.util.Arrays.copyOf(full, cut)
      val r = OggFlacKernel.stats(p)
      if (r != null)
        assert(!r.getBoolean(0) || !r.getBoolean(3) || cut == full.length,
          s"cut $cut cannot fully decode")
      OggFlacKernel.ahash(p) // never throws
    }
  }
}
