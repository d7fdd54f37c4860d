package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Specs for the round-8 corpus-signal operators: char entropy,
  * compressibility, stratified sampling, and best-copy dedup.
  */
class TextSignalsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  // ---- charEntropy ----

  test("charEntropy: uniform power-of-two alphabets are bit-exact; degenerate text is 0") {
    // p = 2^-k makes DetLn exact (k·LN2 + 0), so uniform alphabets of
    // size 2^k yield entropy EXACTLY k bits — no tolerance needed
    val d = docs((1L, "aaaaaaaa", "s"), (2L, "abababab", "s"),
      (3L, "abcdabcd", "s"), (4L, "abcdefgh", "s"))
    val byId = TextAnalysis.charEntropy(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(byId(1L) === ((8L, 1L, -0.0)) || byId(1L) === ((8L, 1L, 0.0)))
    assert(byId(2L)._3 === 1.0)
    assert(byId(3L)._3 === 2.0)
    assert(byId(4L)._3 === 3.0)
  }

  test("charEntropy: matches a driver-side Math.log recount on real corpus docs") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val got = TextAnalysis.charEntropy(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val texts = d.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (id, (n, nd, ent)) =>
      val cs = texts(id).toCharArray
      val freq = cs.groupBy(identity).map { case (c, a) => c -> a.length }
      assert(n === cs.length.toLong)
      assert(nd === freq.size.toLong)
      val expect = -freq.values.map { c =>
        val p = c.toDouble / cs.length
        p * math.log(p)
      }.sum / math.log(2.0)
      // DetLn agrees with libm to ~1e-12 relative; fold order differs
      assert(math.abs(ent - expect) < 1e-9,
        s"doc $id entropy $ent != $expect")
    }
  }

  // ---- compressionStats ----

  test("compressionStats: repetitive text compresses below prose; sizes match a JVM recount") {
    val rep = "lorem ipsum " * 100
    val prose = (1 to 120).map(i => s"w${i * 2654435761L % 9973}x$i").mkString(" ")
    val d = docs((1L, rep, "s"), (2L, prose, "s"))
    val r = TextAnalysis.compressionStats(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    // exact recount through the same kernel contract: fixed-level raw deflate
    def jvmSize(s: String): Long = {
      val dfl = new java.util.zip.Deflater(graft.expressions.DeflateKernel.Level, true)
      dfl.setInput(s.getBytes("UTF-8")); dfl.finish()
      val buf = new Array[Byte](1 << 16)
      var t = 0L
      while (!dfl.finished()) t += dfl.deflate(buf)
      dfl.end(); t
    }
    assert(r(1L)._1 === rep.getBytes("UTF-8").length.toLong)
    assert(r(1L)._2 === jvmSize(rep))
    assert(r(2L)._2 === jvmSize(prose))
    // separation: the repeated phrase compresses at least 4x better
    assert(r(1L)._3 * 4 < r(2L)._3,
      s"no compressibility separation: rep=${r(1L)._3} prose=${r(2L)._3}")
    // determinism: a second run returns identical bytes
    val r2 = TextAnalysis.compressionStats(d).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r2(1L) === r(1L)._2 && r2(2L) === r(2L)._2)
  }

  // ---- stratifiedSample ----

  test("stratifiedSample: exactly k per stratum, rank = ascending hash, stable under repartition") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val k = 7
    val got = graft.ops.Sampling.stratifiedSample(d, col("doc_id"), k)
    val rows = got.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every stratum with >= k docs contributes exactly k rows
    val perSource = d.groupBy("source").count().as[(String, Long)].collect().toMap
    val gotPer = rows.groupBy(_._1).view.mapValues(_.length).toMap
    perSource.foreach { case (s, n) =>
      assert(gotPer.getOrElse(s, 0) === math.min(n, k.toLong).toInt,
        s"source $s: expected ${math.min(n, k.toLong)} picks")
    }
    // membership matches an independent window-rank recompute
    val expect = d
      .withColumn("h", pmod(GraftFunctions.hex64(concat(lit("strat|"), col("doc_id").cast("string"))),
        lit(graft.ops.Sampling.StratModulus)))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= k)
      .select(col("source"), col("rn").cast("long"), col("doc_id"), col("h"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(rows.toSet === expect)
    // partitioning must not change membership
    val reparted = graft.ops.Sampling.stratifiedSample(d.repartition(13), col("doc_id"), k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(reparted === rows.toSet)
  }

  // ---- keepBest ----

  test("keepBest: one keeper per group, keeper is the quality argmax, groups match exact()") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val kb = Dedup.keepBest(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    // group structure (fingerprint, group_size) must agree with exact()
    val ex = Dedup.exact(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    kb.foreach { case (id, fp, _, gs, _, _) =>
      assert(ex(id) === ((fp, gs)), s"doc $id group drifted from exact()")
    }
    // exactly one keeper per fingerprint, and every member points at it
    kb.groupBy(_._2).foreach { case (fp, members) =>
      val keepers = members.filter(_._6)
      assert(keepers.length === 1, s"group $fp has ${keepers.length} keepers")
      val k = keepers.head
      assert(members.forall(_._5 === k._1), s"group $fp keeper_id mismatch")
      // argmax: no member beats the keeper on (quality, -doc_id)
      members.foreach { m =>
        assert(m._3 < k._3 || (m._3 === k._3 && m._1 >= k._1),
          s"group $fp: member ${m._1} (q=${m._3}) beats keeper ${k._1} (q=${k._3})")
      }
    }
    // quality values are the shared TextAnalysis.quality scores
    val q = TextAnalysis.quality(d).select("doc_id", "quality_score")
      .as[(Long, Double)].collect().toMap
    kb.foreach { case (id, _, qs, _, _, _) => assert(q(id) === qs) }
  }

  test("nearDupKeepBest: keeper is the quality argmax of each near-dup cluster") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Dedup.nearDupKeepBest(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    // cluster structure must agree with nearDupClusters
    val clusters = Dedup.nearDupClusters(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.length === clusters.size)
    got.foreach { case (id, cid, _, _, _, _) => assert(clusters(id) === cid) }
    // exactly one keeper per cluster; keeper is the (quality, -id) argmax
    got.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.count(_._6) === 1, s"cluster $cid keeper count")
      val k = members.filter(_._6).head
      assert(members.forall(_._4 === members.length.toLong))
      members.foreach { m =>
        assert(m._5 === k._1)
        assert(m._3 < k._3 || (m._3 === k._3 && m._1 >= k._1),
          s"cluster $cid: ${m._1} beats keeper ${k._1}")
      }
    }
    // at least one non-trivial cluster exists at this SF, else the
    // argmax is vacuous
    assert(got.exists(_._4 > 1), "no multi-doc near-dup cluster in corpus")
  }

  test("keepBest: planted tie goes to the lower doc_id; best copy wins over first copy") {
    // docs 1/2 identical tokens -> tie on quality, keeper = 1;
    // docs 10/11: same fingerprint (tokens equal after normalization)
    // but 11 has less punctuation noise -> higher quality, keeper = 11
    val d = docs(
      (1L, "alpha beta gamma", "s"), (2L, "alpha beta gamma", "s"),
      (10L, "one two three!!!!!!!!!!!!!!!!!!!!", "s"),
      (11L, "one two three", "s"))
    val kb = Dedup.keepBest(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    assert(kb(1L) === ((1L, true)) && kb(2L) === ((1L, false)))
    assert(kb(10L) === ((11L, false)) && kb(11L) === ((11L, true)))
  }

  test("sentences: terminator runs, trailing fragment, empty drops, provenance") {
    val d = docs(
      (1L, "One here. Two now!! Is it three? tail fragment", "s"),
      (2L, "no terminators at all", "s"),
      (3L, "!!!", "s"), // nothing but terminators: zero sentences
      (4L, "", "s"))
    val got = graft.text.TextAnalysis.sentences(d).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("sent_idx"))
        .map(_.getAs[String]("sentence")).toSeq).toMap
    assert(got(1L) === Seq("One here.", "Two now!!", "Is it three?",
      "tail fragment"), got.toString)
    assert(got(2L) === Seq("no terminators at all"))
    assert(!got.contains(3L) && !got.contains(4L))
    val r = graft.text.TextAnalysis.sentences(d)
      .where(col("doc_id") === 1L && col("sent_idx") === 1L).head()
    assert(r.getAs[Long]("n_chars") === 9L) // "Two now!!"
    assert(r.getAs[Long]("n_words") === 2L)
  }

  test("sentences: CJK terminators segment unspaced prose (the Unicode discipline)") {
    val d = docs(
      (1L, "これは文一。これは文二！最後か？", "s"),
      (2L, "Mixed latin. そして日本語。done", "s"))
    val got = graft.text.TextAnalysis.sentences(d).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("sent_idx"))
        .map(_.getAs[String]("sentence")).toSeq).toMap
    assert(got(1L) === Seq("これは文一。", "これは文二！", "最後か？"),
      s"unspaced CJK must segment on 。！？: ${got(1L)}")
    assert(got(2L) === Seq("Mixed latin.", "そして日本語。", "done"))
  }

  test("sentenceChunks: greedy fill respects the budget, never cuts a sentence, oversize keeps its own chunk") {
    val s60 = "x" * 60
    val d = docs(
      // 4 sentences of 61 chars: budget 200 fits three (61+1+61+1+61
      // = 185), the fourth starts chunk 2
      (1L, s"$s60. $s60. $s60. $s60.", "s"),
      // a lone sentence over the budget keeps one oversize chunk
      (2L, "y" * 300 + ".", "s"),
      (3L, "short one. short two.", "s"))
    val got = graft.text.TextAnalysis.sentenceChunks(d, maxChars = 200)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("chunk_idx"))
        .map(_.getAs[Long]("n_chunk_chars")).toSeq).toMap
    assert(got(1L) === Seq(185L, 61L), got.toString)
    assert(got(2L) === Seq(301L), "oversize sentence must not be cut")
    assert(got(3L) === Seq(21L), "both sentences fit one chunk")
    // parity: concatenating chunks with ' ' at the seams reproduces
    // exactly the sentence stream (no chars invented or lost)
    val chunksOf1 = graft.text.TextAnalysis
      .sentenceChunks(d.where(col("doc_id") === 1L), maxChars = 200)
    val totalChars = chunksOf1.collect().map(_.getAs[Long]("n_chunk_chars")).sum
    val sentChars = graft.text.TextAnalysis
      .sentences(d.where(col("doc_id") === 1L))
      .collect().map(_.getAs[Long]("n_chars")).sum
    // joins add one space per intra-chunk seam: 4 sentences, 2 chunks
    // -> 2 seams
    assert(totalChars === sentChars + 2)
  }
}
