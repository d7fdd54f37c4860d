package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Scale evidence for the corpus-pipeline operators at ~100× the bench
  * SF (500k docs): the narrow-signal scans (char entropy +
  * compressibility), fixed-k stratified sampling (measured against the
  * window-rank alternative it replaces), best-copy exact dedup with
  * planted quality ladders, and epoch-based domain mixing with the
  * realized mix checked against the formula.
  *
  * Every assertion is planted arithmetic — the synthetic corpus is
  * pure hash expressions, so expected values are exact (or
  * tolerance-bounded only where the hash gate itself is the mechanism).
  *
  * Run: `sbt "runMain graft.CorpusScaleSmoke [nDocs]"`.
  */
object CorpusScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- corpus: ~40 hash words per doc, 20 sources; every 1000th doc
    // degenerate (one repeated char — the filler the signal scans must
    // flag: entropy exactly 0, deeply compressible) ----
    val words = transform(sequence(lit(0), lit(39)),
      p => concat(lit("w"), hex(xxhash64(col("id"), p))))
    val degenerate = col("id") % 1000 === 0
    val docs = spark.range(n).toDF("id")
      .select(col("id").as("doc_id"),
        concat(lit("src"), pmod(col("id"), lit(20L))).as("source"),
        when(degenerate, concat_ws("", transform(sequence(lit(1), lit(240)), _ => lit("a"))))
          .otherwise(array_join(words, " ")).as("text"))
      .repartition(64).cache()
    docs.count() // materialize generation outside all timings

    // ---- rung 1: signal scans are narrow-map throughput ----
    val (entAgg, tEnt) = time {
      TextAnalysis.charEntropy(docs)
        .agg(sum("n_chars").as("chars"),
          sum(when(col("entropy_bits") === 0.0, 1L).otherwise(0L)).as("zeros"))
        .head()
    }
    val totalChars = entAgg.getLong(0)
    // exactly the planted degenerates (single distinct char ⇒ H = 0;
    // hash words make a 0-entropy collision impossible elsewhere)
    assert(entAgg.getLong(1) == (n + 999) / 1000,
      s"zero-entropy docs: ${entAgg.getLong(1)} != ${(n + 999) / 1000}")

    val (cmpRows, tCmp) = time {
      TextAnalysis.compressionStats(docs)
        .withColumn("degen", col("doc_id") % 1000 === 0)
        .groupBy(col("degen")).agg(avg(col("compress_ratio")).as("r"))
        .collect()
    }
    val ratios = cmpRows.map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // hex-hash words are a 17-char alphabet (~0.55 deflate ratio);
    // "a"*240 lands ~0.05 — an 8x gap with margin on both sides
    assert(ratios(true) * 8 < ratios(false),
      s"degenerate docs not 8x more compressible: $ratios")

    // ---- rung 2: stratified sample vs the window-rank alternative ----
    val k = 25
    val (topkRows, tTopk) = time {
      graft.ops.Sampling.stratifiedSample(docs, col("doc_id"), k).collect()
    }
    assert(topkRows.length == 20 * k, s"picks: ${topkRows.length}")
    val (windowRows, tWindow) = time {
      val h = pmod(GraftFunctions.hex64(concat(lit("strat|"), col("doc_id").cast("string"))),
        lit(graft.ops.Sampling.StratModulus))
      docs.select(col("source"), col("doc_id"), h.as("sample_key"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
            .orderBy(col("sample_key"), col("doc_id"))).cast("long"))
        .filter(col("rn") <= k)
        .select(col("source"), col("rn"), col("doc_id"), col("sample_key"))
        .collect()
    }
    assert(topkRows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      windowRows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet,
      "reservoir picks != window-rank picks")
    // ---- rung 3: best-copy dedup with a planted quality ladder ----
    // 10 docs per group share tokens; id%10 trailing bangs lower the
    // quality monotonically, so the keeper is exactly the bang-free doc
    val gwords = transform(sequence(lit(0), lit(29)),
      p => concat(lit("g"), hex(xxhash64(col("id") - pmod(col("id"), lit(10L)), p))))
    val bangs = concat_ws("", transform(sequence(lit(0), pmod(col("id"), lit(10L)).cast("int")),
      _ => lit("!")))
    val dupDocs = spark.range(n).toDF("id")
      .select(col("id").as("doc_id"),
        concat(array_join(gwords, " "), lit(" "), bangs).as("text"))
      .repartition(64).cache()
    dupDocs.count()
    val (kbAgg, tKb) = time {
      Dedup.keepBest(dupDocs)
        .agg(count(lit(1)).as("rows"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("keepers"),
          sum(when(col("keeper_id") === col("doc_id") - pmod(col("doc_id"), lit(10L)), 0L)
            .otherwise(1L)).as("wrong"),
          countDistinct(col("fingerprint")).as("groups"))
        .head()
    }
    assert(kbAgg.getLong(0) == n && kbAgg.getLong(1) == n / 10 &&
      kbAgg.getLong(2) == 0 && kbAgg.getLong(3) == n / 10,
      s"keepBest planted arithmetic: $kbAgg")

    // ---- rung 3b: ONE giant group — the adversarial skew case ----
    // every doc shares the same token set, so the whole 2n-doc corpus
    // is a single fingerprint group (round-8 verdict #3: the former
    // window form buffered it on one task). The argmax must finish
    // through map-side partials; the keeper is the bang-minimal
    // lowest-id doc (doc 0) — exact planted arithmetic.
    val gN = 2L * n
    val cwords = array_join(transform(sequence(lit(0), lit(29)),
      p => concat(lit("c"), hex(xxhash64(lit(7L), p)))), " ")
    val gBangs = concat_ws("", transform(
      sequence(lit(0), pmod(col("id"), lit(10L)).cast("int")), _ => lit("!")))
    val giant = spark.range(gN).toDF("id")
      .select(col("id").as("doc_id"), concat(cwords, lit(" "), gBangs).as("text"))
      .repartition(64).cache()
    giant.count()
    val (gAgg, tGiant) = time {
      Dedup.keepBest(giant)
        .agg(count(lit(1)).as("rows"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("keepers"),
          countDistinct(col("fingerprint")).as("groups"),
          max(col("keeper_id")).as("max_keeper"))
        .head()
    }
    assert(gAgg.getLong(0) == gN && gAgg.getLong(1) == 1L &&
      gAgg.getLong(2) == 1L && gAgg.getLong(3) == 0L,
      s"giant-group keepBest arithmetic: $gAgg")

    // ---- rung 3c: sequence packing of ONE mega-source ----
    // all 2n docs in a single source — the case the former per-source
    // window serialized on one task; the distributed prefix sum must
    // pack it in parallel. Invariant: the last doc's bin_id follows
    // the corpus-total prefix exactly.
    val (packStats, tPack) = time {
      val packed = graft.ops.Packing.packSequences(
        giant.withColumn("source", lit("s0")), budget = 256L)
      val a = packed.agg(count(lit(1)).as("rows"), sum(col("n_tokens")).as("tot")).head()
      val last = packed.orderBy(col("doc_id").desc).limit(1).head()
      (a.getLong(0), a.getLong(1), last.getAs[Long]("n_tokens"),
        last.getAs[Long]("bin_id"), last.getAs[Long]("bin_offset"))
    }
    val (pRows, pTot, pLastN, pLastBin, pLastOff) = packStats
    assert(pRows == gN, s"mega-source pack row count: $pRows != $gN")
    assert(pLastBin == (pTot - pLastN) / 256L && pLastOff == (pTot - pLastN) % 256L,
      s"mega-source pack prefix arithmetic: $packStats")
    giant.unpersist(false)

    // ---- rung 4: epoch mix — realized counts vs the formula ----
    val (mixCounts, tMix) = time {
      graft.ops.Sampling.epochMix(docs, col("doc_id"))
        .groupBy(col("source")).agg(count(lit(1)).as("out"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val inCounts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val coefs = graft.ops.Sampling.mixCoefs(
      graft.ops.Sampling.defaultMixWeights, 1.0).toMap
    val bigN = inCounts.values.sum
    coefs.foreach { case (s, c) =>
      val target = c * bigN
      val got = mixCounts.getOrElse(s, 0L).toDouble
      // the fractional copy is a granularity-10000 hash gate: realized
      // mass is within gate quantization + hash dispersion of target
      assert(math.abs(got - target) <= target * 0.05 + 50,
        s"source $s: realized $got vs target $target")
    }

    // ---- rung 5 (LAST — its 20×n skinny frame evicts the doc cache):
    // the hot-stratum case is where the sampling shapes diverge: ONE
    // stratum holding every row means the window rank must move the
    // WHOLE population into a single partition and sort it there (at
    // real scale that partition simply doesn't fit an executor), while
    // the bounded top-k still partial-aggregates to k rows/partition —
    // wall clock at local[32] understates the gap; the structural
    // bound is plan-asserted in PlanContractSpec
    val hotN = 20L * n
    val hot = spark.range(hotN).toDF("doc_id")
      .withColumn("source", lit("all")).repartition(64)
    val (hotTopk, tHotTopk) = time {
      graft.ops.Sampling.stratifiedSample(hot, col("doc_id"), k).collect()
    }
    val (hotWin, tHotWindow) = time {
      val h = pmod(GraftFunctions.hex64(concat(lit("strat|"), col("doc_id").cast("string"))),
        lit(graft.ops.Sampling.StratModulus))
      hot.select(col("source"), col("doc_id"), h.as("sample_key"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
            .orderBy(col("sample_key"), col("doc_id"))).cast("long"))
        .filter(col("rn") <= k)
        .collect()
    }
    assert(hotTopk.map(_.getLong(2)).toSet ==
      hotWin.map(_.getAs[Long]("doc_id")).toSet,
      "hot-stratum picks differ")

    // ---- rung 6: DSIR importance resampling — the real use case:
    // labeled target docs (lang=en, vocab A), UNLABELED look-alikes
    // (lang=xx, same vocab A), and off-target mass (vocab B). The llr
    // model fitted on the en labels must pull the unlabeled
    // look-alikes into the resample: that transfer IS the algorithm.
    val vocabA = array_join(transform(sequence(lit(0), lit(39)),
      p => concat(lit("a"), pmod(xxhash64(col("id"), p), lit(1000L)))), " ")
    val vocabB = array_join(transform(sequence(lit(0), lit(39)),
      p => concat(lit("b"), pmod(xxhash64(col("id"), p), lit(1000L)))), " ")
    val dsirDocs = spark.range(n).toDF("id")
      .select(col("id").as("doc_id"),
        concat(lit("src"), pmod(col("id"), lit(20L))).as("source"),
        when(col("id") % 4 === 0, lit("en")).otherwise(lit("xx")).as("lang"),
        when(col("id") % 4 <= 1, vocabA).otherwise(vocabB).as("text"))
      .repartition(64).cache()
    dsirDocs.count()
    // the fitted model is cached (2^11 rows — what saveLlr would
    // persist) so the serving timing measures serving, not a refit
    val (llrDf, tFit) = time {
      val l = graft.text.Dsir.fitLlr(dsirDocs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      l.count(); l
    }
    val (dsirAgg, tWeigh) = time {
      graft.text.Dsir.importanceResampleOnLlr(dsirDocs, llrDf, k = 1000)
        .withColumn("cls", when(col("doc_id") % 4 === 0, "tgt")
          .when(col("doc_id") % 4 === 1, "lookalike").otherwise("off"))
        .groupBy(col("cls"))
        .agg(avg(col("weight_fp")).as("w"),
          sum(when(col("selected"), 1L).otherwise(0L)).as("sel"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    }
    // unlabeled look-alikes score like the target (same vocabulary),
    // far above off-target mass; the resample is ≥90% vocab-A docs
    assert(dsirAgg("lookalike")._1 > dsirAgg("off")._1 + 1e6,
      s"dsir look-alike transfer: $dsirAgg")
    assert(dsirAgg("tgt")._2 + dsirAgg("lookalike")._2 >= 900,
      s"dsir selection purity: $dsirAgg")
    llrDf.unpersist(false)
    dsirDocs.unpersist(false)

    // ---- rung: PCA sufficient statistics at scale — one narrow pass
    // over n vectors, shuffle bounded at #partitions × d(d+1)/2
    // doubles regardless of n; planted dominant axis recovered ----
    val dDim = 64
    val uRaw = Array.tabulate(dDim)(i => if (i % 5 == 0) 1.0 else 0.1)
    val uNorm = math.sqrt(uRaw.map(x => x * x).sum)
    val u = uRaw.map(_ / uNorm)
    val uLit = typedlit(u.toSeq)
    val signal = ((col("id") % 1001).cast("double") - 500.0) / 100.0
    val vecs = spark.range(n).toDF("id")
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dDim - 1)), i =>
          (signal * element_at(uLit, i + 1) +
            pmod(xxhash64(col("id"), i), lit(1000L)).cast("double") / 50000.0)
            .cast("float")).as("embedding"))
      .repartition(64)
    val (pcaModel, tPca) = time { graft.ann.Pca.fit(vecs, dDim, 4) }
    val cosPca = math.abs(pcaModel.components(0).zip(u)
      .map { case (a, b) => a * b }.sum)
    assert(cosPca > 0.999, s"pca planted axis not recovered: |cos| = $cosPca")
    assert(pcaModel.eigenvalues(0) > 100 * pcaModel.eigenvalues(1),
      s"planted dominance lost: ${pcaModel.eigenvalues.take(2).toSeq}")

    // ---- rung: sketch-tier profiler — one pass, HLL distincts ----
    val (prof, tProf) = time {
      graft.ops.Profile.profile(docs, exact = false).collect()
        .map(r => r.getAs[String]("column") -> r).toMap
    }
    assert(prof("doc_id").getAs[Long]("n_rows") == n)
    assert(prof("doc_id").getAs[Long]("n_null") == 0L)
    // default approx_count_distinct rsd is 5% (1σ) — bound at 2σ
    val approxIds = prof("doc_id").getAs[Long]("n_distinct")
    assert(math.abs(approxIds - n) < n / 10,
      s"doc_id HLL distinct $approxIds vs $n")

    // ---- rung: selective phrase over ~20M positional postings —
    // postings explode map-side, the 3-term phrase broadcast prunes
    // everything else before the one vote-key shuffle ----
    val phrase = graft.text.TextAnalysis.cannedPhrases(docs, 2)
      .filter(col("phrase_id") === 1L)
    val (hits, tPhrase) = time {
      graft.text.TextAnalysis.phraseSearch(docs, phrase).collect()
    }
    // hash words are unique per doc: doc 1's own 3-gram matches doc 1
    // exactly once and nothing else
    assert(hits.length == 1 && hits.head.getAs[Long]("doc_id") == 1L &&
      hits.head.getAs[Long]("n_occurrences") == 1L,
      s"phrase rung: ${hits.toSeq}")

    // ---- rung: hybrid RRF retrieval at corpus scale, split into the
    // production phases: the BM25 postings index builds ONCE (the
    // expensive part — this synthetic corpus has ~20M DISTINCT tokens,
    // the worst case for an inverted index), then serving fuses the
    // index-pruned lexical ranks with the one-linear-pass semantic
    // side; a 3-term query unique to ONE planted doc must surface it
    // at fused rank 1 ----
    val probeTerms = docs.filter(col("doc_id") === 42L)
      .select(graft.GraftFunctions.tokens(col("text"))).head()
      .getSeq[String](0).take(3)
    val (idx, tHybridBuild) = time {
      graft.text.SearchIndex.save(docs, "graft_smoke_hybrid_idx",
        path = Some(java.nio.file.Files.createTempDirectory("smoke_hyb").toString + "/t"))
      graft.text.SearchIndex.load(spark, "graft_smoke_hybrid_idx")
    }
    val (fused, tHybrid) = time {
      graft.text.TextAnalysis.hybridSearchTopKOnIndex(idx, docs, probeTerms, k = 5)
        .collect()
    }
    assert(fused.head.getAs[Long]("doc_id") == 42L,
      s"hybrid rung: planted doc not fused top-1: ${fused.toSeq}")

    // ---- rung: hybrid with BOTH sides index-served — the semantic
    // side probes a persisted IVF over the hash-embed vectors instead
    // of scanning every corpus embedding per serve (the r10-flagged
    // linear side). Build = one hash-embed pass + the IVF
    // assign/write, one-time and amortized like the postings index;
    // the serve touches nProbe cells (~nProbe/nCells of the corpus).
    // Fused-list agreement vs the exact form is measured through
    // Knn.recallEval — the SAME operator a production deployment
    // tracks its index tuning by. ----
    val nCells = 512
    val (annIdx, tAnnBuild) = time {
      val vecs = graft.text.TextAnalysis.hashEmbedVectors(docs)
        .select(col("doc_id").as("vec_id"), col("embedding"))
      val step = math.max(n / nCells, 1).toLong
      graft.ann.Ivf.saveIndex(vecs, vecs.filter(col("vec_id") % step === 0),
        "graft_smoke_hybrid_ann",
        path = Some(java.nio.file.Files
          .createTempDirectory("smoke_hyb_ann").toString + "/t"))
      graft.ann.Ivf.loadIndex(spark, "graft_smoke_hybrid_ann")
    }
    val (fusedIdx, tHybridIdx) = time {
      graft.text.TextAnalysis.hybridSearchTopKOnIndexes(idx, annIdx._1, annIdx._2,
        probeTerms, k = 5, nProbe = 32).collect()
    }
    assert(fusedIdx.head.getAs[Long]("doc_id") == 42L,
      s"hybrid-indexed rung: planted doc not fused top-1: ${fusedIdx.toSeq}")
    val fusedRecall = {
      import spark.implicits._
      val got = fusedIdx.map(r => (0L, r.getAs[Long]("doc_id"))).toSeq
        .toDF("q_id", "cand_id")
      val truth = fused.map(r => (0L, r.getAs[Long]("doc_id"))).toSeq
        .toDF("q_id", "cand_id")
      graft.ann.Knn.recallEval(got, truth)
        .agg(avg(col("recall"))).head().getDouble(0)
    }

    // ---- rung: BATCH hybrid serving from the SAME at-rest indexes —
    // an 8-query frame pays ONE postings pass + ONE IVF probe pass,
    // so per-query cost amortizes well below the single-query serve;
    // the planted doc must still fuse top-1 for its query ----
    val (fusedBatch, tHybridBatch) = time {
      import spark.implicits._
      val batchQs = (probeTerms.map(t => (0L, t)) ++
        Seq((1L, "w7a"), (1L, "w7b"), (2L, "w13c"), (2L, "w13d"),
          (3L, "w21a"), (4L, "w33b"), (5L, "w47c"), (6L, "w55a"),
          (7L, "w61b"))).toDF("query_id", "token")
      graft.text.TextAnalysis.hybridSearchBatchOnIndexes(idx, annIdx._1,
        annIdx._2, batchQs, k = 5, nProbe = 32).collect()
    }
    val q0Top = fusedBatch.filter(_.getAs[Long]("query_id") == 0L)
      .minBy(_.getAs[Long]("rn"))
    assert(q0Top.getAs[Long]("doc_id") == 42L,
      s"batch hybrid rung: planted doc not fused top-1 for query 0: $q0Top")
    assert(fusedBatch.map(_.getAs[Long]("query_id")).distinct.length >= 1)

    // ---- rung: URL curation at corpus scale — parse/canonicalize/
    // blocklists map-side (array-literal blocklists, no joins), the
    // per-domain quota a bounded top-k aggregate, canonical-URL dedup
    // a min-keeper partial agg; planted counts are exact ----
    val (curAgg, tCurate) = time {
      val k = expr("(doc_id div 2) * 2")
      val withUrl = graft.ops.Curation.synthUrls(docs, key = k,
        sourceOf = Some(concat(lit("src"), pmod(k, lit(20L)).cast("string"))))
      val cur = graft.ops.Curation.curateCorpus(withUrl, col("url"),
        blockedDomains = Seq("src0.com", "src1.org", "src2.net"),
        // the degenerate docs' single repeated-char token is the only
        // corpus-wide repeated word — the wordlist rung flags exactly them
        blockedTerms = Seq("a" * 240), quota = 1000, maxHits = 0)
      val agg = cur.agg(count(lit(1)).as("n"),
        sum(when(col("url_keep"), 1L).otherwise(0L)).as("url_keepers"),
        sum(when(col("domain_blocked"), 1L).otherwise(0L)).as("blocked"),
        sum(when(!col("content_keep"), 1L).otherwise(0L)).as("content_flagged"))
        .head()
      cur.unpersist()
      agg
    }
    assert(curAgg.getAs[Long]("n") == n, s"curation lost rows: $curAgg")
    // doc pairs share a canonical URL → exactly one keeper per pair
    assert(curAgg.getAs[Long]("url_keepers") == (n + 1L) / 2,
      s"canonical-URL keepers: $curAgg")
    assert(curAgg.getAs[Long]("content_flagged") == (n + 999) / 1000,
      s"wordlist must flag exactly the degenerate docs: $curAgg")
    assert(curAgg.getAs[Long]("blocked") > 0 && curAgg.getAs[Long]("blocked") < n / 10,
      s"blocked-domain count implausible: $curAgg")

    // ---- rung: line-level boilerplate strip — one line explode, one
    // (source, line-hash) partial count, positional reassembly; the
    // planted header is shared by a source's ~n/20 docs, the footer by
    // every doc, the body is unique — counts are exact ----
    val (bpAgg, tBoiler) = time {
      val bp = graft.text.Boilerplate.stripBoilerplate(
        graft.text.Boilerplate.synthBoilerplate(docs), col("source"), minDf = 5)
      val agg = bp.agg(count(lit(1)).as("n"),
        sum(col("n_boiler_removed")).as("removed"),
        sum(when(col("clean_text") === "", 1L).otherwise(0L)).as("emptied"))
        .head()
      agg
    }
    assert(bpAgg.getAs[Long]("n") == n, s"boilerplate lost docs: $bpAgg")
    // every doc sheds NAV + FOOTER; every 3rd also sheds PROMO; and
    // the degenerate filler docs (all 'a'×240, all in src0 since
    // 1000 ≡ 0 mod 20) have IDENTICAL bodies — which really are
    // boilerplate (df = n/1000 ≥ minDf), so they strip too and those
    // pages empty: exactly what the stage exists to do to filler
    val nDegen = (n + 999) / 1000
    val expectRemoved = 2L * n + (n + 2) / 3 + nDegen
    assert(bpAgg.getAs[Long]("removed") == expectRemoved,
      s"boilerplate removals off: $bpAgg (expect $expectRemoved)")
    assert(bpAgg.getAs[Long]("emptied") == nDegen,
      s"exactly the degenerate filler pages must empty: $bpAgg")

    // ---- rung: sample-level PCM decode throughput — synth WAVs over
    // the corpus (data chunk = text bytes), decode EVERY payload's
    // samples map-side; the degenerate docs ('a'×240) have a known
    // constant sample stream, so their stats recount exactly ----
    val (wavAgg, tWavDecode) = time {
      val ws = graft.multimodal.Binary.Wav.sampleStats(
        graft.multimodal.Binary.Wav.synthFromDocs(docs))
      ws.agg(count(lit(1)).as("n"),
        sum(when(col("n_samples").isNotNull, col("n_samples"))).as("samples"),
        // every valid doc decodes: invalid ↔ every 10th (raw text)
        sum(when(col("n_samples").isNull, 1L).otherwise(0L)).as("undecoded"))
        .head()
    }
    assert(wavAgg.getAs[Long]("n") == n, s"wav decode lost rows: $wavAgg")
    assert(wavAgg.getAs[Long]("undecoded") == (n + 9) / 10,
      s"exactly the planted invalid docs must not decode: $wavAgg")
    assert(wavAgg.getAs[Long]("samples") > 50L * n,
      s"decoded sample volume implausibly low: $wavAgg")

    // ---- rung: A-Res weighted sampling — one TakeOrdered pass over
    // per-row keys; membership a pure hash function, no shuffle beyond
    // the bounded top-k ----
    val (ws, tWs) = time {
      graft.ops.Sampling.weightedSample(docs, col("doc_id"),
        length(col("text")) + 1, k = 1000).collect()
    }
    assert(ws.length == 1000 && ws.forall(_.getAs[Double]("weight") > 0))

    // ---- rung: Unicode token kernel at corpus scale — every 3rd doc
    // gains a non-Latin tail (the r11 blind spot: the legacy ASCII
    // regex tokenized those scripts to zero). The kernel must (a) gain
    // tokens on EXACTLY the tailed docs, (b) match the legacy split
    // token-for-token on pure-ASCII docs, and (c) cost no more than
    // the two-regex legacy pipeline it replaced (one native pass —
    // expected faster; 1.5x is the hard non-regression bound) ----
    val (tokAgg, tUnicodeTok) = time {
      val tail = element_at(
        array(graft.text.TextAnalysis.MultilingualTails.map(lit(_)): _*),
        (pmod(col("doc_id"), lit(6L)) + 1).cast("int"))
      val mdocs = docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), tail))
          .otherwise(col("text")).as("text"))
      mdocs.select(col("doc_id"),
          size(GraftFunctions.tokens(col("text"))).as("n_kernel"))
        .agg(sum(col("n_kernel")).as("kernel_tokens")).head()
    }
    // expected per-tail (kernel − legacy) token deltas, computed
    // LOCALLY from the kernel itself and the legacy Java regex — an
    // independent recount the distributed pass must match doc-exactly
    val tailDeltas = graft.text.TextAnalysis.MultilingualTails.map { tl =>
      val kernelN = graft.expressions.UnicodeTokens(
          org.apache.spark.sql.catalyst.expressions.Literal(tl))
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(tl))
        .numElements().toLong
      val legacyN = tl.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty).toLong
      kernelN - legacyN
    }
    val (legAgg, tLegacyTok) = time {
      val tail = element_at(
        array(graft.text.TextAnalysis.MultilingualTails.map(lit(_)): _*),
        (pmod(col("doc_id"), lit(6L)) + 1).cast("int"))
      val mdocs = docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), tail))
          .otherwise(col("text")).as("text"))
      val legacy = filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")
      val expDelta = when(col("doc_id") % 3 =!= 0, lit(0L)).otherwise(
        element_at(array(tailDeltas.map(lit(_)): _*),
          (pmod(col("doc_id"), lit(6L)) + 1).cast("int")))
      mdocs.select(col("doc_id"), size(legacy).cast("long").as("n_legacy"),
          size(GraftFunctions.tokens(col("text"))).cast("long").as("n_kernel"),
          expDelta.as("exp_delta"))
        .agg(sum(col("n_legacy")).as("legacy_tokens"),
          sum(when(col("n_kernel") - col("n_legacy") =!= col("exp_delta"), 1L)
            .otherwise(0L)).as("mismatched")).head()
    }
    assert(legAgg.getAs[Long]("mismatched") == 0L,
      s"kernel-vs-legacy token deltas off the planted per-tail values: " +
        s"$legAgg (deltas=$tailDeltas)")
    assert(tokAgg.getAs[Long]("kernel_tokens") > 0L)
    assert(tUnicodeTok <= tLegacyTok * 1.5 + 2.0,
      f"unicode kernel slower than the legacy regex path: " +
        f"$tUnicodeTok%.1f s vs $tLegacyTok%.1f s")

    // ---- rung: industrial blocklist tier — a 100k-entry blocklist is
    // past the broadcast-theta regime (5*10^10 map-side comparisons at
    // this corpus); the equi-join tier explodes DISTINCT hosts into
    // label suffixes and hash-joins. Planted: two real entries block
    // their registered domains, 99,998 padding entries match nothing ----
    val (blkAgg, tBlocklist) = time {
      import spark.implicits._
      val parsed = graft.ops.Curation.withUrlParts(
        graft.ops.Curation.synthUrls(docs), col("url"))
      val bl = ((0 until 99998).map(i => s"pad$i.example") ++
        Seq("src0.com", "src1.org")).toDF("domain")
      val kept = graft.ops.Curation.dropBlocklisted(parsed, col("host"), bl)
      val phys = kept.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"),
        "industrial blocklist routed through a nested loop")
      val survivors = kept.count()
      val expectBlocked = parsed.filter(
        col("domain") === "src0.com" || col("domain") === "src1.org").count()
      (survivors, expectBlocked)
    }
    assert(blkAgg._1 == n - blkAgg._2,
      s"blocklist survivors ${blkAgg._1} != n - blocked ${n - blkAgg._2}")

    val mb = totalChars / 1e6
    println(s"""{"smoke":"corpus_scale","n_docs":$n,"corpus_mb":${mb.round},""" +
      f""""entropy_sec":$tEnt%.1f,"deflate_sec":$tCmp%.1f,""" +
      f""""stratified_topk_sec":$tTopk%.1f,"stratified_window_sec":$tWindow%.1f,""" +
      f""""hot_stratum_topk_sec":$tHotTopk%.1f,"hot_stratum_window_sec":$tHotWindow%.1f,""" +
      f""""keep_best_sec":$tKb%.1f,"giant_group_sec":$tGiant%.1f,""" +
      f""""mega_source_pack_sec":$tPack%.1f,"epoch_mix_sec":$tMix%.1f,""" +
      f""""dsir_fit_sec":$tFit%.1f,"dsir_resample_sec":$tWeigh%.1f,""" +
      f""""pca_fit_sec":$tPca%.1f,"profile_sketch_sec":$tProf%.1f,""" +
      f""""phrase_search_sec":$tPhrase%.1f,""" +
      f""""hybrid_index_build_sec":$tHybridBuild%.1f,""" +
      f""""hybrid_serve_sec":$tHybrid%.1f,""" +
      f""""hybrid_ann_build_sec":$tAnnBuild%.1f,""" +
      f""""hybrid_indexed_serve_sec":$tHybridIdx%.1f,""" +
      f""""hybrid_fused_recall":$fusedRecall%.2f,""" +
      f""""hybrid_batch8_serve_sec":$tHybridBatch%.1f,""" +
      f""""curate_sec":$tCurate%.1f,""" +
      f""""boilerplate_sec":$tBoiler%.1f,""" +
      f""""wav_decode_sec":$tWavDecode%.1f,""" +
      f""""unicode_tokens_sec":$tUnicodeTok%.1f,""" +
      f""""legacy_tokens_sec":$tLegacyTok%.1f,""" +
      f""""blocklist_100k_sec":$tBlocklist%.1f,""" +
      f""""weighted_sample_sec":$tWs%.1f}""")
    spark.stop()
  }
}
