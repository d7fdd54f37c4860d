package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** End-to-end corpus cleaning — the composition a training-data
  * pipeline actually runs: per-document signals (quality score, exact-
  * duplicate keep flag, near-dup cluster keep flag) computed
  * independently over the corpus and combined into one keep decision.
  *
  * Signals are policy-combinable flags rather than sequential filters,
  * so each stage remains individually auditable (every document carries
  * all its reasons) and the three stages can run concurrently over the
  * same scan at 100 TB instead of serializing on each other's output.
  */
object Pipeline {

  /** Per-document cleaning decision:
    * (doc_id, quality_score, exact_keep, cluster_id, cluster_keep,
    * keep) where `keep = quality_score ≥ minQuality ∧ exact_keep ∧
    * cluster_keep`. The near-dup stage reuses the MinHash-LSH cluster
    * labels, so `cluster_keep` retains exactly one representative (the
    * min doc_id) per near-dup component.
    */
  def cleanCorpus(docs: DataFrame, minQuality: Double = 0.3,
      minJaccard: Double = 0.7): DataFrame = {
    // ONE corpus scan + ONE tokenize pass, cached: every stage's
    // withToks trusts the precomputed `toks` column instead of
    // re-reading the source and re-running the tokenizer (the honest
    // version of the "stages share one scan" claim above)
    val toked = docs.withColumn("toks", graft.GraftFunctions.tokens(col("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = TextAnalysis.quality(toked).select(col("doc_id"), col("quality_score"))
    val ex = Dedup.exact(toked).select(col("doc_id"), col("keep").as("exact_keep"))
    val clRaw = Dedup.nearDupClusters(toked, minJaccard) // owns its cache scope
    val cl = clRaw
      .select(col("doc_id"), col("cluster_id"), col("keep").as("cluster_keep"))
    Caching.materialized(
      q.join(ex, Seq("doc_id")).join(cl, Seq("doc_id"))
        .select(col("doc_id"), col("quality_score"), col("exact_keep"),
          col("cluster_id"), col("cluster_keep"),
          (col("quality_score") >= minQuality && col("exact_keep") && col("cluster_keep"))
            .as("keep"))) {
      clRaw.unpersist(false); toked.unpersist(false)
    }
  }

  /** FineWeb-style quality filter stack: the four per-document content
    * signals (heuristic quality score, Gopher rules, character
    * entropy, bigram repetition) computed over ONE cached tokenize
    * pass and combined into a keep decision with per-signal reasons —
    * every document carries WHY it was dropped, which is what makes a
    * 100 TB filtering run auditable (and the per-signal flags
    * re-weightable without recomputing the signals).
    *
    * `keep = gopher_pass ∧ quality ≥ minQuality ∧ entropy ≥ minEntropy
    * ∧ dup_bigram_frac ≤ maxDupBigram` (signals a doc is too short to
    * produce are passes, mirroring each signal's own gate). All four
    * signals are individually hash-exact chains, so the composition is
    * too.
    */
  def qualityEnsemble(docs: DataFrame, minQuality: Double = 0.3,
      minEntropy: Double = 2.0, maxDupBigram: Double = 0.5): DataFrame = {
    val toked = docs.withColumn("toks", graft.GraftFunctions.tokens(col("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = TextAnalysis.quality(toked).select(col("doc_id"), col("quality_score"))
    val g = TextAnalysis.gopherQuality(toked)
      .select(col("doc_id"), col("gopher_pass"))
    val e = TextAnalysis.charEntropy(toked)
      .select(col("doc_id"), col("entropy_bits"))
    val r = TextAnalysis.repetition(toked)
      .select(col("doc_id"), col("dup_bigram_frac"))
    val failQ = col("quality_score") < minQuality
    val failE = coalesce(col("entropy_bits") < minEntropy, lit(false))
    val failR = coalesce(col("dup_bigram_frac") > maxDupBigram, lit(false))
    Caching.materialized(
      q.join(g, Seq("doc_id"))
        .join(e, Seq("doc_id"), "left")
        .join(r, Seq("doc_id"), "left")
        .select(col("doc_id"), col("quality_score"), col("gopher_pass"),
          col("entropy_bits"), col("dup_bigram_frac"),
          failQ.as("fail_quality"), (!col("gopher_pass")).as("fail_gopher"),
          failE.as("fail_entropy"), failR.as("fail_repetition"),
          (col("gopher_pass") && !failQ && !failE && !failR).as("keep"))) {
      toked.unpersist(false)
    }
  }

  /** Raw-crawl curation end to end — the web-page face of
    * [[cleanCorpus]]: HTML→text extraction ([[graft.text.Html]]),
    * script routing ([[TextAnalysis.scriptProfile]]), heuristic
    * quality, and exact dedup over the EXTRACTED text, combined into
    * one auditable keep decision:
    *
    * `keep = text_ratio ≥ minTextRatio  (boilerplate-page gate)
    *       ∧ script_ratio ≥ minScriptRatio  (mixed-script spam gate;
    *         scriptless docs fail)
    *       ∧ quality_score ≥ minQuality ∧ dedup_keep`.
    *
    * Shape: extraction + tokenize is ONE cached narrow pass feeding
    * every stage (no stage re-reads raw HTML); the signal frames meet
    * on doc_id equi-joins (extraction/script/quality are per-doc maps,
    * dedup is the only keyed shuffle). Like every pipeline face the
    * flags stay policy-combinable — each document carries its reasons.
    */
  def webCurate(pages: DataFrame, minTextRatio: Double = 0.1,
      minScriptRatio: Double = 0.5, minQuality: Double = 0.3): DataFrame = {
    // extraction, script, quality are ALL narrow column compositions
    // over one pass (the with*Cols faces share expressions with the
    // standalone operators, so the flags cannot drift from the
    // individually-gated rows); exact dedup is the pipeline's ONLY
    // keyed shuffle, met by one equi-join on doc_id
    val signaled = webSignals(graft.text.Html.extract(pages, col("html")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d = Dedup.exact(signaled)
      .select(col("doc_id"), col("keep").as("dedup_keep"))
    Caching.materialized(
      signaled.select(col("doc_id"), col("text_ratio"), col("n_links"),
          col("dominant_script"), col("script_ratio"), col("quality_score"))
        .join(d, Seq("doc_id"))
        .select(col("doc_id"), col("text_ratio"), col("n_links"),
          col("dominant_script"), col("script_ratio"), col("quality_score"),
          col("dedup_keep"),
          (col("text_ratio") >= minTextRatio &&
            coalesce(col("script_ratio") >= minScriptRatio, lit(false)) &&
            col("quality_score") >= minQuality && col("dedup_keep"))
            .as("keep"))) {
      signaled.unpersist(false)
    }
  }

  /** The narrow signal battery over an extracted frame (doc_id, text,
    * text_ratio, …): tokenize + script columns + quality score, all
    * pure per-row projections — shared by [[webCurate]] and the
    * streaming face ([[graft.streaming.Streams.webCurateStream]]).
    */
  private[graft] def webSignals(extracted: DataFrame): DataFrame =
    TextAnalysis.withQualityScore(
      TextAnalysis.withScriptCols(
        extracted.withColumn("toks",
          graft.GraftFunctions.tokens(col("text")))))

  /** Crawl-to-crawl corpus DIFF: per document, whether it was added,
    * removed, changed, or unchanged between two corpus versions —
    * the audit every recurring ingest runs before reprocessing (only
    * `added ∪ changed` need the expensive pipeline; `removed` drives
    * retention/deletion bookkeeping). Content identity is the dedup
    * family's normalized-token fingerprint, so whitespace/casing
    * churn does not read as a content change.
    *
    * Shape: one fingerprint projection per side + ONE full-outer join
    * on doc_id (co-partitioned) — no content join, no pairwise
    * comparison; at 100 TB this is the cost of two narrow scans and
    * one keyed shuffle.
    */
  /** Sketch-tier cross-corpus overlap — [[corpusDiff]]'s 100 TB
    * sibling: at crawl scale "how much of crawl B is already in
    * crawl A" cannot pay the exact full-outer join on every probe, so
    * each corpus is reduced to ONE mergeable HLL sketch of its
    * content-fingerprint set (Spark's native `hll_sketch_agg` —
    * map-side partial, kilobytes per sketch) and the overlap comes
    * from inclusion-exclusion: |A∩B| ≈ |A| + |B| − |A∪B| with the
    * union estimated on the MERGED sketches (`hll_union` — no data
    * movement, the sketches meet on the driver). Output: one row
    * (est_a, est_b, est_union, est_overlap, est_jaccard). The exact
    * diff remains the audit tool; this is the continuous monitoring
    * probe (est_overlap / est_b ≈ the fraction of the new crawl that
    * is redundant — the number that decides whether to ingest it).
    * Sketch error is the standard HLL ~1% (lgConfigK default);
    * spec-bounded against the exact recount on planted overlap.
    */
  def corpusOverlapSketch(a: DataFrame, b: DataFrame,
      lgConfigK: Int = 12): DataFrame = {
    def fp(df: DataFrame) = df.select(
      graft.GraftFunctions.hex64(
        array_join(graft.GraftFunctions.tokens(col("text")), " ")).as("fp"))
    val sa = fp(a).agg(hll_sketch_agg(col("fp"), lit(lgConfigK)).as("sk_a"))
    val sb = fp(b).agg(hll_sketch_agg(col("fp"), lit(lgConfigK)).as("sk_b"))
    sa.crossJoin(sb)
      .select(
        hll_sketch_estimate(col("sk_a")).as("est_a"),
        hll_sketch_estimate(col("sk_b")).as("est_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))).as("est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        // clamp: HLL noise on near-disjoint corpora can push
        // inclusion-exclusion slightly negative, and two empty corpora
        // give union 0 — monitoring consumers must never see a
        // negative overlap or a NaN jaccard (r11 ADVICE)
        greatest(lit(0L),
          col("est_a") + col("est_b") - col("est_union")).as("est_overlap"),
        when(col("est_union") > 0,
          greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")) /
            col("est_union").cast("double"))
          .otherwise(lit(0.0)).as("est_jaccard"))
  }

  def corpusDiff(oldCorpus: DataFrame, newCorpus: DataFrame): DataFrame = {
    def fp(df: DataFrame, name: String) = df.select(col("doc_id"),
      graft.GraftFunctions.hex64(
        array_join(graft.GraftFunctions.tokens(col("text")), " ")).as(name))
    fp(oldCorpus, "old_fp").join(fp(newCorpus, "new_fp"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") === col("new_fp"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** The COMPLETE crawl decision — every gate a production crawl
    * pipeline runs, one auditable flag row per page: RFC 9309 robots
    * compliance, domain blocklist, per-domain quota, canonical-URL
    * exact dedup (the URL face), and the extracted-content battery
    * (text ratio, script routing, quality, content dedup — the
    * [[webCurate]] face). `keep` is the conjunction; every drop
    * carries its reason (the `pipeline_clean` flag discipline — no
    * sequential filters, so stages share passes and the decision
    * table is the audit log).
    *
    * Shape: parse + canonicalize are ONE cached projection; robots is
    * one broadcast-able hosts-grain join; blocklist is a plan array
    * literal; quota is the bounded top-k aggregate; URL dedup is one
    * `min(doc_id)` partial agg per canonical; the content face is
    * [[webCurate]] (extraction + signals one narrow pass, content
    * dedup its only keyed shuffle). No windows anywhere; no global
    * sort in the API path (the driver row sorts).
    */
  def crawlPipeline(pages: DataFrame, url: Column, html: Column,
      robots: DataFrame, blockedDomains: Seq[String], quota: Int = 5,
      minTextRatio: Double = 0.1, minScriptRatio: Double = 0.5,
      minQuality: Double = 0.3): DataFrame = {
    import graft.ops.Curation
    val parsed = Curation.applyRobots(
        Curation.withUrlParts(
          pages.withColumn("__url", url).withColumn("__html", html),
          col("__url"))
          .withColumn("canonical_url", Curation.canonicalizeUrl(col("__url"))),
        robots)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val blockedArr = array(blockedDomains.map(lit(_)): _*)
    val flags = parsed.withColumn("domain_blocked",
      coalesce(exists(blockedArr, d =>
        col("host") === d || col("host").endsWith(concat(lit("."), d))),
        lit(false)))
    val quotaKeys = Curation.domainQuota(parsed, col("domain"), col("doc_id"), quota)
      .select(col("key").as("doc_id"), lit(true).as("quota_keep"))
    val urlKeepers = parsed.groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("__url_keeper"))
    val content = webCurate(
        parsed.select(col("doc_id"), col("__html").as("html")),
        minTextRatio, minScriptRatio, minQuality)
      .select(col("doc_id"), col("text_ratio"), col("script_ratio"),
        col("quality_score"), col("dedup_keep"),
        col("keep").as("content_keep"))
    val out = flags
      .join(quotaKeys, Seq("doc_id"), "left")
      .withColumn("quota_keep", coalesce(col("quota_keep"), lit(false)))
      .join(urlKeepers, Seq("canonical_url"), "left")
      .withColumn("url_keep",
        coalesce(col("doc_id") === col("__url_keeper"), lit(true)))
      .join(content, Seq("doc_id"))
      .select(col("doc_id"), col("host"), col("domain"), col("canonical_url"),
        col("robots_allowed"), col("domain_blocked"), col("quota_keep"),
        col("url_keep"), col("text_ratio"), col("script_ratio"),
        col("quality_score"), col("dedup_keep"), col("content_keep"),
        (col("robots_allowed") && !col("domain_blocked") &&
          col("quota_keep") && col("url_keep") && col("content_keep"))
          .as("keep"))
    Caching.materialized(out) { parsed.unpersist(false) }
  }

  /** WARC in → crawl decisions out — the full ingestion chain as one
    * call: split the archive blobs by Content-Length, keep the
    * `response` records, and run [[crawlPipeline]] with the record's
    * WARC-Target-URI as the URL and its body as the raw HTML. Record
    * identity: `doc_id = archive doc_id · 2²⁰ + rec_idx` (stable,
    * join-able back to both the archive and the record). Everything
    * downstream is the gated operator — this is deliberately a thin
    * composition, so it cannot drift from [[crawlPipeline]]
    * (spec-asserted parity).
    */
  def warcCurate(archives: DataFrame, blob: Column, robots: DataFrame,
      blockedDomains: Seq[String], quota: Int = 5): DataFrame = {
    val recs = graft.sources.Warc.parseRecords(
        graft.sources.Warc.splitRecords(archives, blob), col("record"))
      .where(col("warc_valid") && col("warc_type") === "response")
      .select((col("doc_id") * (1L << 20) + col("rec_idx")).as("doc_id"),
        col("target_uri"), col("body"))
    crawlPipeline(recs, col("target_uri"), col("body"), robots,
      blockedDomains, quota)
  }

  /** [[warcCurate]] over `.warc.gz` archives — the Common Crawl wire
    * layout: the CRC-verified gzip member walk feeds the same record
    * walk and the same crawl decision battery (`WarcGzParitySpec`
    * pins gz ≡ plain on identical content). Record identity is
    * (archive doc_id, member, record-in-member) packed into one key:
    * `doc_id · 2³² + member_idx · 2¹⁶ + rec_idx`. The field widths
    * match the kernel caps exactly — `GzipKernel.MaxMembers` and
    * `WarcSplitKernel.MaxRecords` are both 65536 = 2¹⁶ (an archive
    * beyond either cap nulls at the kernel, it never reaches here) —
    * so distinct (archive, member, record) triples can never collide
    * in the packed key at any archive size the walk admits.
    */
  def warcGzCurate(archives: DataFrame, blob: Column, robots: DataFrame,
      blockedDomains: Seq[String], quota: Int = 5,
      maxLen: Int = 1 << 24): DataFrame = {
    require(graft.expressions.GzipKernel.MaxMembers <= (1 << 16) &&
      graft.expressions.WarcSplitKernel.MaxRecords <= (1 << 16),
      "doc_id packing assumes member_idx and rec_idx fit in 16 bits")
    val recs = graft.sources.Warc.parseRecords(
        graft.sources.Warc.splitRecordsGz(archives, blob, maxLen), col("record"))
      .where(col("warc_valid") && col("warc_type") === "response")
      .select((col("doc_id") * (1L << 32) + col("member_idx") * (1L << 16) +
          col("rec_idx")).as("doc_id"),
        col("target_uri"), col("body"))
    crawlPipeline(recs, col("target_uri"), col("body"), robots,
      blockedDomains, quota)
  }

  /** Multimodal sample curation — the WebDataset capstone: tar shards
    * in, per-SAMPLE keep decisions out, composed entirely from the
    * engine's own operators: the checksum-verified member walk + stem
    * regroup ([[graft.sources.Wds.samples]]), a REAL JPEG decode
    * feeding the perceptual dHash, the window-free keep-ledger over
    * the fingerprint (content dedup across the whole corpus of
    * samples), and the Unicode token battery on the caption. `keep` =
    * image decodes ∧ canonical copy ∧ caption has ≥
    * `minCaptionTokens` tokens — the flag row a LAION-style curation
    * run writes. Canonicality ties break on the lexicographic
    * (zero-padded doc, stem) key so the choice is total and
    * engine-portable.
    */
  def wdsCurate(shards: DataFrame, blob: Column,
      minCaptionTokens: Int = 2): DataFrame = {
    val samp = graft.sources.Wds.samples(shards, blob)
      .withColumn("__key",
        concat(lpad(col("doc_id").cast("string"), 12, "0"), lit("|"),
          col("stem")))
    val h = org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.ImageDhash(
        org.apache.spark.sql.GraftColumnBridge.expression(
          element_at(col("parts"), "jpg"))))
    // persist the decoded frame: the JPEG entropy decode behind
    // __dhash feeds both the ledger aggregate and the join-back —
    // one decode per sample, not two (imageDedup's idiom)
    val withH = samp
      .withColumn("__dhash", h)
      .withColumn("caption", element_at(col("parts"), "txt").cast("string"))
      .withColumn("n_caption_tokens",
        when(col("caption").isNotNull,
          size(graft.GraftFunctions.tokens(col("caption"))).cast("long")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val groups = withH.where(col("__dhash").isNotNull)
      .groupBy(col("__dhash"))
      .agg(count(lit(1)).as("n_copies"), min(col("__key")).as("__keeper"))
    val out = withH.join(groups, Seq("__dhash"), "left")
      .withColumn("image_ok", col("__dhash").isNotNull)
      .withColumn("is_canonical",
        when(col("image_ok"), col("__key") === col("__keeper")))
      .withColumn("caption_ok",
        coalesce(col("n_caption_tokens") >= minCaptionTokens, lit(false)))
      .withColumn("keep",
        col("image_ok") && coalesce(col("is_canonical"), lit(false)) &&
          col("caption_ok"))
      .select(col("doc_id"), col("stem"), col("image_ok"),
        when(col("image_ok"), col("n_copies")).as("n_copies"),
        col("is_canonical"), col("n_caption_tokens"), col("caption_ok"),
        col("keep"))
    Caching.materialized(out) { withH.unpersist(false) }
  }

  /** EXACT pairwise content overlap between corpus slices (sources,
    * shards, snapshots): for every unordered slice pair with shared
    * content, the common-fingerprint count, both slice sizes, Jaccard,
    * and both containments — the mixing-decision matrix a curator
    * reads before weighting sources ([[corpusOverlapSketch]] is the
    * sketch tier for two corpora; this is the exact matrix over N
    * slices).
    *
    * Shape: reduce to the DISTINCT (slice, fingerprint) grain (one
    * narrow pass + one dedup shuffle), then a self-equi-join ON THE
    * FINGERPRINT — never all-pairs documents: each fingerprint joins
    * only across the slices it actually appears in, so the expansion
    * is bounded by |distinct fps| × slices², and slice sizes ride in
    * as a broadcast. Pairs with zero overlap are absent by
    * construction (a 20-source corpus emits ≤ 190 rows, not a dense
    * matrix of zeros).
    */
  def sourceOverlap(docs: DataFrame, group: Column): DataFrame = {
    val fp = docs.select(group.cast("string").as("grp"),
        graft.GraftFunctions.hex64(
          array_join(graft.GraftFunctions.tokens(col("text")), " ")).as("fp"))
      .distinct()
    val sizes = fp.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    val pairs = fp.as("a").join(fp.as("b"), col("a.fp") === col("b.fp"))
      .where(col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(graft.ops.Broadcasting.maybeBroadcast(
        sizes.select(col("grp").as("grp_a"), col("n").as("n_a"))), Seq("grp_a"))
      .join(graft.ops.Broadcasting.maybeBroadcast(
        sizes.select(col("grp").as("grp_b"), col("n").as("n_b"))), Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("n_common"),
        col("n_a"), col("n_b"),
        (col("n_common") / (col("n_a") + col("n_b") - col("n_common")))
          .as("jaccard"),
        (col("n_common") / col("n_a")).as("containment_a"),
        (col("n_common") / col("n_b")).as("containment_b"))
  }
}
