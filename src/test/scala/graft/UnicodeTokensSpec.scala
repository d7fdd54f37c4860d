package graft

import org.apache.spark.sql.functions._

/** Unicode tokenization (r11 verdict item #1): the planted
  * multilingual corpus where the token-keyed operators must actually
  * FIRE on non-Latin text — under the old ASCII regex every one of
  * these documents tokenized to zero tokens and silently passed
  * through dedup/search/blocklist.
  */
class UnicodeTokensSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): Seq[String] = {
    Seq((1L, s)).toDF("doc_id", "text")
      .select(GraftFunctions.tokens(col("text")).as("t"))
      .head().getSeq[String](0)
  }

  test("kernel semantics: case folds, scripts, digits, per-codepoint CJK") {
    // Cyrillic with uppercase folds
    assert(toks("Привет, МИР!") === Seq("привет", "мир"))
    // accented Latin, uppercase accents fold per-codepoint
    assert(toks("café naïve RÉSUMÉ") === Seq("café", "naïve", "résumé"))
    // unspaced CJK: one token per codepoint
    assert(toks("東京は日本の首都") ===
      Seq("東", "京", "は", "日", "本", "の", "首", "都"))
    // CJK/digit runs split exactly at the script boundary
    assert(toks("第3章") === Seq("第", "3", "章"))
    // Katakana too (script, not block: ー etc. excluded by category)
    assert(toks("カタカナ") === Seq("カ", "タ", "カ", "ナ"))
    // Arabic (cased-less)
    assert(toks("مرحبا بالعالم") === Seq("مرحبا", "بالعالم"))
    // Greek lowercase (no contextual final-sigma path in the kernel)
    assert(toks("ελληνικά ΓΡΑΜΜΑΤΑ") === Seq("ελληνικά", "γραμματα"))
    // mixed-script document: every script tokenizes in one pass
    assert(toks("Spark 3.5 поддерживает 東京 data") ===
      Seq("spark", "3", "5", "поддерживает", "東", "京", "data"))
  }

  test("ASCII behavior identical to the legacy [^a-z0-9]+ split") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    val legacy = filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")
    val diff = docs.select(GraftFunctions.tokens(col("text")).as("a"), legacy.as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff === 0L, "Unicode kernel must be byte-identical on ASCII text")
  }

  test("combining marks separate tokens unless NFC-composed first (documented contract)") {
    val decomposed = "café" // e + COMBINING ACUTE
    assert(toks(decomposed) === Seq("cafe"))
    val composed = Seq((1L, decomposed)).toDF("doc_id", "text")
      .select(GraftFunctions.tokens(GraftFunctions.nfc_normalize(col("text"))).as("t"))
      .head().getSeq[String](0)
    assert(composed === Seq("café"))
  }

  test("null in, null out; separator-only text tokenizes empty") {
    val r = Seq((1L, null: String), (2L, "!!! … ---")).toDF("doc_id", "text")
      .select(col("doc_id"), GraftFunctions.tokens(col("text")).as("t"))
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getSeq[String](1)))
      .toMap
    assert(r(1L) === null)
    assert(r(2L) === Seq.empty[String])
  }

  test("minhash-LSH dedup FIRES on non-Latin near-duplicates") {
    // two Russian docs sharing most shingles + one unrelated CJK doc;
    // under the ASCII regex all three had zero shingles and no pairs
    val ru1 = "это длинный русский документ про обучение моделей на " +
      "больших корпусах текста с удалением дубликатов и фильтрацией качества"
    val ru2 = "это длинный русский документ про обучение моделей на " +
      "больших корпусах текста с удалением дубликатов и строгой фильтрацией"
    val zh = "機器學習模型在大規模語料庫上訓練需要去重和質量過濾流程支持"
    val docs = Seq((1L, ru1), (2L, ru2), (3L, zh)).toDF("doc_id", "text")
    val pairs = graft.dedup.Dedup.minhashLshPairs(docs)
      .select(col("a"), col("b"), col("jaccard")).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getDouble(2) > 0.5), s"RU near-dup pair not found: ${pairs.mkString(";")}")
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L),
      "unrelated CJK doc must not pair")
  }

  test("exact dedup FIRES on non-Latin duplicates (fingerprint over Unicode tokens)") {
    val docs = Seq(
      (1L, "Съешь ещё этих мягких французских булок"),
      (2L, "Съешь ещё этих мягких французских булок!!"), // same tokens
      (3L, "да выпей же чаю")).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.exact(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    // doc 2 has the same Unicode token stream as doc 1 → dropped
    assert(out(1L) === true && out(2L) === false && out(3L) === true)
  }

  test("BM25 search returns the right document for a non-Latin query term") {
    val docs = Seq(
      (1L, "документ о поисковых системах и ранжировании документов"),
      (2L, "совсем другой текст про погоду и природу"),
      (3L, "plain english text about search engines")).toDF("doc_id", "text")
    val hits = graft.text.TextAnalysis.searchTopK(docs,
      terms = Seq("ранжировании"), k = 3).collect()
    assert(hits.nonEmpty && hits.head.getAs[Long]("doc_id") === 1L,
      s"Cyrillic query must hit doc 1: ${hits.mkString(";")}")
  }

  test("word blocklist FIRES on non-Latin terms") {
    val docs = Seq(
      (1L, "этот текст содержит запрещено слово"),
      (2L, "чистый текст без плохих слов"),
      (3L, "この文書は 禁止 という語を含む")).toDF("doc_id", "text")
    val out = graft.ops.Curation.blocklistTerms(docs,
        Seq("запрещено", "禁", "止"), maxHits = 0).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(out(1L) === false, "Cyrillic blocked term must fire")
    assert(out(2L) === true)
    assert(out(3L) === false, "CJK blocked codepoints must fire")
  }

  test("quality/Gopher signals count non-Latin letters as letters, not punctuation") {
    val docs = Seq(
      (1L, "это хороший длинный русский текст без знаков препинания"),
      (2L, "這是 一段 沒有 標點 的 中文")).toDF("doc_id", "text")
    val q = graft.text.TextAnalysis.quality(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("punct_ratio")).toMap
    // under the old [a-z0-9 ] class EVERY one of these letters counted
    // as punctuation (ratio ~1.0) and the docs scored as garbage
    assert(q(1L) === 0.0, s"Cyrillic text must have zero punct ratio: $q")
    assert(q(2L) === 0.0, s"CJK text must have zero punct ratio: $q")
    val g = graft.text.TextAnalysis.gopherQuality(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("alpha_word_ratio")).toMap
    assert(g(1L) === 1.0, s"every Cyrillic token is an alpha word: $g")
    assert(g(2L) === 1.0, s"every CJK token is an alpha word: $g")
  }

  test("script counts: per-script codepoints vs letters (marks count to their script)") {
    def counts(s: String): (Long, Map[String, Long]) = {
      val r = Seq((1L, s)).toDF("doc_id", "text")
        .select(GraftFunctions.scriptCounts(col("text")).as("c"))
        .head().getSeq[Long](0)
      (r.head, graft.expressions.ScriptCounts.Names.zip(r.tail).toMap)
    }
    val (l1, c1) = counts("Привет мир") // 9 Cyrillic letters
    assert(l1 === 9L && c1("cyrillic") === 9L && c1("latin") === 0L)
    val (l2, c2) = counts("Spark и 東京") // 5 latin + 1 cyr + 2 han
    assert(l2 === 8L && c2("latin") === 5L && c2("cyrillic") === 1L && c2("han") === 2L)
    // Devanagari: न म स ् त े = 6 script codepoints, but virama/matra
    // are Mn — only 4 are letters. The script count is by script
    // property alone (exactly RE2's \p{Devanagari}).
    val (l3, c3) = counts("नमस्ते")
    assert(l3 === 4L && c3("devanagari") === 6L)
    // Thai vowel/tone marks likewise
    val (l4, c4) = counts("สวัสดี")
    assert(l4 === 4L && c4("thai") === 6L)
    // digits and punctuation are no script and no letter
    val (l5, c5) = counts("42 !!")
    assert(l5 === 0L && c5.values.sum === 0L)
  }

  test("scriptProfile: dominant routing, fixed-order tie-break, und, mixed-script ratio") {
    val docs = Seq(
      (1L, "привет мир от русского текста"),
      (2L, "한국어 문서입니다"),
      (3L, "שלום"),
      (4L, "ab мы"),       // 2 latin vs 2 cyrillic — tie → latin (fixed order)
      (5L, "12345 !!"),    // no tracked script at all
      (6L, "abc спам 垃圾圾")) // 3 latin, 4 cyrillic, 3 han — mixed
      .toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.scriptProfile(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("dominant_script"),
          Option(r.getAs[java.lang.Double]("script_ratio")).map(_.doubleValue))).toMap
    assert(out(1L)._1 === "cyrillic" && out(1L)._2 === Some(1.0))
    assert(out(2L)._1 === "hangul")
    assert(out(3L)._1 === "hebrew")
    assert(out(4L)._1 === "latin", "tie must break in fixed script order")
    assert(out(5L) === ("und", None))
    assert(out(6L)._1 === "cyrillic" && out(6L)._2.get < 0.5,
      s"mixed-script doc must surface a low dominant share: ${out(6L)}")
    // plan contract: a narrow map — no exchange anywhere
    val phys = graft.text.TextAnalysis.scriptProfile(docs).queryExecution
      .executedPlan.toString
    assert(!phys.contains("Exchange"), s"scriptProfile must not shuffle:\n$phys")
  }

  test("languageMix: rollup groups, token sums, shares summing to one") {
    val docs = Seq(
      (1L, "the cat and the dog walked to the park in the morning"),
      (2L, "the quick brown fox is one of the animals in the story"),
      (3L, "длинный русский текст без английских маркеров вообще"),
      (4L, "der hund und die katze ist von dem haus mit garten"))
      .toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.languageMix(docs).collect()
      .map(r => (r.getAs[String]("dominant_script"), r.getAs[String]("pred_lang")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("doc_share"))).toMap
    assert(out(("latin", "en"))._1 === 2L)
    assert(out(("cyrillic", "und"))._1 === 1L)
    assert(out(("latin", "de"))._1 === 1L)
    assert(out(("latin", "en"))._2 === 24L, "token sums ride the rollup")
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-12,
      "doc shares must sum to 1")
  }

  test("kernel lowercase = simple per-codepoint mapping (the cross-engine contract)") {
    // Character.toLowerCase (simple UnicodeData mapping) — NOT
    // String.toLowerCase (contextual): final ΑΣ would contextually
    // lower to ας; the kernel (like DuckDB) maps Σ→σ everywhere
    assert(toks("ΑΣ") === Seq("ασ"))
    // and İ (U+0130) maps to the single codepoint i (simple mapping),
    // not the two-codepoint i+combining-dot of the full mapping
    assert(toks("İ") === Seq("i"))
  }
}
