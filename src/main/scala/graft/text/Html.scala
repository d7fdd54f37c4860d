package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the stage a web crawl runs before ANY
  * text operator (tokenize/dedup/quality all assume prose, not
  * markup). Deliberately regex-grade, not a DOM parser: at 100 TB the
  * extractor must be a narrow codegen'd projection, and the fixed
  * pipeline below is the standard crawl-scale approximation
  * (trafilatura-class DOM scoring is a per-document tree walk that
  * does not vectorize). Every step is a Spark built-in whose RE2
  * mirror is exact, so the driver row is hash-comparable in DuckDB.
  *
  * Extraction semantics (fixed order, shared with the oracle):
  *
  *   1. `<script>…</script>` and `<style>…</style>` BLOCKS drop
  *      entirely (content included — case-insensitive, dot-all,
  *      non-greedy);
  *   2. HTML comments `<!-- … -->` drop entirely;
  *   3. every remaining tag `<[^>]*>` becomes one space (block/inline
  *      distinction is deliberately not modeled);
  *   4. character references decode in ONE left-to-right codegen pass
  *      ([[graft.expressions.HtmlEntityKernel]]): the [[Html.Entities]]
  *      named table PLUS numeric references `&#NNN;`/`&#xHH;` (r13 —
  *      previously numeric refs survived as literal junk tokens,
  *      feeding dedup/search/quality on any real crawl); single-pass
  *      gives correct HTML semantics — `&amp;lt;` yields the literal
  *      text `&lt;`, never a double decode; invalid numeric refs stay
  *      literal;
  *   5. whitespace collapses to single spaces, trimmed.
  *
  * Alongside the text, the signals a curation pipeline filters on:
  * raw/extracted char counts, the text-to-html ratio (the classic
  * boilerplate-page discriminant), and link / paragraph tag counts
  * (link-farm pages have high `n_links` · low ratio).
  */
object Html {

  /** Entity decode table, ORDERED — `&amp;` must be last. The ORACLE
    * applies these as literal (non-regex) replaces in list order; the
    * Spark side decodes the same table in the single-pass kernel
    * (order-free there — `HtmlEntitySyncSpec` pins the two lists
    * equal and the two decode disciplines agreeing on the planted
    * scaffold).
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** VALID numeric-reference plants (decimal, hex-BMP, hex
    * supplementary — the last proves surrogate-pair emission) and
    * their decoded forms — shared by the scaffold, the oracle's
    * literal replaces, and the specs. The INVALID plants in
    * [[ScaffoldSuffix]] (surrogate `&#xD800;`, out-of-range
    * `&#1114112;`, digitless `&#;`) appear in NO replace list: both
    * engines must keep them literal, which the shared constants make
    * observable at the gate.
    */
  val NumericPlants: Seq[(String, String)] = Seq(
    "&#233;" -> "é",
    "&#x2019;" -> "’",
    "&#8230;" -> "…",
    "&#x1F600;" -> new String(Character.toChars(0x1F600)))

  /** The strip patterns, shared verbatim with the oracle (Java regex
    * and RE2 agree on every construct used: inline flags, non-greedy,
    * negated classes).
    */
  val ScriptBlock: String = "(?is)<script[^>]*>.*?</script>"
  val StyleBlock: String = "(?is)<style[^>]*>.*?</style>"
  val CommentBlock: String = "(?s)<!--.*?-->"
  val AnyTag: String = "(?s)<[^>]*>"

  /** Named + numeric character references in one codegen pass. */
  def decodeEntities(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.HtmlEntityDecode(
        org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Tag-strip + entity-decode of an html column (steps 1–5). */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, ScriptBlock, " ")
    val noStyle = regexp_replace(noScript, StyleBlock, " ")
    val noComment = regexp_replace(noStyle, CommentBlock, " ")
    val noTags = regexp_replace(noComment, AnyTag, " ")
    val decoded = decodeEntities(noTags)
    // explicit class, not \s: Java's \s includes \x0B, RE2's does not
    trim(regexp_replace(decoded, WhitespaceClass, " "))
  }

  /** Whitespace run — spelled as an explicit class because Java `\s`
    * and RE2 `\s` disagree on vertical tab; both engines use THIS.
    */
  val WhitespaceClass: String = "[ \\t\\r\\n\\f]+"

  /** Tag-open boundary after the tag name (space or `>`), explicit
    * for the same reason.
    */
  val TagBoundary: String = "[ \\t\\r\\n>]"

  /** Full extraction row: text + the curation signals. One narrow
    * projection — zero exchanges.
    */
  def extract(docs: DataFrame, html: Column,
      carry: Seq[String] = Nil): DataFrame =
    docs.select(col("doc_id") +: carry.map(col) ++: Seq(
        extractText(html).as("text"),
        length(html).cast("long").as("n_html_chars"),
        regexp_count(html, lit("(?i)<a" + TagBoundary)).cast("long").as("n_links"),
        regexp_count(html, lit("(?i)<p" + TagBoundary)).cast("long").as("n_paragraphs")): _*)
      .withColumn("n_text_chars", length(col("text")).cast("long"))
      .select(col("doc_id") +: carry.map(col) ++: Seq(
        col("text"), col("n_html_chars"), col("n_text_chars"),
        when(col("n_html_chars") > 0,
          col("n_text_chars") / col("n_html_chars")).as("text_ratio"),
        col("n_links"), col("n_paragraphs")): _*)

  /** Deterministic HTML scaffold around the plain-text corpus — the
    * driver row's planting device (the test corpus is prose, so the
    * markup, entities, script/style/comment blocks and links ride in
    * from these constants — shared verbatim with the oracle SQL).
    * The script block deliberately contains bare `<`/`>` so the
    * block-drop-BEFORE-tag-strip ordering is observable.
    */
  val ScaffoldPrefix: String =
    "<html><head><title>doc</title>\n" +
      "<style type=\"text/css\">body { color: #000; }</style>\n" +
      "<script>var x = 1 < 2 && y > 0; // strip me</script>\n" +
      "</head><body>\n<!-- boilerplate comment -->\n" +
      "<h1>Terms &amp; Conditions</h1>\n<p class=\"main\">"

  val ScaffoldSuffix: String =
    "</p>\n<ul><li>alpha</li><li>beta &lt;tag&gt;</li></ul>\n" +
      "<a href=\"https://example.com/a?b=1&amp;c=2\">a &quot;link&quot;</a>" +
      "&nbsp;&#39;quoted&#39; &amp;lt;escaped&amp;gt;\n" +
      // numeric-reference plants: the three VALID forms from
      // NumericPlants, then three INVALID ones that must stay literal
      // (surrogate, out-of-range, digitless) in BOTH engines
      "<p>caf&#233; it&#x2019;s A&#x1F600;B " +
      "bad&#xD800;bad over&#1114112;over none&#;none</p>\n</body></html>"

  /** [[extract]] over scaffold-wrapped text — the driver row. */
  def extractPlanted(docs: DataFrame): DataFrame =
    extract(docs,
      concat(lit(ScaffoldPrefix), col("text"), lit(ScaffoldSuffix)))

  // ---- page metadata (title / headings / meta description) ----

  /** Extraction patterns, shared verbatim with the oracle. The meta
    * description matcher requires `name` BEFORE `content` (the
    * overwhelmingly common serialization; RE2 has no lookaround to
    * match both orders in one pattern — documented scope).
    */
  val TitlePat: String = "(?is)<title[^>]*>(.*?)</title>"
  val H1Pat: String = "(?is)<h1[^>]*>(.*?)</h1>"
  val HeadingPat: String = "(?is)<h[1-3][ \\t\\r\\n>]"
  val MetaDescPat: String =
    "(?is)<meta[ \\t\\r\\n][^>]*?name[ \\t\\r\\n]*=[ \\t\\r\\n]*\"description\"" +
      "[^>]*?content[ \\t\\r\\n]*=[ \\t\\r\\n]*\"([^\"]*)\""

  /** Page metadata — the per-page fields a search/dedup/quality stack
    * keys on before any body extraction (title is the classic
    * near-dup and result-snippet signal; heading density separates
    * article pages from link farms): `title` (first `<title>`,
    * tag-stripped + entity-decoded + whitespace-collapsed — null when
    * absent), `n_h1` / `first_h1` (same decode), `n_headings`
    * (h1–h3 opens), `meta_description` (decoded `content` of
    * `<meta name="description" …>`). One narrow projection — zero
    * exchanges, the [[extract]] discipline.
    */
  def pageMeta(docs: DataFrame, html: Column,
      carry: Seq[String] = Nil): DataFrame = {
    def clean(c: Column): Column =
      trim(regexp_replace(
        decodeEntities(regexp_replace(c, AnyTag, " ")), WhitespaceClass, " "))
    val h1s = regexp_extract_all(html, lit(H1Pat), lit(1))
    docs.select(col("doc_id") +: carry.map(col) ++: Seq(
      when(regexp_count(html, lit(TitlePat)) > 0,
        clean(regexp_extract(html, TitlePat, 1))).as("title"),
      size(h1s).cast("long").as("n_h1"),
      when(size(h1s) > 0, clean(element_at(h1s, 1))).as("first_h1"),
      regexp_count(html, lit(HeadingPat)).cast("long").as("n_headings"),
      when(regexp_count(html, lit(MetaDescPat)) > 0,
        clean(regexp_extract(html, MetaDescPat, 1))).as("meta_description")): _*)
  }

  /** Scaffold pieces for the page-metadata driver row (doc-varying
    * title/description/headings ride in from these constants — the
    * oracle concatenates the same bytes).
    */
  val MetaScaffoldA: String = "<html><head>\n<title> Doc "
  val MetaScaffoldB: String = " &amp; notes </title>\n" +
    "<meta name=\"keywords\" content=\"decoy, not description\">\n" +
    "<meta name=\"description\" content=\""
  val MetaScaffoldC: String = " &#8230;\">\n</head><body>\n<h1>Intro "
  val MetaScaffoldD: String = " &lt;draft&gt;</h1>\n<p>"
  val MetaScaffoldE: String = "</p>\n<h2>middle</h2>\n<H1>second heading</H1>\n" +
    "<h3>tail</h3>\n</body></html>"

  /** Scaffold-wrapped corpus for the page-metadata driver row: title
    * carries a doc id + an entity, the description is a text prefix
    * plus a numeric-reference ellipsis, h1s carry entities and a
    * case-variant duplicate; every 6th doc drops the whole head (null
    * title/description lane).
    */
  def metaPlanted(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val wrapped = concat(
      lit(MetaScaffoldA), d.cast("string"), lit(MetaScaffoldB),
      substring(col("text"), 1, 40), lit(MetaScaffoldC),
      d.cast("string"), lit(MetaScaffoldD), col("text"), lit(MetaScaffoldE))
    val headless = concat(lit("<html><body><p>"), col("text"),
      lit("</p><h3>only</h3></body></html>"))
    docs.select(d, when(d % 6 === 0, headless).otherwise(wrapped).as("html"))
  }

  // ---- link graph extraction ----

  /** href capture inside an `<a …>` tag, one pattern per quote style
    * (RE2 has no backreferences, so one pattern cannot match both) —
    * shared verbatim with the oracle. Lazy `[^>]*?` keeps the match
    * inside the tag.
    */
  val HrefDq: String =
    "(?is)<a" + TagBoundary + "[^>]*?href[ \\t\\r\\n]*=[ \\t\\r\\n]*\"([^\"]*)\""
  val HrefSq: String =
    "(?is)<a" + TagBoundary + "[^>]*?href[ \\t\\r\\n]*=[ \\t\\r\\n]*'([^']*)'"

  /** Destination host of a decoded href seen on a page hosted at
    * `pageHost`: absolute `http(s)://` and protocol-relative `//`
    * links resolve to their own authority, other schemes (mailto:,
    * javascript:, tel:, data:) resolve to NULL (not navigation),
    * everything else is a relative link → the page's own host.
    */
  def linkDstHost(href: Column, pageHost: Column): Column =
    when(href.rlike("(?i)^https?://"),
      lower(regexp_extract(href, "(?i)^https?://([^/?#]+)", 1)))
      .when(href.startsWith("//"),
        lower(regexp_extract(href, "^//([^/?#]+)", 1)))
      .when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), lit(null))
      .otherwise(lower(pageHost))

  /** Outbound links of every page: one row per href with the decoded
    * target and its resolved destination host. Pure narrow map +
    * explode — zero exchanges; the web-graph feeder for
    * [[graft.ops.Graph]] PageRank and for link-farm/anchor analyses.
    */
  def extractLinks(docs: DataFrame, html: Column,
      pageHost: Column): DataFrame = {
    val hrefs = concat(
      regexp_extract_all(html, lit(HrefDq), lit(1)),
      regexp_extract_all(html, lit(HrefSq), lit(1)))
    val decoded = decodeEntities(col("__href0"))
    docs.select(col("doc_id"), lower(pageHost).as("src_host"),
        explode(hrefs).as("__href0"))
      .select(col("doc_id"), col("src_host"), decoded.as("href"))
      .withColumn("dst_host", linkDstHost(col("href"), col("src_host")))
  }

  /** Host-level link graph: aggregate [[extractLinks]] rows into
    * weighted (src_host, dst_host) edges — non-navigation hrefs drop,
    * self-links are flagged, not dropped (internal-to-external ratio
    * is itself a link-farm signal). ONE keyed agg at the host-pair
    * grain; the output feeds `Graph.pagerank` directly.
    */
  def hostEdges(links: DataFrame): DataFrame =
    links.where(col("dst_host").isNotNull)
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))
      .withColumn("is_internal", col("src_host") === col("dst_host"))

  /** Link-planting scaffold (driver row): each page carries one
    * external link whose target host AND anchor text are
    * deterministic functions of doc_id, one relative link with a
    * markup-bearing anchor, and one mailto (must be dropped). Pieces
    * are constants so the oracle concatenates the same bytes.
    */
  val LinkScaffoldA: String = "<html><body><p>"
  val LinkScaffoldB: String = "</p>\n<a href=\"https://www.src"
  val LinkScaffoldC: String = ".com/x?a=1&amp;b=2\">visit src"
  val LinkScaffoldC2: String = " &amp; page"
  val LinkScaffoldC3: String = "</a>\n<a href='/rel/doc"
  val LinkScaffoldD: String = "'>rel &lt;b&gt; anchor</a>\n" +
    "<a href=\"mailto:u@v.example\">mail</a>\n</body></html>"

  /** Scaffold-wrapped corpus for the link-graph driver rows: the
    * external target is `www.src{(7·doc_id+3) mod 20}.com` (real
    * fan-out instead of one hub) and its anchor text is
    * `visit src{N} & page{doc_id mod 5}` (real anchor vocabulary).
    */
  def linkPlanted(parsed: DataFrame): DataFrame = {
    val n = pmod(col("doc_id") * 7 + 3, lit(20L)).cast("string")
    parsed.withColumn("__html", concat(
      lit(LinkScaffoldA), col("text"), lit(LinkScaffoldB), n,
      lit(LinkScaffoldC), n,
      lit(LinkScaffoldC2), pmod(col("doc_id"), lit(5L)).cast("string"),
      lit(LinkScaffoldC3), col("doc_id").cast("string"),
      lit(LinkScaffoldD)))
  }

  /** Anchor capture: (href, inner text) of an `<a …>…</a>` element,
    * one pattern per quote style. Group 1 = href, group 2 = anchor
    * markup (tags stripped and entities decoded downstream).
    */
  val AnchorDq: String =
    "(?is)<a" + TagBoundary + "[^>]*?href[ \\t\\r\\n]*=[ \\t\\r\\n]*" +
      "\"([^\"]*)\"[^>]*>(.*?)</a>"
  val AnchorSq: String =
    "(?is)<a" + TagBoundary + "[^>]*?href[ \\t\\r\\n]*=[ \\t\\r\\n]*" +
      "'([^']*)'[^>]*>(.*?)</a>"

  /** Anchor-term index — what OTHER pages' link text says a host is
    * about (the classic web relevance/spam signal, robust to the
    * target page's own content): per (dst_host, token), total anchor
    * occurrences and the count of DISTINCT linking hosts (one host
    * repeating a term ≠ many hosts agreeing — the spam
    * discriminant). Non-navigation hrefs drop; anchor markup is
    * tag-stripped and entity-decoded with the [[extractText]] rules.
    *
    * Shape: narrow map + two explodes (anchors, then tokens) and ONE
    * keyed agg at the (host, token) grain — the distinct-host count
    * rides the same shuffle.
    */
  def anchorTerms(docs: DataFrame, html: Column,
      pageHost: Column): DataFrame = {
    def pairs(pat: String) = arrays_zip(
      regexp_extract_all(html, lit(pat), lit(1)).as("href"),
      regexp_extract_all(html, lit(pat), lit(2)).as("anchor"))
    val decodedHref = decodeEntities(col("__p")("href"))
    val decodedAnchor = decodeEntities(
      regexp_replace(col("__p")("anchor"), AnyTag, " "))
    val anchorTxt = trim(regexp_replace(decodedAnchor, WhitespaceClass, " "))
    docs.select(lower(pageHost).as("src_host"),
        explode(concat(pairs(AnchorDq), pairs(AnchorSq))).as("__p"))
      .select(col("src_host"),
        linkDstHost(decodedHref, col("src_host")).as("dst_host"),
        graft.GraftFunctions.tokens(anchorTxt).as("__toks"))
      .where(col("dst_host").isNotNull)
      .select(col("src_host"), col("dst_host"),
        explode(col("__toks")).as("token"))
      .groupBy(col("dst_host"), col("token"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("src_host")).as("n_hosts"))
  }
}
