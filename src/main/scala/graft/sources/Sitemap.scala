package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap ingest — the crawl stack's SEED source (robots.txt points
  * at sitemaps; sitemaps enumerate the URLs a host wants crawled):
  * parses both document kinds of the sitemaps.org 0.9 protocol — a
  * `<urlset>` of `<url>` entries (loc / optional lastmod / optional
  * priority) and a `<sitemapindex>` of nested `<sitemap>` pointers —
  * into one row per entry, ready to feed [[graft.ops.Curation]]'s
  * frontier operators (canonicalize → seen-filter → politeness
  * waves).
  *
  * Deliberately regex-grade like [[graft.text.Html]] (a sitemap is
  * machine-written XML; at 100 TB the parse must stay a narrow
  * codegen projection — no XML DOM), with every pattern RE2-portable
  * and shared verbatim with the oracle. `<loc>` text is
  * entity-decoded with the engine's single-pass kernel (`&amp;` in
  * query strings is REQUIRED escaping in valid sitemap XML — an
  * undecoded loc would mis-key the frontier). Pure map: blocks
  * explode per row, zero shuffles.
  */
object Sitemap {

  /** Shared strip/extract patterns (oracle reads these verbatim). */
  val UrlBlock: String = "(?is)<url>(.*?)</url>"
  val SitemapBlock: String = "(?is)<sitemap>(.*?)</sitemap>"
  val LocPat: String = "(?is)<loc>[ \\t\\r\\n]*([^<]*?)[ \\t\\r\\n]*</loc>"
  val LastmodPat: String = "(?is)<lastmod>[ \\t\\r\\n]*([^<]*?)[ \\t\\r\\n]*</lastmod>"
  val PriorityPat: String = "(?is)<priority>[ \\t\\r\\n]*([^<]*?)[ \\t\\r\\n]*</priority>"

  /** One row per entry: `kind` (urlset | index), `entry_idx`, `loc`
    * (entity-decoded), `lastmod` / `priority` (null when absent —
    * index entries never carry them here). Blobs with neither root
    * element yield zero rows (the invalid lane, like the archive
    * walks).
    */
  def parse(df: DataFrame, xml: Column): DataFrame = {
    val isIndex = xml.rlike("(?is)<sitemapindex[ \\t\\r\\n>]")
    val isUrlset = xml.rlike("(?is)<urlset[ \\t\\r\\n>]")
    val blocks = when(isIndex,
        regexp_extract_all(xml, lit(SitemapBlock), lit(1)))
      .when(isUrlset, regexp_extract_all(xml, lit(UrlBlock), lit(1)))
      .otherwise(array().cast("array<string>"))
    df.withColumn("kind",
        when(isIndex, "index").when(isUrlset, "urlset"))
      .select(col("*"), posexplode(blocks).as(Seq("entry_idx", "__b")))
      .withColumn("entry_idx", col("entry_idx").cast("long"))
      .withColumn("loc",
        graft.text.Html.decodeEntities(
          nullif(regexp_extract(col("__b"), LocPat, 1), lit(""))))
      .withColumn("lastmod",
        nullif(regexp_extract(col("__b"), LastmodPat, 1), lit("")))
      .withColumn("priority",
        nullif(regexp_extract(col("__b"), PriorityPat, 1), lit(""))
          .cast("double"))
      .drop("__b")
  }

  /** Deterministic sitemap corpus from the documents table: every 4th
    * doc is a `<sitemapindex>` (1 + doc_id%2 nested sitemap
    * pointers), the rest are `<urlset>`s of `1 + doc_id%3` urls —
    * each with a required-escaping `&amp;` in its query string, a
    * `<lastmod>` on alternating entries and a `<priority>` on every
    * third — and every 9th doc keeps raw text (the invalid lane,
    * zero rows). Shared arithmetic with the oracle.
    */
  def synthFromDocs(docs: DataFrame, invalidEvery: Int = 9): DataFrame = {
    val d = col("doc_id")
    val host = concat(lit("https://www.site"),
      pmod(d * 7 + 3, lit(20L)).cast("string"), lit(".com"))
    val n = (lit(1L) + d % 3).cast("int")
    val urlEntries = array_join(transform(sequence(lit(0), n - 1), i => concat(
      lit("<url>\n  <loc> "), host, lit("/p/"), d.cast("string"), lit("/"),
      i.cast("string"), lit("?a=1&amp;b="), i.cast("string"), lit(" </loc>\n"),
      when(i % 2 === 0, concat(lit("  <lastmod>2025-"),
        lpad((lit(1) + pmod(d + i.cast("long"), lit(12L))).cast("string"), 2, "0"),
        lit("-"),
        lpad((lit(1) + pmod(d * 3 + i.cast("long"), lit(28L))).cast("string"), 2, "0"),
        lit("</lastmod>\n"))).otherwise(lit("")),
      when(i % 3 === 0, concat(lit("  <priority>0."),
        pmod(d + i.cast("long"), lit(10L)).cast("string"),
        lit("</priority>\n"))).otherwise(lit("")),
      lit("</url>\n"))), "")
    val urlset = concat(
      lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"),
      urlEntries, lit("</urlset>\n"))
    val nIdx = (lit(1L) + d % 2).cast("int")
    val idxEntries = array_join(transform(sequence(lit(0), nIdx - 1), i => concat(
      lit("<sitemap><loc>"), host, lit("/sitemap"), i.cast("string"),
      lit(".xml</loc></sitemap>\n"))), "")
    val index = concat(
      lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"),
      idxEntries, lit("</sitemapindex>\n"))
    docs.select(d,
      when(d % invalidEvery === 0, col("text"))
        .when(d % 4 === 0, index)
        .otherwise(urlset).as("xml"))
  }
}
