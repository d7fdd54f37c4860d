package graft

import org.apache.spark.sql.functions._

/** HTML → text extraction: the crawl pre-stage every text operator
  * assumes has already run.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def ext(html: String): String =
    Seq((1L, html)).toDF("doc_id", "h")
      .select(graft.text.Html.extractText(col("h")).as("t"))
      .head().getString(0)

  test("block drop before tag strip: bare </> inside script cannot corrupt") {
    // the '< 2 && y >' inside script looks like a tag to the bare
    // tag-strip — the ordered pipeline drops the whole block first
    assert(ext("<p>keep</p><script>if (1 < 2 && y > 0) alert('x')</script><p>tail</p>")
      === "keep tail")
    assert(ext("<style>a { content: '<none>'; }</style>body") === "body")
    assert(ext("before<!-- <p>commented out</p> -->after") === "before after")
    // multi-line blocks drop too (dot-all)
    assert(ext("<script>\nline1\nline2\n</script>ok") === "ok")
  }

  test("entity decode is ordered: &amp; last, so &amp;lt; stays literal text") {
    assert(ext("a &amp; b") === "a & b")
    assert(ext("&lt;tag&gt;") === "<tag>")
    assert(ext("&quot;q&quot; &#39;s&#39; &apos;a&apos;") === "\"q\" 's' 'a'")
    // correct HTML semantics: &amp;lt; is the TEXT "&lt;", not "<"
    assert(ext("&amp;lt;escaped&amp;gt;") === "&lt;escaped&gt;")
    assert(ext("a&nbsp;b") === "a b")
  }

  test("tags become spaces; whitespace collapses; trimmed") {
    assert(ext("<ul><li>alpha</li><li>beta</li></ul>") === "alpha beta")
    assert(ext("  <br/>x\n\n\ty  ") === "x y")
    // attribute-laden and uppercase tags strip the same
    assert(ext("""<A HREF="u?a=1&amp;b=2">link</A>""") === "link")
  }

  test("extract: stats row — ratio, link/paragraph counts; zero-exchange plan") {
    val docs = Seq(
      (1L, "<p>one</p><a href=\"x\">l1</a><a\nhref=\"y\">l2</a>"),
      (2L, "plain prose, no markup at all"))
      .toDF("doc_id", "h")
    val out = graft.text.Html.extract(docs, col("h"))
    val rows = out.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Long]("n_links") === 2L, "newline inside tag still counts")
    assert(rows(1L).getAs[Long]("n_paragraphs") === 1L)
    assert(rows(1L).getAs[String]("text") === "one l1 l2")
    assert(rows(2L).getAs[String]("text") === "plain prose, no markup at all")
    assert(rows(2L).getAs[Double]("text_ratio") === 1.0)
    val r1 = rows(1L)
    assert(r1.getAs[Double]("text_ratio") ===
      r1.getAs[Long]("n_text_chars").toDouble / r1.getAs[Long]("n_html_chars"))
    val phys = out.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"extract must be a narrow map:\n$phys")
  }

  test("webCurate: each gate fails independently; keep is the conjunction") {
    val prose = (1 to 35).map(i => s"word$i content").mkString(" ")
    val pages = Seq(
      (1L, s"<html><body><p>$prose</p></body></html>"),       // clean page
      (2L, s"<div><p>$prose</p></div>"),                      // same TEXT → dup
      (3L, (1 to 40).map(i => s"""<a href="http://x/$i">z</a>""").mkString), // link farm
      (4L, "<p>" + "спам спам спам 垃圾垃圾垃圾 spam spam" + "</p>"), // mixed script
      (5L, "<p>tiny</p>"))                                    // too short → low quality
      .toDF("doc_id", "html")
    val out = graft.ops.Pipeline.webCurate(pages).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep") === true, s"clean page must pass: ${out(1L)}")
    assert(out(2L).getAs[Boolean]("dedup_keep") === false,
      "identical extracted text must dedup against doc 1")
    assert(out(2L).getAs[Boolean]("keep") === false)
    val r3 = out(3L)
    assert(r3.getAs[Double]("text_ratio") < 0.1 && !r3.getAs[Boolean]("keep"),
      s"link farm must fail on text ratio: $r3")
    assert(r3.getAs[Long]("n_links") === 40L)
    val r4 = out(4L)
    assert(r4.getAs[Double]("script_ratio") < 0.5 && !r4.getAs[Boolean]("keep"),
      s"mixed-script page must fail the script gate: $r4")
    val r5 = out(5L)
    assert(r5.getAs[Double]("quality_score") < 0.3 && !r5.getAs[Boolean]("keep"),
      s"short page must fail on quality: $r5")
  }

  test("extractLinks/hostEdges: quote styles, entity decode, scheme resolution, edge weights") {
    val docs = Seq(
      (1L, "Www.Site.COM",
        """<a href="https://Ext.org/p?a=1&amp;b=2">x</a>
          |<a href='/rel'>y</a>
          |<a href="//proto.net/q">z</a>
          |<a href="mailto:a@b.c">m</a>
          |<a href="javascript:void(0)">j</a>
          |<a href="https://ext.org/other">x2</a>""".stripMargin),
      (2L, "only.site", "<p>no links here</p>")).toDF("doc_id", "host", "html")
    val links = graft.text.Html.extractLinks(docs, col("html"), col("host"))
    val byHref = links.collect().map(r =>
      r.getAs[String]("href") -> Option(r.getAs[String]("dst_host"))).toMap
    // entity decoded; absolute resolves to its own (lowered) authority
    assert(byHref("https://Ext.org/p?a=1&b=2") === Some("ext.org"))
    // single-quoted relative link resolves to the page host, lowered
    assert(byHref("/rel") === Some("www.site.com"))
    assert(byHref("//proto.net/q") === Some("proto.net"))
    // non-navigation schemes resolve to null
    assert(byHref("mailto:a@b.c") === None)
    assert(byHref("javascript:void(0)") === None)
    val edges = graft.text.Html.hostEdges(links).collect()
      .map(r => (r.getAs[String]("src_host"), r.getAs[String]("dst_host")) ->
        (r.getAs[Long]("n_links"), r.getAs[Boolean]("is_internal"))).toMap
    // two links to ext.org aggregate into one weighted edge
    assert(edges(("www.site.com", "ext.org")) === (2L, false))
    assert(edges(("www.site.com", "www.site.com")) === (1L, true))
    assert(edges(("www.site.com", "proto.net")) === (1L, false))
    assert(edges.size === 3, s"mailto/javascript must not become edges: $edges")
    // narrow map + explode + one keyed agg: no join, no window
    val phys = graft.text.Html.hostEdges(
      graft.text.Html.extractLinks(docs, col("html"), col("host")))
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Join") && !phys.contains("Window"),
      s"link graph should be map+agg only:\n$phys")
  }

  test("anchorTerms: markup-bearing anchors tokenize; distinct-host votes counted") {
    val docs = Seq(
      (1L, "a.com",
        "<a href=\"https://hub.org/x\">Great <b>search</b> engine</a>" +
          "<a href=\"mailto:u@v.w\">search</a>"),
      (2L, "b.net",
        "<a href='https://hub.org/y'>search &amp; rescue</a>"),
      (3L, "c.io",
        "<a href=\"https://hub.org/z\">search</a>")).toDF("doc_id", "host", "html")
    val got = graft.text.Html.anchorTerms(docs, col("html"), col("host"))
      .collect().map(r => (r.getAs[String]("dst_host"), r.getAs[String]("token")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_hosts"))).toMap
    // 'search' reaches hub.org from all three hosts (mailto's never counts)
    assert(got(("hub.org", "search")) === (3L, 3L))
    // inner markup strips; entity decodes before tokenizing
    assert(got(("hub.org", "engine")) === (1L, 1L))
    assert(got(("hub.org", "rescue")) === (1L, 1L))
    assert(!got.contains(("hub.org", "b")), "tag names must not tokenize")
    assert(got.keys.forall(_._1 == "hub.org"), s"mailto leaked: ${got.keys}")
  }

  test("planted scaffold exercises every rule and reconstructs the body text") {
    val docs = Seq((7L, "the original document body")).toDF("doc_id", "text")
    val r = graft.text.Html.extractPlanted(docs).head()
    val txt = r.getAs[String]("text")
    assert(txt.contains("the original document body"))
    assert(txt.contains("Terms & Conditions"), "entity in scaffold decodes")
    assert(txt.contains("beta <tag>"))
    assert(txt.contains("&lt;escaped&gt;"), "&amp;lt; stays literal")
    assert(!txt.contains("strip me") && !txt.contains("color"),
      "script/style content must be gone")
    assert(!txt.contains("boilerplate comment"))
    assert(r.getAs[Long]("n_links") === 1L)
    // r13 numeric-reference plants ride the scaffold: valid forms
    // decode, invalid forms stay literal
    assert(txt.contains("café it’s A" + new String(Character.toChars(0x1F600)) + "B"))
    assert(txt.contains("bad&#xD800;bad"), "surrogate ref stays literal")
    assert(txt.contains("over&#1114112;over"), "out-of-range ref stays literal")
    assert(txt.contains("none&#;none"), "digitless ref stays literal")
  }

  test("numeric character references: decimal, hex, case, bounds, single-decode") {
    assert(ext("caf&#233;") === "café")
    assert(ext("it&#x2019;s &#X2019;") === "it’s ’")
    assert(ext("A&#x1F600;B") === "A" + new String(Character.toChars(0x1F600)) + "B",
      "supplementary plane emits a surrogate pair")
    assert(ext("&#65;&#x41;") === "AA")
    // invalid: zero digits, overlong, 0, surrogate range, > 0x10FFFF,
    // missing semicolon — all stay byte-literal
    assert(ext("&#;x") === "&#;x")
    assert(ext("&#123456789;") === "&#123456789;", "8+ digits is overlong")
    assert(ext("&#0;") === "&#0;")
    assert(ext("&#xD800; &#xDFFF;") === "&#xD800; &#xDFFF;")
    assert(ext("&#x110000;") === "&#x110000;")
    assert(ext("&#233") === "&#233", "unterminated ref stays literal")
    // single-pass semantics: &amp;#233; is the TEXT &#233;
    assert(ext("&amp;#233;") === "&#233;")
  }

  test("kernel named table ≡ Html.Entities (the oracle list) and NumericPlants decode") {
    assert(graft.expressions.HtmlEntityKernel.Named.toSeq
      .map { case (e, c) => e -> c.toString } ===
      graft.text.Html.Entities,
      "the kernel's named table and the oracle's ordered list must be the same set")
    for ((ent, dec) <- graft.text.Html.NumericPlants)
      assert(ext(s"x${ent}y") === s"x${dec}y", s"plant $ent")
  }

  test("decoded numeric refs feed dedup/search: café via &#233; ≡ café via bytes") {
    import org.apache.spark.sql.functions._
    // two HTML pages whose EXTRACTED text is identical prose — one
    // spells é as a numeric ref, one as raw bytes; exact dedup over
    // the extracted corpus must collide them (the blind spot the
    // kernel closes: pre-r13 the ref survived as junk and the pair
    // never deduped)
    val pages = Seq(
      (1L, "<p>visit the caf&#233; tomorrow</p>"),
      (2L, "<p>visit the café tomorrow</p>"),
      (3L, "<p>a different page</p>")).toDF("doc_id", "html")
    val docs = graft.text.Html.extract(pages, col("html"))
      .select(col("doc_id"), col("text"))
    val flagged = graft.dedup.Dedup.exact(docs)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flagged(1L) === true, "doc 1 is the keeper")
    assert(flagged(2L) === false, "numeric-ref spelling deduped against byte spelling")
    assert(flagged(3L) === true)
    // and search tokenizes the decoded form: a café query hits both
    val toks = docs.select(col("doc_id"),
        graft.GraftFunctions.tokens(col("text")).as("t"))
      .where(array_contains(col("t"), "café"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(toks === Set(1L, 2L))
  }
}
