package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.{FeedItemsKernel, MarkdownKernel}

/** Markdown structure extraction + RSS/Atom feed parse: CommonMark
  * and RFC-shaped hand vectors, scope boundaries, and never-throw
  * sweeps.
  */
class MarkdownFeedSpec extends SparkSpec {

  private def md(s: String) = MarkdownKernel.stats(UTF8String.fromString(s))

  test("markdown: ATX rules — space required, max six, code fences hide everything") {
    val r = md(Seq(
      "# real heading",
      "#hashtag is prose",
      "####### seven is prose",
      "###### six is a heading",
      "```",
      "# not a heading in code",
      "- not a list in code",
      "```",
      "## two").mkString("\n"))
    assert(r.getLong(0) === 3, "headings")
    assert(r.getLong(1) === 6, "max level")
    assert(r.getLong(2) === 1 && r.getLong(3) === 2, "one fence, two code lines")
    assert(r.getLong(4) === 0, "no list items")
    // prose words: 'real heading' 2 + '#hashtag is prose' 3 +
    // '####### seven is prose' 4 + 'six is a heading' 4 + 'two' 1
    assert(r.getLong(8) === 14, "prose words")
  }

  test("markdown: lists, quotes, links vs images, unclosed fence") {
    val r = md(Seq(
      "- a",
      "* b",
      "+ c",
      "12) ordered",
      "3. also",
      "> quoted line",
      ">",
      "see [x](http://a) and ![img](http://b) and [y [nested](u)",
      "```",
      "trailing unclosed fence line").mkString("\n"))
    assert(r.getLong(4) === 5, "list items")
    assert(r.getLong(7) === 2, "quote lines incl. bare >")
    assert(r.getLong(5) === 2, "links: [x] and [nested], image excluded")
    assert(r.getLong(6) === 1, "images")
    assert(r.getLong(2) === 1 && r.getLong(3) === 1, "unclosed fence")
    val zero = md("plain prose only, three lines\nno markers here\nend")
    assert(zero.getLong(0) === 0 && zero.isNullAt(1) && zero.getLong(8) === 9)
  }

  test("feed: RSS link elements vs Atom href attributes; CDATA and entities") {
    val rss = FeedItemsKernel.parse(UTF8String.fromString(
      """<?xml version="1.0"?><!-- c --><rss version="2.0"><channel>
        |<title>T &lt;3</title><link>http://home</link>
        |<item><title><![CDATA[raw & <kept>]]></title>
        |<link>http://a/1</link><guid isPermaLink="false">g1</guid>
        |<pubDate>now</pubDate></item>
        |<item><title>two &amp; half</title><link>http://a/2</link></item>
        |</channel></rss>""".stripMargin))
    assert(rss != null)
    assert(rss.getUTF8String(0).toString === "rss")
    assert(rss.getUTF8String(1).toString === "T <3", "channel title decoded")
    val items = rss.getArray(2)
    assert(items.numElements() === 2)
    val i0 = items.getStruct(0, 5)
    assert(i0.getUTF8String(1).toString === "raw & <kept>", "CDATA verbatim")
    assert(i0.getUTF8String(2).toString === "http://a/1")
    assert(i0.getUTF8String(3).toString === "g1", "guid with attribute")
    val i1 = items.getStruct(1, 5)
    assert(i1.getUTF8String(1).toString === "two & half", "entities decoded")
    assert(i1.isNullAt(4), "absent pubDate null")
    val atom = FeedItemsKernel.parse(UTF8String.fromString(
      """<feed xmlns="http://www.w3.org/2005/Atom"><title>A</title>
        |<entry><title>e0</title><link rel="alternate" href="http://x/0"/>
        |<id>i0</id><updated>u0</updated></entry></feed>""".stripMargin))
    assert(atom.getUTF8String(0).toString === "atom")
    val a0 = atom.getArray(2).getStruct(0, 5)
    assert(a0.getUTF8String(2).toString === "http://x/0", "href attribute")
    assert(a0.getUTF8String(3).toString === "i0")
  }

  test("feed: non-feed refusal and never-throw") {
    assert(FeedItemsKernel.parse(UTF8String.fromString("just prose")) == null)
    assert(FeedItemsKernel.parse(UTF8String.fromString(
      "<html><body>nope</body></html>")) == null)
    assert(FeedItemsKernel.parse(UTF8String.fromString(
      "<?xml version=\"1.0\"?><rss><channel><item><title>cut")) == null,
      "unclosed item refused")
    val rnd = new scala.util.Random(13)
    val frags = Seq("<rss", "<feed", "<channel>", "<item>", "</item>",
      "<![CDATA[", "]]>", "&amp;", "<title>", "href=\"")
    for (_ <- 0 until 400) {
      val s = (0 until rnd.nextInt(12))
        .map(_ => frags(rnd.nextInt(frags.length))).mkString(" x ")
      FeedItemsKernel.parse(UTF8String.fromString(s))
      MarkdownKernel.stats(UTF8String.fromString(s))
    }
  }
}
