package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RSS 2.0 / Atom feed parse — the crawl-side discovery surface the
  * sitemap walk doesn't cover: feeds announce new documents, and a
  * freshness-aware crawler ingests both. One linear scan (no XML
  * library on the hot path — same posture as the sitemap kernel):
  * detect `<rss`/`<feed` behind the optional XML declaration,
  * extract the channel/feed title, then one row per `<item>` /
  * `<entry>`: title (CDATA sections verbatim, otherwise the basic
  * five XML entities decoded via the shared entity kernel), link
  * (RSS element text; Atom `href` attribute), guid / id, and the
  * pubDate / updated string. Never throws; item/byte caps; null for
  * non-feed text.
  */
object FeedItemsKernel {
  val MaxItems = 4096

  private def tagText(s: String, from: Int, to: Int, tag: String): String = {
    val open = "<" + tag
    var i = s.indexOf(open, from)
    var found: String = null
    while (found == null && i >= 0 && i < to) {
      val gt = s.indexOf('>', i)
      if (gt < 0 || gt >= to) return null
      if (s.charAt(gt - 1) == '/') {
        // self-closing — no text
        i = s.indexOf(open, gt)
      } else {
        // require the name to END here (reject <linkFoo> for "link")
        val nameEnd = i + open.length
        val c = if (nameEnd < s.length) s.charAt(nameEnd) else ' '
        if (c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '\r') {
          val close = s.indexOf("</" + tag, gt + 1)
          if (close < 0 || close > to) return null
          found = s.substring(gt + 1, close)
        } else i = s.indexOf(open, gt)
      }
    }
    found
  }

  /** First `<tag ... attr="v">` attribute value in [from, to). */
  private def tagAttr(s: String, from: Int, to: Int, tag: String,
      attr: String): String = {
    var i = s.indexOf("<" + tag, from)
    while (i >= 0 && i < to) {
      val gt = s.indexOf('>', i)
      if (gt < 0 || gt >= to) return null
      val head = s.substring(i, gt)
      val k = head.indexOf(attr + "=\"")
      if (k >= 0) {
        val vStart = k + attr.length + 2
        val vEnd = head.indexOf('"', vStart)
        if (vEnd > 0) return head.substring(vStart, vEnd)
      }
      i = s.indexOf("<" + tag, gt)
    }
    null
  }

  private def decodeText(raw: String): String = {
    if (raw == null) return null
    val t = raw.trim
    if (t.startsWith("<![CDATA[") && t.endsWith("]]>"))
      t.substring(9, t.length - 3)
    else
      HtmlEntityKernel.decode(UTF8String.fromString(t)).toString
  }

  private def str(v: String): UTF8String =
    if (v == null) null else UTF8String.fromString(v)

  /** Struct (feed_type, feed_title, items: array<struct>) or null. */
  def parse(text: UTF8String): InternalRow = {
    if (text == null) return null
    val s = text.toString
    // skip XML declaration / whitespace / comments to the root tag
    var i = 0
    var root: String = null
    while (root == null && i < s.length) {
      val lt = s.indexOf('<', i)
      if (lt < 0) return null
      if (s.startsWith("<?", lt)) {
        val e = s.indexOf("?>", lt)
        if (e < 0) return null
        i = e + 2
      } else if (s.startsWith("<!--", lt)) {
        val e = s.indexOf("-->", lt)
        if (e < 0) return null
        i = e + 3
      } else if (s.startsWith("<rss", lt)) root = "rss"
      else if (s.startsWith("<feed", lt)) root = "atom"
      else return null
    }
    val isRss = root == "rss"
    val (itemTag, scopeStart) =
      if (isRss) {
        val ch = s.indexOf("<channel")
        if (ch < 0) return null
        ("item", ch)
      } else ("entry", 0)
    val firstItem = s.indexOf("<" + itemTag, scopeStart)
    val headEnd = if (firstItem < 0) s.length else firstItem
    val feedTitle = decodeText(tagText(s, scopeStart, headEnd, "title"))
    val items = new scala.collection.mutable.ArrayBuffer[Any]()
    var pos = firstItem
    while (pos >= 0 && items.length < MaxItems) {
      val gt = s.indexOf('>', pos)
      if (gt < 0) return null
      val close = s.indexOf("</" + itemTag, gt)
      if (close < 0) return null
      val title = decodeText(tagText(s, gt, close, "title"))
      val link =
        if (isRss) decodeText(tagText(s, gt, close, "link"))
        else tagAttr(s, gt, close, "link", "href")
      val guid =
        if (isRss) decodeText(tagText(s, gt, close, "guid"))
        else decodeText(tagText(s, gt, close, "id"))
      val ts =
        if (isRss) decodeText(tagText(s, gt, close, "pubDate"))
        else decodeText(tagText(s, gt, close, "updated"))
      items += InternalRow(items.length.toLong, str(title), str(link),
        str(guid), str(ts))
      pos = s.indexOf("<" + itemTag, close)
    }
    if (items.isEmpty && feedTitle == null) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(root), str(feedTitle),
      new GenericArrayData(items.toArray)))
  }
}

/** `feed_items(text) → struct<feed_type, feed_title,
  * items array<struct<item_idx, title, link, guid, published>>>`;
  * see [[FeedItemsKernel.parse]].
  */
case class FeedItems(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("feed_type", StringType),
    StructField("feed_title", StringType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item_idx", LongType),
      StructField("title", StringType),
      StructField("link", StringType),
      StructField("guid", StringType),
      StructField("published", StringType))), containsNull = false))))
  override def nullable: Boolean = true
  override def prettyName: String = "feed_items"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    FeedItemsKernel.parse(d.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.FeedItemsKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
