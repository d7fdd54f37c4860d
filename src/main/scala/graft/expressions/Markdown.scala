package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Markdown structure extraction — training corpora are markdown-
  * heavy (GitHub READMEs, docs sites, chat exports), and curation
  * keys on structure: heading density, code-block share, link spam,
  * list-to-prose ratio. One linear line-scan pass over the text:
  *
  *  - ATX headings (`#{1,6}` + space — CommonMark requires the
  *    space, `#hashtag` is prose), count + max level;
  *  - fenced code blocks (``` fences toggle; lines inside count as
  *    code and NOTHING else — a `# comment` in code is not a
  *    heading);
  *  - list items (`-`/`*`/`+` + space, or `digit(s)` + `.`/`)` +
  *    space);
  *  - inline links `[text](url)` and images `![alt](url)` (the
  *    image prefix consumes its bracket — never double-counted);
  *  - blockquote lines (`>` prefixed);
  *  - word count over PROSE only (whitespace tokens outside code
  *    fences, heading/list/quote markers stripped).
  *
  * Scope (documented): ATX + fenced + inline-link CommonMark core;
  * setext headings, indented code, ~~~ fences, and reference links
  * are out of scope. Total — any text parses; plain prose reports
  * zeros and its word count.
  */
object MarkdownKernel {
  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    var nHeadings = 0L
    var maxLevel = 0L
    var nCodeBlocks = 0L
    var nCodeLines = 0L
    var nListItems = 0L
    var nLinks = 0L
    var nImages = 0L
    var nQuoteLines = 0L
    var nWords = 0L
    var inFence = false
    val lines = s.split("\n", -1)
    var li = 0
    while (li < lines.length) {
      val line = lines(li)
      val t = line.dropWhile(c => c == ' ' || c == '\t')
      if (t.startsWith("```")) {
        if (!inFence) { inFence = true; nCodeBlocks += 1 }
        else inFence = false
      } else if (inFence) {
        nCodeLines += 1
      } else {
        var prose = line
        if (t.startsWith("#")) {
          var lvl = 0
          while (lvl < t.length && t.charAt(lvl) == '#') lvl += 1
          if (lvl <= 6 && lvl < t.length && t.charAt(lvl) == ' ') {
            nHeadings += 1
            if (lvl > maxLevel) maxLevel = lvl.toLong
            prose = t.substring(lvl + 1)
          }
        } else if (t.startsWith("> ") || t == ">") {
          nQuoteLines += 1
          prose = if (t == ">") "" else t.substring(2)
        } else if ((t.startsWith("- ") || t.startsWith("* ") ||
            t.startsWith("+ "))) {
          nListItems += 1
          prose = t.substring(2)
        } else {
          var dg = 0
          while (dg < t.length && t.charAt(dg).isDigit) dg += 1
          if (dg > 0 && dg + 1 < t.length &&
              (t.charAt(dg) == '.' || t.charAt(dg) == ')') &&
              t.charAt(dg + 1) == ' ') {
            nListItems += 1
            prose = t.substring(dg + 2)
          }
        }
        // inline links/images over the line (image's ! owns its bracket)
        var i = 0
        while (i < prose.length) {
          if (prose.charAt(i) == '[') {
            val isImage = i > 0 && prose.charAt(i - 1) == '!'
            val close = prose.indexOf(']', i + 1)
            if (close > 0 && close + 1 < prose.length &&
                prose.charAt(close + 1) == '(') {
              val paren = prose.indexOf(')', close + 2)
              if (paren > 0) {
                if (isImage) nImages += 1 else nLinks += 1
                i = paren
              }
            }
          }
          i += 1
        }
        // prose word count (markers already stripped)
        var w = 0
        var inWord = false
        var j = 0
        while (j < prose.length) {
          val c = prose.charAt(j)
          if (c == ' ' || c == '\t') inWord = false
          else if (!inWord) { w += 1; inWord = true }
          j += 1
        }
        nWords += w
      }
      li += 1
    }
    new GenericInternalRow(Array[Any](
      nHeadings,
      if (nHeadings == 0L) null else java.lang.Long.valueOf(maxLevel),
      nCodeBlocks, nCodeLines, nListItems, nLinks, nImages, nQuoteLines,
      nWords))
  }
}

/** `markdown_stats(text) → struct<...9 fields>`; see
  * [[MarkdownKernel.stats]].
  */
case class MarkdownStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_headings", LongType),
    StructField("max_heading_level", LongType),
    StructField("n_code_blocks", LongType),
    StructField("n_code_lines", LongType),
    StructField("n_list_items", LongType),
    StructField("n_links", LongType),
    StructField("n_images", LongType),
    StructField("n_quote_lines", LongType),
    StructField("n_prose_words", LongType)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "markdown_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    MarkdownKernel.stats(d.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.MarkdownKernel.stats($d);
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
