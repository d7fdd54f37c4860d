package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SVG metadata triage — the TEXT image format (icons, logos,
  * figures — a top web image type that never routes through the
  * binary decoders): `<svg>` root behind optional XML declaration /
  * comments / DOCTYPE, `width`/`height` attributes with their unit
  * suffixes (`100`, `100px`, `2.5em` — the numeric prefix is the
  * value; `%` sizes are relative and reported as such), the
  * `viewBox` quad, shape/group/text element counts (name-boundary
  * checked — `<pathological-elem>` is NOT a `<path>`), an embedded
  * `<script>` flag (the sanitization signal — SVG is an XSS vector
  * and a curation pipeline must see it), and the `<title>` text
  * entity-decoded through the shared kernel.
  *
  * Same posture as the sitemap/feed walks: machine-grade markup, one
  * linear scan, no XML library on the hot path. Never throws; null
  * for non-SVG text.
  */
object SvgMetaKernel {

  /** Attribute value in the ROOT tag head only. */
  private def attr(head: String, name: String): String = {
    val k = head.indexOf(name + "=\"")
    if (k < 0) return null
    // require a boundary before the name (space) so `data-width=`
    // never matches `width=`
    if (k > 0 && !Character.isWhitespace(head.charAt(k - 1))) return null
    val vs = k + name.length + 2
    val ve = head.indexOf('"', vs)
    if (ve < 0) null else head.substring(vs, ve)
  }

  /** Leading float of a length value; NaN when absent/unparseable or
    * relative (`%`).
    */
  private def lengthOf(v: String): Double = {
    if (v == null) return Double.NaN
    val t = v.trim
    if (t.isEmpty || t.endsWith("%")) return Double.NaN
    var i = 0
    while (i < t.length && (t.charAt(i).isDigit || t.charAt(i) == '.' ||
        (i == 0 && (t.charAt(i) == '-' || t.charAt(i) == '+')))) i += 1
    if (i == 0) return Double.NaN
    try t.substring(0, i).toDouble
    catch { case _: NumberFormatException => Double.NaN }
  }

  /** Count `<name` occurrences where the name ENDS there (followed
    * by whitespace, `>`, or `/`).
    */
  private def countElems(s: String, name: String): Long = {
    val pat = "<" + name
    var n = 0L
    var i = s.indexOf(pat)
    while (i >= 0) {
      val after = i + pat.length
      if (after >= s.length) return n
      val c = s.charAt(after)
      if (c == '>' || c == '/' || Character.isWhitespace(c)) n += 1
      i = s.indexOf(pat, i + 1)
    }
    n
  }

  private val Shapes =
    Seq("path", "rect", "circle", "ellipse", "line", "polygon", "polyline")

  /** Struct of 10 fields (see [[SvgMeta.dataType]]) or null. */
  def parse(text: UTF8String): InternalRow = {
    if (text == null) return null
    val s = text.toString
    // skip declaration / comments / doctype to the root tag
    var i = 0
    var rootAt = -1
    while (rootAt < 0 && i < s.length) {
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
      } else if (s.startsWith("<!", lt)) {
        val e = s.indexOf('>', lt)
        if (e < 0) return null
        i = e + 1
      } else if (s.startsWith("<svg", lt) &&
          (lt + 4 >= s.length || s.charAt(lt + 4) == '>' ||
            s.charAt(lt + 4) == '/' ||
            Character.isWhitespace(s.charAt(lt + 4)))) {
        rootAt = lt
      } else return null
    }
    if (rootAt < 0) return null
    val headEnd = s.indexOf('>', rootAt)
    if (headEnd < 0) return null
    val head = s.substring(rootAt, headEnd)
    val w = lengthOf(attr(head, "width"))
    val h = lengthOf(attr(head, "height"))
    var vbW = Double.NaN
    var vbH = Double.NaN
    val vb = attr(head, "viewBox")
    if (vb != null) {
      val parts = vb.trim.split("[\\s,]+")
      if (parts.length == 4) {
        try {
          vbW = parts(2).toDouble
          vbH = parts(3).toDouble
        } catch { case _: NumberFormatException => }
      }
    }
    var nShapes = 0L
    Shapes.foreach(nm => nShapes += countElems(s, nm))
    val nGroups = countElems(s, "g")
    val nText = countElems(s, "text")
    val hasScript = countElems(s, "script") > 0
    val title = {
      val t0 = s.indexOf("<title>")
      val t1 = if (t0 < 0) -1 else s.indexOf("</title>", t0)
      if (t1 < 0) null
      else HtmlEntityKernel.decode(
        UTF8String.fromString(s.substring(t0 + 7, t1))).toString
    }
    def d(v: Double): Any =
      if (java.lang.Double.isNaN(v)) null else java.lang.Double.valueOf(v)
    new GenericInternalRow(Array[Any](
      d(w), d(h), d(vbW), d(vbH), nShapes, nGroups, nText,
      hasScript,
      if (title == null) null else UTF8String.fromString(title)))
  }
}

/** Deterministic SVG documents from (doc_id, doc text): width/height
  * lanes rotate bare / `px`-suffixed / absent-with-viewBox-only
  * (d%3), a fractional-width lane (d%8==5), shape counts re-derived
  * from doc_id, a nested group, a `<pathological-elem/>` decoy that
  * must NOT count as `<path>` (d%6==2), an embedded `<script>` on
  * d%7==3, and a `<title>` carrying a planted entity AND the doc's
  * real first 20 chars (absent on d%4==0). d%2==0 docs lead with an
  * XML declaration, d%5==1 with a comment before the root.
  */
object SvgSynthKernel {
  def synth(d: Long, text: String): String = {
    val sb = new StringBuilder
    if (d % 2 == 0) sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    if (d % 5 == 1) sb.append("<!-- generator: synth -->\n")
    val w: Double = 100 + d % 400 + (if (d % 8 == 5) 0.5 else 0.0)
    val h = 50 + d % 300
    val wStr = if (d % 8 == 5) w.toString else (100 + d % 400).toString
    sb.append("<svg xmlns=\"http://www.w3.org/2000/svg\"")
    (d % 3) match {
      case 0 => sb.append(s""" width="$wStr" height="$h"""")
      case 1 => sb.append(s""" width="${wStr}px" height="${h}px"""")
      case _ => // absent: viewBox only
    }
    sb.append(s""" viewBox="0 0 ${100 + d % 400} $h">""").append('\n')
    if (d % 4 != 0) {
      val snip = text.substring(0, math.min(20, text.length))
        .replace('\r', ' ').replace('\n', ' ')
        .replace("&", "&amp;").replace("<", "&lt;")
      sb.append(s"<title>Icon &amp; art $d $snip</title>\n")
    }
    sb.append(s"""<g id="layer$d">""").append('\n')
    for (j <- 0L until d % 4)
      sb.append(s"""<path d="M0 0 L$j $j Z"/>""").append('\n')
    for (j <- 0L until (d + 1) % 3)
      sb.append(s"""<rect x="$j" y="0" width="10" height="10"/>""")
        .append('\n')
    if (d % 2 == 0) sb.append("""<circle cx="5" cy="5" r="4"/>""").append('\n')
    for (j <- 0L until d % 3)
      sb.append(s"""<text x="0" y="$j">label $j</text>""").append('\n')
    if (d % 6 == 2) sb.append("<pathological-elem/>\n")
    if (d % 7 == 3) sb.append("<script>var x=1;</script>\n")
    sb.append("</g>\n</svg>\n")
    sb.toString
  }
}

/** `svg_meta(text) → struct<...9 fields>`; see
  * [[SvgMetaKernel.parse]].
  */
case class SvgMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("width", DoubleType),
    StructField("height", DoubleType),
    StructField("vb_width", DoubleType),
    StructField("vb_height", DoubleType),
    StructField("n_shapes", LongType),
    StructField("n_groups", LongType),
    StructField("n_text", LongType),
    StructField("has_script", BooleanType),
    StructField("title", StringType)))
  override def nullable: Boolean = true
  override def prettyName: String = "svg_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got $other")
    }

  override def nullSafeEval(d: Any): Any =
    SvgMetaKernel.parse(d.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      |${ev.value} = graft.expressions.SvgMetaKernel.parse($d);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `svg_synth(doc_id, text) → string`; see [[SvgSynthKernel.synth]]. */
case class SvgSynth(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "svg_synth"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, string) input, got $other")
    }

  override def nullSafeEval(d: Any, t: Any): Any =
    UTF8String.fromString(
      SvgSynthKernel.synth(d.asInstanceOf[Long], t.toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, t) => s"""
      |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
      |  graft.expressions.SvgSynthKernel.synth($d, $t.toString()));
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}
