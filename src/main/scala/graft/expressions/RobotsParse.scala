package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt group/rule extraction as ONE linear codegen pass — the
  * kernel upgrade of the interpreted per-file array fold that used to
  * live in `Curation.parseRobotsTxt` (the engine's hottest remaining
  * interpreted path in r13; the HtmlEntityKernel convention applied).
  * Semantics are the RFC 9309 subset the operator documents, frozen
  * byte-for-byte against the fold it replaces:
  *
  *  - lines split on `\n`; `#` starts a comment; surrounding
  *    space/tab/CR trims away
  *  - field names (`User-agent` / `Allow` / `Disallow`) match
  *    case-insensitively at line start, optional blanks before the
  *    colon, optional blanks before the value
  *  - consecutive `User-agent` lines form one group; a group's rules
  *    run until the next group starts (a UA line following a rule
  *    line); blank/unknown lines (Sitemap, Crawl-delay, …) affect
  *    NEITHER the group id nor the in-UA-run flag
  *  - a group applies when any of its agents is `*` or equals the
  *    requested agent (case-insensitive exact token); empty-path
  *    rules drop as no-ops
  *
  * Output: the matched `(path_prefix, allow)` rules in file order.
  * Longest-match/Allow-wins precedence is resolved downstream at gate
  * time (`Curation.applyRobots`), exactly as with hand-written rules.
  */
object RobotsParseKernel {
  private val Ua = "user-agent"
  private val Al = "allow"
  private val Dis = "disallow"

  /** Does `s` start (at `off`) with `field`, case-insensitively,
    * followed by optional blanks and a colon? Returns the index just
    * past the colon, or -1.
    */
  private def fieldColon(s: String, field: String): Int = {
    if (s.length < field.length) return -1
    var i = 0
    while (i < field.length) {
      val c = s.charAt(i)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (lc != field.charAt(i)) return -1
      i += 1
    }
    var j = field.length
    while (j < s.length && (s.charAt(j) == ' ' || s.charAt(j) == '\t')) j += 1
    if (j < s.length && s.charAt(j) == ':') j + 1 else -1
  }

  private def trimmedValue(s: String, from: Int): String = {
    var i = from
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    s.substring(i) // trailing blanks already trimmed with the line
  }

  /** Matched `(path_prefix, allow)` rules for `txt` under
    * `agentLower` (pre-lowercased operator constant). Never throws;
    * an empty/ruleless file is an empty array, not null.
    */
  def rules(txt: UTF8String, agentLower: String): ArrayData = {
    val s = if (txt == null) "" else txt.toString
    // entries: (gid, isAllow) for rules, gid for UA lines feeding the
    // matched-group set; one pass, file order preserved
    val ruleGid = new ArrayBuffer[Int]()
    val ruleAllow = new ArrayBuffer[Boolean]()
    val rulePath = new ArrayBuffer[String]()
    val matchedGids = new java.util.HashSet[Integer]()
    var gid = 0
    var lastUa = false
    var lineStart = 0
    val n = s.length
    while (lineStart <= n) {
      var lineEnd = s.indexOf('\n', lineStart)
      if (lineEnd < 0) lineEnd = n
      // comment strip + trim [ \t\r] both ends, within [lineStart, lineEnd)
      var e = lineStart
      while (e < lineEnd && s.charAt(e) != '#') e += 1
      var b = lineStart
      while (b < e && (s.charAt(b) == ' ' || s.charAt(b) == '\t' ||
        s.charAt(b) == '\r')) b += 1
      while (e > b && (s.charAt(e - 1) == ' ' || s.charAt(e - 1) == '\t' ||
        s.charAt(e - 1) == '\r')) e -= 1
      if (e > b) {
        val line = s.substring(b, e)
        val uaAt = fieldColon(line, Ua)
        if (uaAt >= 0) {
          if (!lastUa) gid += 1
          lastUa = true
          val v = trimmedValue(line, uaAt)
          if (v == "*" || v.toLowerCase(java.util.Locale.ROOT) == agentLower)
            matchedGids.add(gid)
        } else {
          val alAt = fieldColon(line, Al)
          val disAt = if (alAt < 0) fieldColon(line, Dis) else -1
          if (alAt >= 0 || disAt >= 0) {
            lastUa = false
            val v = trimmedValue(line, if (alAt >= 0) alAt else disAt)
            if (v.nonEmpty) {
              ruleGid += gid
              ruleAllow += (alAt >= 0)
              rulePath += v
            }
          }
          // blank/unknown lines: gid and lastUa both unchanged
        }
      }
      lineStart = lineEnd + 1
    }
    val out = new ArrayBuffer[Any](ruleGid.length)
    var i = 0
    while (i < ruleGid.length) {
      if (matchedGids.contains(ruleGid(i)))
        out += InternalRow(UTF8String.fromString(rulePath(i)), ruleAllow(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `robots_rules(txt) → array<struct<path_prefix, allow>>` for the
  * operator-constant agent — see [[RobotsParseKernel.rules]].
  */
case class RobotsRules(child: Expression, agentLower: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("path_prefix", StringType, nullable = false),
    StructField("allow", BooleanType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "robots_rules"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got $other")
  }

  override def nullSafeEval(t: Any): Any =
    RobotsParseKernel.rules(t.asInstanceOf[UTF8String], agentLower)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("agentLower", agentLower,
      "java.lang.String")
    nullSafeCodeGen(ctx, ev, t => s"""
      |${ev.value} = graft.expressions.RobotsParseKernel.rules($t, $agentRef);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
