package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing stage every
  * web-scale training corpus runs before release (C4/CCNet-style
  * pipelines strip contact info; see also the reference's concern with
  * hostile content in tests/test_persistence_security.py — here the
  * risk is personal data leaking into training text).
  *
  * Four pattern classes are counted and replaced with typed tags, in a
  * fixed stage order — email, IPv4, long digit run (ids/SSNs/accounts),
  * phone — with each stage counting on the PREVIOUS stage's redacted
  * text. The order makes the classes disjoint by construction: an
  * IPv4's octets are gone before the digit-run pass, and digit runs
  * are gone before the looser phone pattern (which would otherwise
  * claim any 9-16 digit span). A single-pass union regex could not
  * attribute a match to a class; four anchored stages can.
  *
  * Every pattern uses only syntax with identical semantics in Java
  * regex (Spark, codegen'd `regexp_replace`/`regexp_extract_all`) and
  * RE2 (DuckDB/Go/Rust engines): character classes, bounded repetition,
  * `\b`, non-capturing groups — no backreferences or lookaround. This
  * keeps redaction results engine-portable, which matters when the
  * scrub decision must be reproducible for audit.
  *
  * Shape: pure map-side projection over the text column — zero
  * shuffles, fully inside WholeStageCodegen, linear in corpus bytes.
  * At 100 TB this is a single streaming pass.
  */
object Pii {

  /** user@host.tld — local part then dotted host with a ≥2-alpha TLD. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** Dotted-quad IPv4, word-bounded so dotted version strings like
    * 1.2.3.4.5 still match only a 4-octet prefix span.
    */
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** An unbroken run of ≥9 digits: national id / account / card
    * numbers. Runs before the phone pass, which would otherwise claim
    * these spans.
    */
  val IdRunRe = "\\d{9,}"

  /** Phone-shaped span: optional +, 9-16 chars of digits with
    * space/hyphen separators, digit-terminated.
    */
  val PhoneRe = "\\+?\\d[\\d -]{7,14}\\d"

  private val Stages: Seq[(String, String, String)] = Seq(
    ("n_email", EmailRe, "<EMAIL>"),
    ("n_ipv4", Ipv4Re, "<IP>"),
    ("n_id", IdRunRe, "<ID>"),
    ("n_phone", PhoneRe, "<PHONE>"))

  /** Per-document PII counts + redacted text. Output: the input
    * columns minus `textCol`, plus n_email/n_ipv4/n_id/n_phone,
    * n_pii (total), and `redacted` (the scrubbed text).
    */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val (red, counts) = Stages.foldLeft((col(textCol), Seq.empty[Column])) {
      case ((t, cs), (name, re, tag)) =>
        val n = size(regexp_extract_all(t, lit(re), lit(0))).cast("long").as(name)
        (regexp_replace(t, re, tag), cs :+ n)
    }
    val keep = docs.columns.filter(_ != textCol).map(col).toSeq
    docs.select(keep ++ counts :+ red.as("redacted"): _*)
      .withColumn("n_pii", col("n_email") + col("n_ipv4") + col("n_id") + col("n_phone"))
  }

  /** Driver-checked form: deterministic planted PII (derived from
    * doc_id on every 7th document, mirrored verbatim in the DuckDB
    * oracle) so the cross-engine check exercises real matches, then
    * counts + md5 of the redacted text (compact equality proxy for the
    * full scrubbed corpus).
    */
  def scrubQuery(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val planted = concat(
      lit(" Contact user"), id.cast("string"), lit("@example.com from 10."),
      (id % 200).cast("string"), lit(".0."), (id % 250).cast("string"),
      lit(" id "), (id % 1000000000L + 9000000000L).cast("string"),
      lit(" call +1 555-867-53"), (id % 90 + 10).cast("string"))
    val augmented = docs.withColumn("text",
      when(id % 7 === 0, concat(col("text"), planted)).otherwise(col("text")))
    scrub(augmented)
      .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_id"),
        col("n_phone"), col("n_pii"), md5(col("redacted")).as("redacted_md5"))
  }
}
