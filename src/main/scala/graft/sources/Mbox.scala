package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** mbox (RFC 4155) mailbox ingest — the framing classic email corpora
  * ship in (Enron, mailing-list archives): messages are concatenated,
  * each starting at a line-anchored `From ` envelope separator, with
  * body lines that themselves begin `From ` stored escaped as
  * `>From ` (the mboxrd convention — which is exactly why the split
  * is SAFE: an unescaped in-body `From ` cannot exist in a compliant
  * mailbox, unlike WARC where bodies may contain the magic and the
  * split must be length-driven instead).
  *
  * Scale shape: split + header extraction are pure string/regex
  * projections — one explode per mailbox blob, zero shuffles.
  */
object Mbox {

  /** Split a mailbox blob into messages: adds `msg_idx` and `message`
    * (envelope line + headers + body, separator restored). Blobs with
    * no envelope line yield zero rows.
    */
  def messages(df: DataFrame, blob: Column): DataFrame =
    df.select(col("*"),
        posexplode(split(concat(lit("\n"), blob), "\nFrom "))
          .as(Seq("__i", "__m")))
      .where(col("__i") > 0)
      .withColumn("msg_idx", (col("__i") - 1).cast("long"))
      .withColumn("message", concat(lit("From "), col("__m")))
      .drop("__i", "__m")

  /** Parse one message column: `envelope_from` (the separator line's
    * sender), `from_addr` / `subject` / `date_hdr` (case-insensitive
    * RFC 822 headers; null when absent), and `body` (past the first
    * blank line, `>From ` unescaped per mboxrd). Pure projection.
    */
  def parseMessages(df: DataFrame, msg: Column): DataFrame = {
    val headers = substring_index(msg, "\n\n", 1)
    def hdr(name: String): Column =
      nullif(regexp_extract(headers, s"(?i)\n$name:\\s*([^\n]+)", 1), lit(""))
    df.withColumn("envelope_from",
        nullif(regexp_extract(msg, "^From ([^ \n]+)", 1), lit("")))
      .withColumn("from_addr", hdr("from"))
      .withColumn("subject", hdr("subject"))
      .withColumn("date_hdr", hdr("date"))
      .withColumn("body",
        regexp_replace(
          msg.substr(length(headers) + 3,
            greatest(length(msg) - length(headers) - 2, lit(0))),
          "\n>From ", "\nFrom "))
  }
}
