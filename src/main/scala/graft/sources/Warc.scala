package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record handling — the wire format web-scale
  * corpora actually arrive in (Common Crawl ships WARC): a crawl
  * ingest splits the archive stream into records by their declared
  * Content-Length (see [[graft.expressions.WarcSplitKernel]] — bodies
  * may legally contain the record magic, so pattern splitting is
  * WRONG), then projects the header fields + body every downstream
  * curation stage keys on.
  *
  * Scale shape: the split is one codegen kernel pass per archive
  * blob + an explode; field extraction is a pure projection (anchored
  * regexes + one offset substring) — zero shuffles end to end.
  */
object Warc {

  /** Render a record (the writer face — also the synth device):
    * version line, WARC-Type, WARC-Target-URI, Content-Length, blank
    * line, body, record separator.
    */
  def record(warcType: Column, targetUri: Column, body: Column): Column =
    concat(lit("WARC/1.0\r\nWARC-Type: "), warcType,
      lit("\r\nWARC-Target-URI: "), targetUri,
      // Content-Length is OCTETS (ISO 28500 §5.3) — byte length, which
      // the split kernel walks; parseRecords' char-offset body slice
      // assumes single-byte bodies (ASCII crawl payloads) — multibyte
      // bodies should be sliced from the kernel's binary records
      lit("\r\nContent-Length: "), length(body.cast("binary")).cast("string"),
      lit("\r\n\r\n"), body, lit("\r\n\r\n"))

  /** Split an archive blob into records: adds `rec_idx` (0-based
    * position in the stream) and `record` (string). Invalid streams
    * yield zero rows for that blob (the kernel returns null).
    */
  def splitRecords(df: DataFrame, blob: Column): DataFrame =
    df.withColumn("__recs",
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.expressions.WarcSplit(
            org.apache.spark.sql.GraftColumnBridge.expression(
              blob.cast("binary")))))
      .select(col("*"), posexplode(col("__recs")).as(Seq("rec_idx", "__rec")))
      .withColumn("rec_idx", col("rec_idx").cast("long"))
      .withColumn("record", col("__rec").cast("string"))
      .drop("__recs", "__rec")

  /** Render one `.warc.gz` member: [[record]] framed as its own gzip
    * member (the Common Crawl layout — one member per record, so
    * archives split on member boundaries without a full gunzip).
    */
  def gzMember(warcType: Column, targetUri: Column, body: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.GzipCompress(
        org.apache.spark.sql.GraftColumnBridge.expression(
          record(warcType, targetUri, body).cast("binary"))))

  /** Split a `.warc.gz` archive blob (concatenated gzip members, one
    * or more WARC records per member) into records: adds `member_idx`
    * (member position in the blob), `rec_idx` (record position within
    * the member), and `record` (string). The member walk and the
    * record walk are BOTH real decodes — RFC 1952 header/trailer with
    * CRC32+ISIZE verification around a raw-DEFLATE inflate
    * ([[graft.expressions.GzipKernel]]), then the Content-Length
    * offset walk ([[graft.expressions.WarcSplitKernel]]). Invalid
    * blobs/members yield zero rows (kernels return null). Per-member
    * decode budget `maxLen` is a plan literal (bomb guard).
    */
  def splitRecordsGz(df: DataFrame, blob: Column,
      maxLen: Int = 1 << 24): DataFrame =
    df.withColumn("__members",
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.expressions.GzipMembers(
            org.apache.spark.sql.GraftColumnBridge.expression(
              blob.cast("binary")), maxLen)))
      .select(col("*"), posexplode(col("__members")).as(Seq("member_idx", "__m")))
      .withColumn("__recs",
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.expressions.WarcSplit(
            org.apache.spark.sql.GraftColumnBridge.expression(col("__m")))))
      .select(col("*"), posexplode(col("__recs")).as(Seq("rec_idx", "__rec")))
      .withColumn("member_idx", col("member_idx").cast("long"))
      .withColumn("rec_idx", col("rec_idx").cast("long"))
      .withColumn("record", col("__rec").cast("string"))
      .drop("__members", "__m", "__recs", "__rec")

  /** Project the curation-relevant fields of a record column:
    * `warc_valid` (magic + header terminator + a parseable
    * Content-Length), `warc_type`, `target_uri`, `content_length`,
    * `body` (exactly Content-Length chars past the blank line), and
    * `length_ok` (declared length consistent with the physical
    * record). Pure projection.
    */
  def parseRecords(df: DataFrame, rec: Column): DataFrame = {
    val headers = substring_index(rec, "\r\n\r\n", 1)
    val clen = regexp_extract(rec, "\r\nContent-Length: ([0-9]+)\r\n", 1)
    val valid = rec.startsWith("WARC/1.0\r\n") &&
      rec.contains("\r\n\r\n") && clen =!= ""
    val n = when(valid, clen.cast("long"))
    df.withColumn("warc_valid", valid)
      .withColumn("warc_type",
        when(valid, nullif(
          regexp_extract(rec, "\r\nWARC-Type: ([^\r\n]+)\r\n", 1), lit(""))))
      .withColumn("target_uri",
        when(valid, nullif(
          regexp_extract(rec, "\r\nWARC-Target-URI: ([^\r\n]+)\r\n", 1), lit(""))))
      .withColumn("content_length", n)
      .withColumn("body",
        when(valid, rec.substr(length(headers) + 5, n.cast("int"))))
      .withColumn("length_ok",
        when(valid, length(rec) === length(headers) + lit(4) + n))
  }

  /** Parse the HTTP response message carried by a WARC `response`
    * record's body (ISO 28500 stores the raw HTTP message; the
    * crawl-relevant fields live in its status line and headers):
    * `http_valid` (an HTTP/1.x status line and a header terminator),
    * `http_status`, `http_reason`, `content_type` (lowercased media
    * type, parameters stripped), `charset` (from the Content-Type
    * parameter, lowercased; null when absent), and `http_body` (the
    * payload past the header block — what html extraction consumes).
    * Header-name matching is case-insensitive per RFC 9110. Pure
    * projection — anchored regexes + one offset substring, zero
    * shuffles at any scale.
    */
  def parseHttp(df: DataFrame, body: Column): DataFrame = {
    val statusLine = "^HTTP/1\\.[01] ([0-9]{3}) ([^\r\n]*)\r\n"
    val valid = regexp_extract(body, statusLine, 1) =!= "" &&
      body.contains("\r\n\r\n")
    val headers = substring_index(body, "\r\n\r\n", 1)
    df.withColumn("http_valid", valid)
      .withColumn("http_status",
        when(valid, regexp_extract(body, statusLine, 1).cast("long")))
      .withColumn("http_reason",
        when(valid, regexp_extract(body, statusLine, 2)))
      .withColumn("content_type",
        when(valid, nullif(lower(trim(regexp_extract(body,
          "(?i)\r\ncontent-type:\\s*([^;\r\n]+)", 1))), lit(""))))
      .withColumn("charset",
        when(valid, nullif(lower(regexp_extract(body,
          "(?i)\r\ncontent-type:[^\r\n]*;\\s*charset=\"?([A-Za-z0-9_.:-]+)", 1)),
          lit(""))))
      .withColumn("http_body",
        when(valid, body.substr(length(headers) + 5,
          greatest(length(body) - length(headers) - 4, lit(0)))))
  }
}
