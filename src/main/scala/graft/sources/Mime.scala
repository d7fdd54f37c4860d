package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column => gcol, expression => gexpr}

/** MIME message decode faces — the step between the mbox envelope
  * split ([[Mbox]]) and text operators on an email corpus: real
  * bodies are multipart trees whose leaves arrive base64 or
  * quoted-printable encoded ([[graft.expressions.MimePartsKernel]]).
  */
object Mime {

  /** One row per LEAF part of each message, document order:
    * `mime_valid`, `part_idx`, `content_type`, `charset`,
    * `encoding`, `is_attachment`, `filename`, `decoded_bytes`,
    * `byte_sum` (binary leaves), `decoded_text` (text leaves).
    * Non-MIME payloads keep one all-null row (`explode_outer`).
    * A kernel projection + generate — no shuffle.
    */
  def parts(df: DataFrame, rawCol: Column): DataFrame = {
    val arr = gcol(graft.expressions.MimeParts(gexpr(rawCol)))
    df.withColumn("__mime", arr)
      .withColumn("mime_valid", col("__mime").isNotNull)
      .select(df.columns.map(col) :+ col("mime_valid") :+
        explode_outer(col("__mime")).as("__p"): _*)
      .select(df.columns.map(col) :+ col("mime_valid") :+
        col("__p.part_idx").as("part_idx") :+
        col("__p.content_type").as("content_type") :+
        col("__p.charset").as("charset") :+
        col("__p.encoding").as("encoding") :+
        col("__p.is_attachment").as("is_attachment") :+
        col("__p.filename").as("filename") :+
        col("__p.decoded_bytes").as("decoded_bytes") :+
        col("__p.byte_sum").as("byte_sum") :+
        col("__p.decoded_text").as("decoded_text"): _*)
  }

  /** Header decode at message grain: `mail_valid`, the From mailbox
    * split into `from_addr` + RFC 2047-decoded `from_name`,
    * `to_addr`, decoded `subject`, `date_raw`, `message_id`. A
    * kernel projection — no shuffle.
    */
  def headers(df: DataFrame, rawCol: Column): DataFrame = {
    val h = gcol(graft.expressions.MailHeaders(gexpr(rawCol)))
    df.withColumn("__h", h)
      .select(df.columns.map(col) :+
        col("__h").isNotNull.as("mail_valid") :+
        col("__h.from_addr").as("from_addr") :+
        col("__h.from_name").as("from_name") :+
        col("__h.to_addr").as("to_addr") :+
        col("__h.subject").as("subject") :+
        col("__h.date_raw").as("date_raw") :+
        col("__h.message_id").as("message_id"): _*)
  }
}
