package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Charset detection + decode over raw fetched bytes — the ingest
  * step BEFORE any text operator ([[graft.expressions.CharsetDetectKernel]]):
  * crawled payloads arrive unlabeled or mislabeled, and tokenize /
  * dedup / quality / langid all assume correct Unicode. One codegen
  * kernel pass, pure projection.
  */
object Charset {
  import org.apache.spark.sql.GraftColumnBridge.{column => gcol, expression => gexpr}

  /** Adds `charset` (utf-8 / utf-16le / utf-16be / latin-1),
    * `had_bom`, `confident` (false on the BOM-less-UTF-16 heuristic
    * and the Latin-1 fallback), and the decoded `text`.
    */
  def decode(media: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val m = gcol(graft.expressions.CharsetDecode(gexpr(col(payloadCol))))
    media
      .withColumn("__c", m)
      .withColumn("charset", col("__c.charset"))
      .withColumn("had_bom", col("__c.had_bom"))
      .withColumn("confident", col("__c.confident"))
      .withColumn("text", col("__c.text"))
      .drop("__c")
  }

  /** Deterministic encoded payloads over the docs table: the SAME
    * text re-encoded per lane — UTF-8 bare, UTF-8 + BOM, UTF-16LE +
    * BOM, UTF-16BE + BOM (all four round-trip verbatim, so the
    * oracle compares the decoded text against the source column
    * directly; the BOM-less-UTF-16 heuristic and Latin-1 fallback
    * lanes are spec-pinned, not gate lanes — their verdicts depend
    * on byte statistics no closed form should re-model).
    */
  def synthFromDocs(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val t = col("text")
    val utf8Bom = lit(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
    val leBom = lit(Array[Byte](0xFF.toByte, 0xFE.toByte))
    val beBom = lit(Array[Byte](0xFE.toByte, 0xFF.toByte))
    docs.select(d, t.as("source_text"),
      when(d % 4 === 0, encode(t, "UTF-8"))
        .when(d % 4 === 1, concat(utf8Bom, encode(t, "UTF-8")))
        .when(d % 4 === 2, concat(leBom, encode(t, "UTF-16LE")))
        .otherwise(concat(beBom, encode(t, "UTF-16BE"))).as("payload"))
  }
}
