package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ZIP archive ingest — the container office documents (docx/xlsx),
  * epubs, jars and dataset dumps arrive in: the walk follows
  * EOCD → central directory → per-entry local offset (never a
  * local-header scan — see [[graft.expressions.ZipKernel]]), entries
  * decompress inline with their central-record CRC32 verified.
  *
  * Scale shape: one codegen kernel pass per archive blob + an explode
  * — map-only, zero shuffles; the per-entry decode budget is a plan
  * literal.
  */
object Zip {
  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def expr0(c: Column) =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  /** Explode an archive blob into decompressed entries: adds
    * `entry_idx`, `entry_name`, `entry_data`. Invalid/corrupt
    * archives yield zero rows (the kernel nulls on any structural or
    * CRC violation).
    */
  def entries(df: DataFrame, blob: Column, maxLen: Int = 1 << 24): DataFrame =
    df.withColumn("__e",
        bridge(graft.expressions.ZipEntries(expr0(blob.cast("binary")), maxLen)))
      .select(col("*"), posexplode(col("__e")).as(Seq("entry_idx", "__s")))
      .withColumn("entry_idx", col("entry_idx").cast("long"))
      .withColumn("entry_name", col("__s.name"))
      .withColumn("entry_data", col("__s.data"))
      .drop("__e", "__s")

  /** Build one deterministic archive (writer face / synthesis
    * device): parallel arrays of names, contents and methods
    * (0 stored, 8 deflate).
    */
  def build(names: Column, datas: Column, methods: Column): Column =
    bridge(graft.expressions.ZipBuild(expr0(names), expr0(datas),
      expr0(methods)))
}
