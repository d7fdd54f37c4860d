package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.CatalogTableType
import org.apache.spark.sql.functions.col

/** Compaction for bucketed at-rest index tables (round-8 verdict #5 —
  * the missing quarter of the build → serve → add → compact
  * lifecycle; reference maintenance analogue: `storage/redis.py:419`
  * delete / `:590` clear, which rewrite the store in place).
  *
  * Repeated [[graft.ann.Ivf.addToIndex]] /
  * [[graft.ann.Pq.addToCellIndex]] appends accumulate one file set
  * per append inside every bucket — correct (the bucket JOIN stays
  * exchange-free; bucketing metadata is append-stable) but
  * progressively slower to open at serving time. Compaction rewrites
  * the table ONCE through a staging table and swaps it in via a
  * catalog rename: exactly one data rewrite, no window where the
  * table name is unserveable except the metadata swap itself. On a
  * production metastore the rename is a metadata-only operation; the
  * data move is the single bucketed rewrite either way.
  */
object Compaction {

  /** Rewrite bucketed catalog table `table` to EXACTLY one file per
    * bucket (empty buckets write none), preserving the bucket spec,
    * the sort spec, and every `graft.*` table property. `transform`
    * lets callers rewrite rows on the way through (e.g. reassign
    * cells against refreshed centroids); it runs while the original
    * table is still readable.
    *
    * The one-file guarantee comes from repartitioning on the bucket
    * column with the bucket count: `repartition(n, col)` hashes with
    * the same murmur3-pmod function as the bucket layout, so each
    * task holds exactly one bucket's rows and the writer emits one
    * file for it. At target scale size `nBuckets` at save time so a
    * single bucket fits an executor core (the [[graft.ann.Ivf]]
    * docstring contract) — then the compaction tasks are
    * bucket-sized by construction.
    */
  def rewriteBucketed(spark: SparkSession, table: String,
      transform: DataFrame => DataFrame = identity): Unit = {
    val catalog = spark.sessionState.catalog
    val meta = catalog.getTableMetadata(TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"table $table is not bucketed — not a compactable index table"))
    val external = meta.tableType == CatalogTableType.EXTERNAL
    val oldLoc = meta.location
    val staging = s"${table}__compacting"
    spark.sql(s"DROP TABLE IF EXISTS `$staging`")
    // read the FILES, not the catalog table: a scan of the bucketed
    // table advertises HashPartitioning(bucket, n), which lets the
    // planner elide the repartition exchange as already-satisfied —
    // while actually scanning one partition per FILE ("Bucketed:
    // false (disabled by query planner)"), which re-emits the append
    // debris one file per task. The raw parquet read carries no
    // bucketing metadata, so the compacting shuffle genuinely runs.
    // repartition on ALL bucket columns: HashPartitioning over the
    // full column list is what matches the bucket layout's hash — a
    // prefix (e.g. `band` alone for a (band, sig) index) would spread
    // each bucket's rows over several tasks and re-emit multi-file
    // buckets
    val rows = transform(spark.read.parquet(meta.location.toString))
      .repartition(spec.numBuckets, spec.bucketColumnNames.map(col): _*)
    val w0 = rows.write.mode("overwrite").format("parquet")
      .bucketBy(spec.numBuckets,
        spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
    val w1 = if (spec.sortColumnNames.nonEmpty)
      w0.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
    else w0
    val w2 = if (external)
      w1.option("path", s"${oldLoc.getPath}__compact_${System.nanoTime()}")
    else w1
    w2.saveAsTable(staging)
    // index flags (e.g. the PQ residual/nProbe encoding params) must
    // survive compaction — a compacted residual index served without
    // its bias term is the silent-wrong case the props exist to stop
    meta.properties.filter { case (k, _) => k.startsWith("graft.") }.foreach {
      case (k, v) => TableProps.set(spark, staging, k, v)
    }
    spark.sql(s"DROP TABLE `$table`")
    if (external) {
      // DROP on an external table leaves the old file set behind —
      // remove it so compaction actually reclaims the append debris
      val p = new org.apache.hadoop.fs.Path(oldLoc)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
  }

  /** Rewrite an UNBUCKETED catalog table through a staging table and
    * a catalog rename — the same can't-race-its-own-scan idiom as
    * [[rewriteBucketed]] for plain model/ledger tables (r11 verdict
    * item #2: the quota ledger's read-modify-write must not collect a
    * domains-grain table to the driver — a real crawl has 10⁷–10⁸
    * registered domains). `transform` sees the CURRENT rows (read from
    * the files, schema from the catalog so an empty table still
    * reads) and its output becomes the table's new content; the
    * transform's plan must not lazily re-reference the table name
    * itself (pass data through the provided frame).
    */
  def rewriteTable(spark: SparkSession, table: String,
      transform: DataFrame => DataFrame): Unit = {
    val catalog = spark.sessionState.catalog
    val meta = catalog.getTableMetadata(TableIdentifier(table))
    require(meta.bucketSpec.isEmpty,
      s"table $table is bucketed — use rewriteBucketed to preserve the layout")
    val external = meta.tableType == CatalogTableType.EXTERNAL
    val oldLoc = meta.location
    val staging = s"${table}__rewriting"
    spark.sql(s"DROP TABLE IF EXISTS `$staging`")
    val rows = transform(
      spark.read.schema(meta.schema).parquet(oldLoc.toString))
    val w0 = rows.write.mode("overwrite").format("parquet")
    // strip any prior rewrite suffix so repeated batch rewrites don't
    // compound the path name forever
    val base = oldLoc.getPath.replaceAll("__rewrite_\\d+$", "")
    val w1 = if (external)
      w0.option("path", s"${base}__rewrite_${System.nanoTime()}")
    else w0
    w1.saveAsTable(staging)
    meta.properties.filter { case (k, _) => k.startsWith("graft.") }.foreach {
      case (k, v) => TableProps.set(spark, staging, k, v)
    }
    spark.sql(s"DROP TABLE `$table`")
    if (external) {
      val p = new org.apache.hadoop.fs.Path(oldLoc)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
  }

  /** Data files per bucket id of a bucketed catalog table — the
    * compaction observable: N appends leave up to N+1 file sets per
    * bucket; after [[rewriteBucketed]] every count is exactly 1.
    */
  def filesPerBucket(spark: SparkSession, table: String): Map[Int, Int] = {
    val meta = spark.sessionState.catalog.getTableMetadata(TableIdentifier(table))
    val p = new org.apache.hadoop.fs.Path(meta.location)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketId = "_(\\d{5})\\.".r
    val it = fs.listFiles(p, true)
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next().getPath.getName
      if (f.endsWith(".parquet")) names += f
    }
    names.toSeq
      .flatMap(n => bucketId.findFirstMatchIn(n).map(_.group(1).toInt))
      .groupBy(identity).map { case (b, fs0) => b -> fs0.size }
  }
}
