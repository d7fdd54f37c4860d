package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, xxhash64}

/** Vector-table ingestion (reference: lshrs/io/parquet.py
  * iter_parquet_vectors and lshrs/io/postgres.py iter_postgres_vectors,
  * which stream (index, vector) batches into the indexer).
  *
  * In Spark the "streaming batches without exhausting memory" concern
  * dissolves: sources are partitioned scans and the engine handles
  * spill/parallelism. These helpers normalize any source to the
  * (vec_id, embedding) shape the LSH/ANN operators consume.
  */
object Sources {

  /** Normalize column names to the engine's (vec_id, embedding). */
  def normalize(df: DataFrame, indexColumn: String, vectorColumn: String): DataFrame =
    df.select(
      col(indexColumn).cast("long").as("vec_id"),
      col(vectorColumn).as("embedding"))

  /** Parquet vector table (reference: io/parquet.py:46). */
  def parquetVectors(spark: SparkSession, path: String,
      indexColumn: String = "vec_id", vectorColumn: String = "embedding"): DataFrame =
    normalize(spark.read.parquet(path), indexColumn, vectorColumn)

  private def quoteIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** The SELECT the JDBC scan wraps — mirrors the reference's
    * io/postgres.py:147 _build_query option-for-option: an explicit
    * `fetchQuery` wins outright; otherwise schema-qualified table,
    * column projection, WHERE, ORDER BY, and LIMIT compose in the same
    * order with identifiers double-quoted (the psycopg sql.Identifier
    * analogue). WHERE/ORDER BY are raw SQL fragments, as in the
    * reference.
    */
  def buildQuery(table: String, indexColumn: String, vectorColumn: String,
      schema: Option[String] = None,
      whereClause: Option[String] = None,
      orderBy: Option[String] = None,
      limit: Option[Long] = None,
      fetchQuery: Option[String] = None): String =
    fetchQuery.getOrElse {
      val qualified = (schema.map(quoteIdent).toSeq :+ quoteIdent(table)).mkString(".")
      val base =
        s"SELECT ${quoteIdent(indexColumn)}, ${quoteIdent(vectorColumn)} FROM $qualified"
      base +
        whereClause.map(w => s" WHERE $w").getOrElse("") +
        orderBy.map(o => s" ORDER BY $o").getOrElse("") +
        limit.map(n => s" LIMIT $n").getOrElse("")
    }

  /** JDBC vector table (reference: io/postgres.py:17 — server-side
    * cursor batching becomes JDBC partitioned reads; pass
    * partitionColumn bounds for parallel scans of large tables).
    * Filtering/projection options mirror the reference loader via
    * [[buildQuery]]; the query is pushed down to the database as a
    * subquery scan, so a filtered ingest never ships dead rows.
    */
  def jdbcVectors(spark: SparkSession, url: String, table: String,
      indexColumn: String, vectorColumn: String,
      numPartitions: Int = 8,
      lowerBound: Option[Long] = None, upperBound: Option[Long] = None,
      schema: Option[String] = None,
      whereClause: Option[String] = None,
      orderBy: Option[String] = None,
      limit: Option[Long] = None,
      fetchQuery: Option[String] = None,
      properties: java.util.Properties = new java.util.Properties()): DataFrame = {
    // each JDBC partition re-executes the subquery with its own bound
    // predicate; an un-ordered LIMIT would sample a DIFFERENT arbitrary
    // row set per partition and silently drop/duplicate rows
    require(limit.isEmpty || orderBy.nonEmpty ||
        (lowerBound.isEmpty && upperBound.isEmpty),
      "limit with partitioned bounds requires orderBy: each partition " +
        "re-executes the LIMIT subquery and an unordered subset is not stable")
    val query = buildQuery(table, indexColumn, vectorColumn,
      schema, whereClause, orderBy, limit, fetchQuery)
    val dbtable = s"($query) graft_vectors"
    val reader = spark.read
    val df = (lowerBound, upperBound) match {
      case (Some(lo), Some(hi)) =>
        reader.jdbc(url, dbtable, indexColumn, lo, hi, numPartitions, properties)
      case _ => reader.jdbc(url, dbtable, properties)
    }
    normalize(df, indexColumn, vectorColumn)
  }

  /** Archive-shard FILE ingest — the last mile from "blob column" to
    * "bucket of files": every archive operator in the engine
    * (Warc/Wds/Zip/Mbox splitters, the codec kernels) consumes an
    * in-memory payload COLUMN; this face reads real `.warc.gz` /
    * `.tar` / media files from any Hadoop filesystem (local, hdfs,
    * s3a) via Spark's `binaryFile` source and normalizes them to
    * `(shard_id, shard_path, length, payload)` — one row per file,
    * `shard_id = xxhash64(path)` (stable across reruns and cluster
    * sizes, content-independent; `shard_path` keeps the provenance),
    * ready to slot into any `keys`/`doc_id` position downstream:
    * `Wds.samples(binaryShards(spark, dir, "*.tar"), col("payload"),
    * keys = Seq("shard_id"))` is the whole file→samples flow.
    * (Reference analogue: io/parquet.py:47 streams vector batches
    * from real files; this is the archive-grain sibling.)
    *
    * THE CONTRACT: one file = one JVM byte array, so a shard beyond
    * the array ceiling (2 GiB) cannot load — shard archives upstream
    * (Common Crawl WARCs ship ~1 GiB for exactly this class of
    * reason). The face refuses loudly and eagerly: a driver-side
    * length probe (content column PRUNED — binaryFile reads only file
    * status for a path/length projection) rejects any over-limit file
    * with its path, instead of a mid-scan executor OOM/SparkException
    * hours into a 100 TB run. Parallelism is file-grain: files ≤
    * `spark.sql.files.maxPartitionBytes` coalesce into shared tasks,
    * large files get their own.
    */
  def binaryShards(spark: SparkSession, path: String,
      glob: String = "*"): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(path)
    val maxBytes = Int.MaxValue.toLong - 16 // JVM array header headroom
    val tooBig = files.select(col("path"), col("length"))
      .where(col("length") > maxBytes).limit(1).collect()
    require(tooBig.isEmpty, {
      val r = tooBig.head
      s"binaryShards: ${r.getString(0)} is ${r.getLong(1)} bytes — a " +
        "shard must fit one JVM byte array (< 2 GiB); split the " +
        "archive upstream (the splitters walk members/records inside " +
        "a blob, they cannot page a file)"
    })
    files.select(
      xxhash64(col("path")).as("shard_id"),
      col("path").as("shard_path"),
      col("length"),
      col("content").as("payload"))
  }

  /** CSV with a delimited vector column (e.g. "0.1|0.2|...") — the
    * lowest-common-denominator interchange shape.
    */
  def csvVectors(spark: SparkSession, path: String, indexColumn: String,
      vectorColumn: String, delimiter: String = "\\|"): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    raw.select(
      col(indexColumn).cast("long").as("vec_id"),
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.split(col(vectorColumn), delimiter),
        _.cast("float")).as("embedding"))
  }
}
