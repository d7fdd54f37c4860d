package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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

  /** JDBC vector table (reference: io/postgres.py:17 — server-side
    * cursor batching becomes JDBC partitioned reads; pass
    * partitionColumn bounds for parallel scans of large tables).
    */
  def jdbcVectors(spark: SparkSession, url: String, table: String,
      indexColumn: String, vectorColumn: String,
      numPartitions: Int = 8,
      lowerBound: Option[Long] = None, upperBound: Option[Long] = None,
      properties: java.util.Properties = new java.util.Properties()): DataFrame = {
    val reader = spark.read
    val df = (lowerBound, upperBound) match {
      case (Some(lo), Some(hi)) =>
        reader.jdbc(url, table, indexColumn, lo, hi, numPartitions, properties)
      case _ => reader.jdbc(url, table, properties)
    }
    normalize(df, indexColumn, vectorColumn)
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
