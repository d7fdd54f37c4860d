package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftFunctions.hex64

/** Deterministic content-keyed sampling and dataset splitting — the
  * reproducibility backbone of a training-data pipeline: the same
  * document lands in the same split on every run, on any cluster, at
  * any partitioning, because assignment is a pure function of the key
  * (vs `DataFrame.sample`/`randomSplit`, whose outputs depend on seed,
  * partitioning, AND evaluation order — unusable as a stable train/val
  * contract at 100 TB).
  *
  * Assignment: `bucket = hex64(salt|key) mod granularity` — a map-side
  * projection, no shuffle, no state; the portable hash makes every
  * decision reproducible in any engine (the DuckDB oracle recomputes
  * it bit-for-bit).
  */
object Sampling {

  val Granularity = 10000L

  /** Stable [0, granularity) bucket for a key column. */
  def hashBucket(key: Column, salt: String = "split"): Column =
    pmod(hex64(concat(lit(s"$salt|"), key.cast("string"))), lit(Granularity))

  /** Keep a deterministic `rate` fraction of rows by key hash. Unlike
    * `df.sample`, membership is stable across runs/partitionings and
    * joins with any other hash-sampled table of the same keyspace
    * stay consistent (the "sample the user, get all their events"
    * property when keyed on the entity id).
    */
  def sampleByHash(df: DataFrame, key: Column, rate: Double,
      salt: String = "sample"): DataFrame =
    df.filter(hashBucket(key, salt) < lit((rate * Granularity).toLong))

  /** Train/val/test assignment per row: (…, bucket, split) with
    * boundaries at cumulative fractions of [[Granularity]].
    * Defaults 90/5/5.
    */
  def assignSplits(df: DataFrame, key: Column, trainFrac: Double = 0.9,
      valFrac: Double = 0.05, salt: String = "split"): DataFrame = {
    val trainEdge = (trainFrac * Granularity).toLong
    val valEdge = ((trainFrac + valFrac) * Granularity).toLong
    df.withColumn("bucket", hashBucket(key, salt))
      .withColumn("split",
        when(col("bucket") < trainEdge, lit("train"))
          .when(col("bucket") < valEdge, lit("val"))
          .otherwise(lit("test")))
  }
}
