package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the test corpus layout `<dir>/<name>.parquet`.
  * At production scale the same operators read partitioned/bucketed
  * datasets — nothing in the library assumes single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scale-adaptive scan spread (optimization guide §2.5 "input skew"
    * / §2 "partitioning adaptive rather than a constant"): a small
    * single-row-group parquet file scans as ONE partition, so every
    * expensive per-row kernel downstream (MinHash signatures, image/
    * audio decodes, tokenizers) runs single-threaded while the other
    * cores idle — measured 3.6 s single-task cache builds at sf0.1.
    * When the scan's partition count is far below the session's
    * parallelism, round-robin the rows across it; at production scale
    * a table scan arrives with ≥ parallelism partitions and this is a
    * no-op (the gate, not a constant, decides). Row-to-partition
    * assignment is deterministic (sortBeforeRepartition, on by
    * default) and every operator is partition-order independent (the
    * repo's hash-exact gate discipline), so results are unchanged.
    * Applied by the DRIVER-ROW loader ([[SparkEntry]]), not here: the
    * library operators' own plan contracts (map-only triage,
    * exchange-free index serves) stay exactly as spec'd — this is
    * harness-side input conditioning, like the gate's orderBy.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // round-robin, NOT hash-on-row-content: keying the exchange on
    // xxhash64(all columns) was tried (it skips round-robin's
    // sortBeforeRepartition local sort) and REVERTED — referencing
    // every column in the exchange key defeats column pruning at the
    // scan (q1_agg's ReadSchema grew from 6 columns to all 16), which
    // is far worse at scale than the local sort this exchange only
    // pays when the gate fires (i.e. never at production partition
    // counts).
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
