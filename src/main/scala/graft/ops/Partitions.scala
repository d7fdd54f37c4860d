package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for compute-heavy narrow stages. */
object Partitions {

  /** Repartition `df` up to the cluster's parallelism ONLY when the
    * current plan has fewer partitions — the test-scale case where one
    * tiny parquet file (one row group, unsplittable below it) pins a
    * whole narrow pipeline (tokenize → explode → hash) to a single
    * task on a 32-core box. At production scale a corpus scan has
    * orders of magnitude more partitions than cores, the guard is
    * false, and NO shuffle is added — this is deliberately not an
    * unconditional repartition, which would reshuffle the full corpus
    * for nothing. Call it on a narrow (few-column) projection so the
    * rows that do move are small.
    */
  def widened(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // df.rdd forces eager physical planning on the driver (no job) and
    // reads the PRE-AQE partition count — acceptable because callers
    // hand it a narrow projection right off a scan; don't call it on
    // frames whose planning is expensive or whose parallelism AQE
    // later rewrites
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
