package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Shared operator plumbing: the cache-scope pattern and the
  * frequency-cap pruning used across the dedup/text operators (kept in
  * one place so the semantics can't drift between call sites).
  */
object Caching {

  /** Cache-lifecycle helper: force `df`'s blocks (so upstream caches
    * are no longer needed for recomputation), then run `release` to
    * unpersist the intermediates, and hand the still-cached result to
    * the caller. The returned DataFrame is the cache scope —
    * `result.unpersist()` when done leaves zero persistent RDDs behind
    * (asserted by CacheLifecycleSpec). If the result's blocks are later
    * evicted the plan recomputes from source (slower, still correct),
    * UNLESS the released intermediates included a localCheckpoint the
    * lineage depends on — callers releasing checkpoints must document
    * that caveat.
    */
  def materialized(df: DataFrame)(release: => Unit): DataFrame = {
    val out = df.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    release
    out
  }

  /** Drop rows whose `key` value occurs in more than `cap` rows — the
    * quadratic-blow-up guard shared by the shingle/fingerprint
    * self-joins (one window pass, no extra join).
    */
  def capByFrequency(df: DataFrame, key: Column, cap: Long): DataFrame =
    df.withColumn("__df", count(lit(1)).over(Window.partitionBy(key)))
      .filter(col("__df") <= cap).drop("__df")
}
