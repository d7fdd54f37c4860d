package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every graft operator assumes:
  * AQE on (runtime skew-join + partition coalescing), shuffle
  * partitions sized for the local harness (on a real cluster this is
  * set to ~2-3x total cores), UTC timezone for oracle parity.
  */
object GraftSession {

  /** RocksDB-backed streaming state (spillable, incremental-checkpoint)
    * — the right default for 100 TB always-on pipelines whose
    * watermark state outgrows executor heap; the HDFS-backed in-memory
    * default is fine for small state. Also settable per-session at
    * runtime via `spark.conf.set("spark.sql.streaming.stateStore
    * .providerClass", RocksDbProvider)`.
    */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def builder(master: String = "local[*]", shufflePartitions: Int = 32,
      rocksDbStateStore: Boolean = false): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (rocksDbStateStore)
      b.config("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
    else b
  }

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    GraftFunctions.register(s)
    s
  }
}
