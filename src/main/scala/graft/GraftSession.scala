package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every graft operator assumes:
  * AQE on (runtime skew-join + partition coalescing), shuffle
  * partitions sized for the local harness (on a real cluster this is
  * set to ~2-3x total cores), UTC timezone for oracle parity.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
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

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    GraftFunctions.register(s)
    s
  }
}
