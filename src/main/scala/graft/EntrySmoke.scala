package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's smoke check: a PLAIN SparkSession (no graft
  * function registration, no legacy-parquet flags) calling
  * `SparkEntry.entry`. Queries that only work under `GraftSession`'s
  * config would fail here first.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_SMOKE_ROWS=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
