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
}
