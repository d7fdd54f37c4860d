package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum, xxhash64}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first timed query doesn't absorb the
    // whole-stage-codegen compiler's cold start: touch the scan/agg,
    // window, and join pipelines once on tiny data
    try {
      SparkEntry.entry(spark).count()
      import org.apache.spark.sql.expressions.Window
      val tiny = spark.range(1000).toDF("id")
        .withColumn("k", col("id") % 7)
        .withColumn("v", col("id").cast("double"))
      val w = Window.partitionBy(col("k")).orderBy(col("id"))
      tiny.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .join(org.apache.spark.sql.functions.broadcast(tiny.select(col("k")).distinct()), "k")
        .groupBy("k").agg(sum(col("v"))).count()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        // checksum over every output column: count() alone would let
        // Catalyst prune aggregates/projections and fake the timings
        df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(sum(col("h"))).collect()
      } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
