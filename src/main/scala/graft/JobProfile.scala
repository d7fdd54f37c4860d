package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, xxhash64}

/** Dev tool (optimization rounds): run named `SparkEntry.queries` rows
  * once each with a job listener attached, printing every Spark job's
  * duration and call site — the per-job cost attribution the Spark UI
  * would give, without the UI. Usage:
  *   sbt "runMain graft.JobProfile <sfDir> <q1,q2,...>"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(js.stageInfos.lastOption.map(si =>
            si.name.take(60) + " nTasks=" + si.numTasks))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, site) =>
          val ms = (System.nanoTime() - t0) / 1e6
          println(f"[job] ${je.jobId}%4d ${ms}%9.1f ms  $site")
        }
      }
    })
    // warm the JVM once so the profiled run isn't measuring C2/codegen
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"warmup: $e") }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // run twice: first run shown for build-phase attribution, second
      // run (warm) for steady-state; both labeled
      (1 to 2).foreach { pass =>
        println(s"=== $name pass $pass ===")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).collect()
        val t2 = System.nanoTime()
        println(f"=== $name pass $pass build=${(t1 - t0) / 1e9}%.2f s exec=${(t2 - t1) / 1e9}%.2f s")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
