package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions.{col, expr, xxhash64}
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev tool (optimization rounds): run named `SparkEntry.queries` rows
  * with a QueryExecutionListener attached, printing EVERY query
  * execution a row triggers (cache builds, index writes, counts — the
  * build-phase work JobProfile can only see as anonymous jobs) with
  * its duration and executed (post-AQE) plan tree annotated with
  * accumulated per-operator metrics. Usage:
  *   sbt "runMain graft.MetricsDump <sfDir> <q1,q2,...> [minMs]"
  */
object MetricsDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val minMs = if (args.length > 2) args(2).toLong else 300L
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

    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int,
        sb: StringBuilder): Unit = {
      val interesting = p.metrics.toSeq
        .filter { case (k, m) =>
          m.value > 0 && (k.toLowerCase.contains("time") ||
            k.contains("duration") || k == "numOutputRows")
        }
        .sortBy(_._1)
        .map { case (k, m) => s"$k=${m.value}" }
      sb.append(("  " * depth) + p.nodeName + "  " +
        interesting.mkString(" ") + "\n")
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, depth + 1, sb)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1, sb)
        case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          sb.append(("  " * (depth + 1)) + "(reused)\n")
        case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          // the real work of a materializing count lives in the cached
          // child plan — walk it (its metrics accumulate on first build)
          sb.append(("  " * (depth + 1)) + "(cache->)\n")
          walk(i.relation.cachedPlan, depth + 2, sb)
        case _ => p.children.foreach(walk(_, depth + 1, sb))
      }
      p.subqueries.foreach { sq =>
        sb.append(("  " * (depth + 1)) + "[subquery]\n")
        walk(sq, depth + 2, sb)
      }
    }

    @volatile var enabled = false
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        val ms = durationNs / 1e6
        if (enabled && ms >= minMs) {
          val sb = new StringBuilder
          sb.append(f"--- exec $funcName ${ms}%9.1f ms ---\n")
          try walk(qe.executedPlan, 0, sb)
          catch { case e: Throwable => sb.append(s"  (walk failed: $e)\n") }
          println(sb.result())
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          error: Exception): Unit = ()
    })

    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"warmup: $e") }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { pass =>
        enabled = pass == 2 // warm pass silent; measured pass dumped
        println(s"=== $name pass $pass ===")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).collect()
        val t2 = System.nanoTime()
        // give the listener bus a moment to drain before the footer
        Thread.sleep(500)
        println(f"=== $name pass $pass build=${(t1 - t0) / 1e9}%.2f s " +
          f"exec=${(t2 - t1) / 1e9}%.2f s")
        enabled = false
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
