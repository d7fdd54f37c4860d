package graft

import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Measured comparison of the two streaming state-store providers on
  * the stateful sessionization path (`Streams.sessionWindows` over the
  * events table driven as a bounded stream): the HDFS-backed in-memory
  * default vs RocksDB (`GraftSession.RocksDbProvider`).
  *
  * What to expect and why this exists: with state that fits the heap,
  * the in-memory provider wins (RocksDB pays JNI + write-ahead
  * overhead per key) — the numbers here quantify that overhead. The
  * RocksDB provider exists for the 100 TB always-on regime where
  * watermark state outgrows executor heap; this smoke is the proof the
  * toggle works end-to-end on the real sessionization query, not a
  * claim that RocksDB is faster on small state.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StreamStateSmoke"`.
  */
object StreamStateSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // stage the single parquet into a directory for the file source
    val staged = java.nio.file.Files.createTempDirectory("sss_events")
    java.nio.file.Files.createSymbolicLink(
      staged.resolve("events.parquet"), java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema

    def run(tag: String): (Double, Long, Long) = {
      val stream = spark.readStream.schema(schema).parquet(staged.toString)
      val ev = stream.select(
        timestamp_micros(graft.events.EventOps.microsOfTsCol(stream)).as("ts"),
        col("user_id"))
      val ckpt = java.nio.file.Files.createTempDirectory(s"sss_ckpt_$tag").toString
      val t0 = System.nanoTime()
      val q = Streams.sessionWindows(ev).writeStream
        .outputMode("append").format("memory").queryName(s"sss_$tag")
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      val emitted = spark.table(s"sss_$tag").count()
      q.stop()
      (sec, stateRows, emitted)
    }

    // interleave two runs per provider and keep the min — the session's
    // first streaming query absorbs codegen/state-store init warmup,
    // which would otherwise bias whichever provider runs first
    def setProvider(cls: String): Unit =
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
    val memProvider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    val runsPer = 2
    val results = (0 until runsPer).flatMap { i =>
      setProvider(memProvider)
      val m = run(s"mem$i")
      setProvider(GraftSession.RocksDbProvider)
      val r = run(s"rocks$i")
      Seq(("mem", m), ("rocks", r))
    }
    val byTag = results.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val (tMem, rowsMem, emittedMem) = byTag("mem").minBy(_._1)
    val (tRocks, rowsRocks, emittedRocks) = byTag("rocks").minBy(_._1)
    assert(rowsMem == rowsRocks && emittedMem == emittedRocks,
      s"providers disagree: state $rowsMem/$rowsRocks emitted $emittedMem/$emittedRocks")

    println(f"""{"sf":"$sfDir","state_rows":$rowsMem,"emitted":$emittedMem,""" +
      f""""runs_per_provider":$runsPer,""" +
      f""""hdfs_mem_sec":$tMem%.2f,"rocksdb_sec":$tRocks%.2f}""")
    spark.stop()
  }
}
