package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dev tool (r16): split mm_media_triage's driver-side time into
  * construction phases — lane synth Column/Dataset building, the
  * union fold, the triage parse expression, and the actions — to
  * locate the ~5 s the query spends OUTSIDE Spark executions
  * (MetricsDump showed only ~2.2 s of executions in a ~7 s build).
  * Run: sbt "runMain graft.TriagePhases /root/testdata/sf0.1"
  */
object TriagePhases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[phase] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    (1 to 2).foreach { pass =>
      System.err.println(s"=== pass $pass ===")
      val docs = time("load")(Tables.load(spark, dir, "documents"))
      val d = col("doc_id")
      import graft.multimodal.Binary
      val synths: Seq[DataFrame => DataFrame] = Seq(
        Binary.Wav.synthFromDocs(_), Binary.Png.synthFromDocs(_),
        Binary.Jpeg.synthFromDocs(_), Binary.Bmp.synthFromDocs(_),
        Binary.Webp.synthFromDocs(_), Binary.Tiff.synthFromDocs(_),
        Binary.Mp3.synthFromDocs(_), Binary.Flac.synthFromDocs(_),
        Binary.Ogg.synthFromDocs(_), Binary.Mkv.synthFromDocs(_),
        Binary.Avro.synthFromDocs(_), Binary.Parquet.synthFromDocs(_),
        Binary.Orc.synthFromDocs(_), Binary.Gz.synthFromDocs(_),
        Binary.Zstd.synthFromDocs(_), Binary.Ico.synthFromDocs(_),
        Binary.Heif.synthFromDocs(_))
      val familyLanes = time("lanes (17 synths)") {
        synths.zipWithIndex.map { case (synth, k) =>
          synth(docs.where(d % 23 === (k + 1))).select(d, col("payload"))
        }
      }
      val textLane = docs.where(d % 23 === 0 || d % 23 >= 18)
        .select(d, col("text").cast("binary").as("payload"))
      val mixed = time("union fold") {
        (familyLanes :+ textLane).reduce(_.unionAll(_))
          .repartition(spark.sparkContext.defaultParallelism)
      }
      val corpus =
        if (pass == 2) time("localCheckpoint")(mixed.localCheckpoint(true))
        else mixed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tri = time("triage() construct")(Binary.triage(corpus))
      val sorted = time("orderBy construct")(tri.orderBy(d))
      time("collect") {
        sorted.select(xxhash64(sorted.columns.toIndexedSeq.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).collect()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
