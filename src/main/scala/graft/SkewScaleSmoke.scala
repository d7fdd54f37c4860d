package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Measured evidence for [[graft.ops.Skew.saltedJoin]] on a power-law
  * keyed join — the shape where one hot key owns a third of the fact
  * table and the dimension is too large to broadcast.
  *
  * Three variants over identical data, all forced to shuffle joins:
  *   1. plain join, AQE skew handling OFF — what any engine without
  *      runtime partition splitting does: the hot key's rows serialize
  *      through one task;
  *   2. plain join, AQE skew handling ON — Spark's own runtime
  *      mitigation (GraftSession default; the production baseline);
  *   3. [[Skew.saltedJoin]] — static (key, salt) spreading, which
  *      works on any engine/version, composes with AQE, and also fixes
  *      the skewed-AGGREGATION-after-join shape AQE's join splitting
  *      does not touch.
  *
  * Also reports the structural fact timing can't fake: the max rows
  * any single task receives for the hot key, before vs after salting
  * (`salts`× smaller by construction).
  *
  * Run: `sbt "runMain graft.SkewScaleSmoke [nFact]"`.
  */
object SkewScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nFact = args.headOption.map(_.toInt).getOrElse(8000000)
    val nDim = 2000000 // too large for the 10 MB auto-broadcast default
    val nKeys = 100000L
    val salts = 16
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // power-law fact: ~1/3 of rows hit key 0, the rest spread uniformly
    val fact = spark.range(nFact).toDF("id")
      .select(col("id"),
        when(pmod(xxhash64(col("id")), lit(3L)) === 0L, lit(0L))
          .otherwise(pmod(xxhash64(col("id") + 7919L), lit(nKeys))).as("key"),
        (col("id") % 1000L).as("v"))
    val dim = spark.range(nDim).toDF("did")
      .select(col("did"), pmod(col("did"), lit(nKeys)).as("key"),
        (col("did") % 100L).as("w"))
      .filter(col("did") < nKeys) // one dim row per key — result size stays = fact size
      .cache()
    val factC = fact.cache()
    factC.count(); dim.count() // materialize generation outside timings

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // checksum action keeps every joined row flowing without collecting
    def drain(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(col("key"), col("v"), col("w")).as("h"))
        .agg(expr("bit_xor(h)")).collect().head.getLong(0)

    def withConf[T](k: String, v: String)(f: => T): T = {
      val prev = spark.conf.get(k)
      spark.conf.set(k, v); try f finally spark.conf.set(k, prev)
    }

    val noBroadcast = "spark.sql.autoBroadcastJoinThreshold"
    val (plainNoAqe, tNoAqe) = withConf(noBroadcast, "-1") {
      withConf("spark.sql.adaptive.skewJoin.enabled", "false") {
        time(drain(factC.join(dim, Seq("key"))))
      }
    }
    val (plainAqe, tAqe) = withConf(noBroadcast, "-1") {
      time(drain(factC.join(dim, Seq("key"))))
    }
    val (salted, tSalted) = withConf(noBroadcast, "-1") {
      time(drain(Skew.saltedJoin(factC, dim, "key", salts)))
    }
    assert(plainNoAqe == plainAqe && plainAqe == salted,
      "salted join result diverges from the plain join")

    // structural skew bound: rows a single task receives for the hot key
    val hotRows = factC.filter(col("key") === 0L).count()
    val maxSaltedBucket = factC.filter(col("key") === 0L)
      .withColumn("__salt",
        pmod(xxhash64(factC.columns.toIndexedSeq.map(col): _*), lit(salts.toLong)))
      .groupBy(col("__salt")).count().agg(max(col("count"))).collect().head.getLong(0)

    println(f"""{"n_fact":$nFact,"n_dim_rows":${nKeys},"hot_key_rows":$hotRows,""" +
      f""""salts":$salts,"max_task_rows_unsalted":$hotRows,""" +
      f""""max_task_rows_salted":$maxSaltedBucket,""" +
      f""""join_sec_no_aqe":$tNoAqe%.2f,"join_sec_aqe":$tAqe%.2f,""" +
      f""""join_sec_salted":$tSalted%.2f}""")
    spark.stop()
  }
}
