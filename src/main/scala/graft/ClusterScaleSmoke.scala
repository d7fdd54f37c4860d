package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Scale evidence for near-dup clustering (the round-1 verdict's
  * weakest scale story, since rewritten as large-star/small-star
  * contraction): connected components over a synthetic pair graph ~100×
  * the bench-SF LSH pair graph, with adversarial shape:
  *
  *  - `nSmall` two-node components (the typical near-dup cluster);
  *  - `nStar` hub components of ~10 members (hot documents);
  *  - one chain of `chainLen` links — diameter = chainLen, the case
  *    that takes min-label propagation `chainLen` rounds but star
  *    contraction O(log²).
  *
  * Verifies every chain member labels to the chain minimum and prints
  * one JSON line with edge count, rounds bound, and wall seconds.
  *
  * Run: `sbt "runMain graft.ClusterScaleSmoke [nSmall] [nStar] [chainLen]"`.
  */
object ClusterScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nSmall = args.headOption.map(_.toInt).getOrElse(1000000)
    val nStar = args.drop(1).headOption.map(_.toInt).getOrElse(50000)
    val chainLen = args.drop(2).headOption.map(_.toInt).getOrElse(100000)
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val chainBase = 0L
    val starBase = chainLen + 10L
    val smallBase = starBase + nStar * 10L + 10L

    val chain = spark.range(chainLen).toDF("i")
      .select((col("i") + chainBase).as("a"), (col("i") + chainBase + 1).as("b"))
    val stars = spark.range(nStar * 9L).toDF("i")
      .select(
        (expr("i div 9") * 10 + starBase).as("a"),
        (expr("i div 9") * 10 + col("i") % 9 + 1 + starBase).as("b"))
    val smalls = spark.range(nSmall).toDF("i")
      .select((col("i") * 2 + smallBase).as("a"), (col("i") * 2 + smallBase + 1).as("b"))
    // one GIANT hub: a single component with nHub members attached
    // directly to its minimum — the contraction's own fixed-point
    // shape, and the skew case the starMin aggregate (vs the former
    // u-keyed window) must absorb without a one-task straggler
    val nHub = nSmall
    val hubBase = smallBase + nSmall * 2L + 10L
    val hub = spark.range(nHub).toDF("i")
      .select(lit(hubBase).as("a"), (col("i") + hubBase + 1).as("b"))
    val pairs = chain.unionByName(stars).unionByName(smalls).unionByName(hub)
      .repartition(64).cache()
    val nEdges = pairs.count() // materialize generation outside the timing

    val t0 = System.nanoTime()
    val (labelsRaw, roundStats) = Dedup.connectedComponentsWithStats(pairs, maxIters = 40)
    val labels = labelsRaw.cache()
    val nLabeled = labels.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val rounds = roundStats.length - 1

    // correctness probe on the adversarial component: the whole chain
    // must collapse to min = chainBase despite its huge diameter
    val chainOk = labels.filter(col("u") <= chainLen && col("v") =!= chainBase).count() == 0
    // every giant-hub member must label to the hub minimum
    val hubOk = labels.filter(col("u") > hubBase && col("v") =!= hubBase)
      .count() == 0 &&
      labels.filter(col("u") > hubBase).count() == nHub.toLong
    val nComponents = labels.select(col("v")).distinct().count()
    val expected = 2L + nStar + nSmall
    println(
      s"""{"edges":$nEdges,"labeled_nodes":$nLabeled,"components":$nComponents,""" +
        s""""expected_components":$expected,"cc_rounds":$rounds,""" +
        s""""round_edges":${roundStats.mkString("[", ",", "]")},""" +
        f""""chain_len":$chainLen,"chain_collapsed":$chainOk,""" +
        f""""hub_members":$nHub,"hub_collapsed":$hubOk,"cc_sec":$secs%.2f}""")
    spark.stop()
    // star contraction is O(log²) rounds — a chain of diameter d must
    // converge in ~log₂(d) rounds (measured: 15 at d=10⁴), nowhere
    // near the d rounds min-label propagation needs
    val roundBound = (math.log(chainLen.toDouble + 2) / math.log(2)).ceil.toInt + 6
    if (!chainOk || !hubOk || nComponents != expected || rounds > roundBound) sys.exit(1)
  }
}
