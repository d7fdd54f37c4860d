package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Scale evidence for the fixed-point PageRank: power iteration over a
  * synthetic DIRECTED graph ~100× the bench-SF co-purchase graph, with
  * an exact driver-side recount as the verdict:
  *
  *  - a binary in-tree on `n` nodes (every node i > 0 links to
  *    i div 2) — mass drains toward the root region;
  *  - a ring (i → (i+1) mod n) keeping every outdegree ≥ 1 (no
  *    dangling mass).
  *
  * Because the arithmetic is integer fixed-point, the distributed
  * result can be checked for BIT EQUALITY against a single-threaded
  * recount over the same generated edges (2n of them — driver-sized
  * at smoke scale) — not a tolerance comparison, an exact one; that
  * recount is the strongest possible scale-correctness probe for an
  * iterative operator. Prints one JSON line with edge count, wall
  * seconds, the top node, and the fixed-point mass ratio.
  *
  * Run: `sbt "runMain graft.GraphScaleSmoke [nNodes] [iters] [scale]"`
  * — `scale` defaults to [[Graph.Scale]]; pass a reduced one (e.g.
  * 10000000) to exercise the node-count-headroom regime end-to-end.
  */
object GraphScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val scale = args.drop(2).headOption.map(_.toLong).getOrElse(Graph.Scale)
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tree = spark.range(1L, n).toDF("i")
      .select(col("i").as("src"), expr("i div 2").as("dst"))
    val ring = spark.range(n).toDF("i")
      .select(col("i").as("src"), ((col("i") + 1) % n).as("dst"))
    val edges = tree.unionByName(ring).repartition(64).cache()
    val nEdges = edges.count() // materialize generation outside the timing

    val t0 = System.nanoTime()
    val ranks = Graph.pageRank(edges, iters, scale)
    val top = ranks.orderBy(col("rank_fp").desc, col("node")).limit(5).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("rank_fp")))
    val agg = ranks.agg(sum(col("rank_fp")).as("mass"), count(lit(1)).as("nodes")).head()
    val secs = (System.nanoTime() - t0) / 1e9
    ranks.unpersist()
    val mass = agg.getAs[Long]("mass")
    val nodes = agg.getAs[Long]("nodes")

    // single-threaded exact recount over the same generated edges;
    // the array-backed recount truncates past Int.MaxValue, so refuse
    // loudly rather than certify a bogus verdict at the exact scales
    // this smoke exists for
    require(n <= Int.MaxValue,
      s"recount is array-backed and capped at Int.MaxValue nodes; got $n")
    val nn = n.toInt
    val outdeg = new Array[Long](nn)
    var i = 1
    while (i < nn) { outdeg(i) += 1; i += 1 } // tree edge
    i = 0
    while (i < nn) { outdeg(i) += 1; i += 1 } // ring edge
    var rank = Array.fill(nn)(scale)
    var it = 0
    val base = 15L * scale / 100L
    while (it < iters) {
      val contrib = new Array[Long](nn)
      i = 1
      while (i < nn) { contrib(i / 2) += rank(i) / outdeg(i); i += 1 }
      i = 0
      while (i < nn) { contrib((i + 1) % nn) += rank(i) / outdeg(i); i += 1 }
      val next = new Array[Long](nn)
      i = 0
      while (i < nn) { next(i) = base + 85L * contrib(i) / 100L; i += 1 }
      rank = next
      it += 1
    }
    val refMass = rank.sum
    val refTop = rank.zipWithIndex.map { case (r, node) => (node.toLong, r) }
      .sortBy { case (node, r) => (-r, node) }.take(5)
    val exact = top.sameElements(refTop) && mass == refMass && nodes == n

    val massRatio = mass.toDouble / (nodes.toDouble * scale)
    println(
      s"""{"edges":$nEdges,"nodes":$nodes,"iterations":$iters,"scale":$scale,""" +
        s""""top_node":${top.head._1},"top_rank":${top.head._2},""" +
        s""""recount_exact":$exact,""" +
        f""""mass_ratio":$massRatio%.6f,"pagerank_sec":$secs%.2f}""")
    spark.stop()
    if (!exact) sys.exit(1)
  }
}
