package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over DataFrame edge lists — PageRank in
  * FIXED-POINT integer arithmetic so the result is deterministic,
  * partition-order independent, and cross-engine hash-exact (a float
  * PageRank's per-node contribution sums depend on reduction order;
  * int64 sums do not).
  *
  * Scale shape (the star-contraction discipline applied to power
  * iteration): each iteration is ONE equi-join of the edge list with
  * the rank table plus one map-side-partial keyed sum — no windows,
  * no driver-side graph state; lineage is cut every iteration with an
  * eager `localCheckpoint` (constant-depth plans over any iteration
  * count, previous iteration's blocks released). At 100 TB swap
  * `localCheckpoint` for reliable checkpointing to the cluster FS —
  * one flag, same plan shape.
  *
  * Fixed-point arithmetic: ranks carry `Scale` units per 1.0 of mass.
  * contribution(u→v) = rank(u) div outdeg(u); rank'(v) =
  * (15·Scale) div 100 + (85·Σ contributions) div 100 — every op an
  * exact int64 operation (Spark `div` ≡ DuckDB `//` on nonnegative
  * values). Headroom: the total mass stays ≤ N·Scale (integer floors
  * only leak mass downward), so `85·Σ` fits int64 for graphs up to
  * ~10⁸ nodes at the default Scale.
  */
object Graph {

  /** 10⁻⁹ rank resolution; see the headroom note above. */
  val Scale = 1000000000L

  /** Symmetric co-purchase edge list over lineitem: parts that appear
    * in the same order, both directions, deduplicated. The pair
    * explosion is per-order (bounded by basket size — never a global
    * cross join), the same shape as
    * [[graft.ops.Relational.coOccurrence]].
    */
  def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val und = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    und.unionByName(und.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Fixed-point PageRank over a directed edge list (src, dst) with no
    * dangling nodes (every src must have outdeg ≥ 1 — symmetric edge
    * lists like [[coPurchaseEdges]] satisfy this by construction).
    * Returns (node, outdeg, rank_fp, pagerank) for every node with at
    * least one outgoing edge; `pagerank = rank_fp / Scale` is the
    * conventional damped rank with r₀ = 1.
    */
  def pageRank(edges: DataFrame, iterations: Int = 10): DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    // partition the STATIC sides once, on their join keys: the cached
    // InMemoryRelation advertises its hashpartitioning, so every
    // iteration's edge⋈rank join exchanges ONLY the iteration-fresh
    // rank table, and the deg join runs exchange-free on both sides
    // (contribs arrive hash-partitioned by node from their own agg) —
    // at scale this halves the per-iteration shuffle volume, and the
    // edge list (the big side) never re-shuffles after iteration 0
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val degs = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .select(col("src").as("node"), col("outdeg"))
      .repartition(col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    degs.count()
    var ranks = degs.select(col("node"), col("outdeg"),
      lit(Scale).as("rank_fp")).localCheckpoint(true)
    var it = 0
    while (it < iterations) {
      val contribs = e
        .join(ranks.select(col("node").as("src"), col("outdeg"), col("rank_fp")),
          Seq("src"))
        .select(col("dst").as("node"), expr("rank_fp div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      val next = degs.join(contribs, Seq("node"), "left")
        .select(col("node"), col("outdeg"),
          (lit(15L * Scale / 100L) +
            expr(s"(85 * coalesce(s, 0L)) div 100")).as("rank_fp"))
        .localCheckpoint(true)
      releaseCheckpoint(ranks)
      ranks = next
      it += 1
    }
    // the cached result's lineage passes through the final iteration's
    // localCheckpoint, whose blocks are released here (the
    // clustersFromPairs convention): it cannot recompute if its own
    // blocks are lost — write it out / use reliable checkpointing on a
    // fault-prone cluster
    val out = ranks.select(col("node"), col("outdeg"), col("rank_fp"),
      (col("rank_fp").cast("double") / lit(Scale.toDouble)).as("pagerank"))
    val last = ranks
    Caching.materialized(out) {
      e.unpersist(false); degs.unpersist(false); releaseCheckpoint(last)
    }
  }

  /** Driver row: PageRank over the co-purchase graph, top `k` parts by
    * rank (rank_fp desc, node asc) — "most central products". One
    * distributed TakeOrdered; ranks are integers, so the ordering and
    * the surfaced doubles are hash-exact.
    */
  def pageRankQuery(lineitem: DataFrame, iterations: Int = 10,
      k: Int = 50): DataFrame =
    pageRank(coPurchaseEdges(lineitem), iterations)
      .orderBy(col("rank_fp").desc, col("node")).limit(k)

  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
