package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational/analytic operators over the TPC-H-ish corpus.
  *
  * Determinism rules (oracle parity at any scale):
  *  - money aggregates go through DECIMAL(18,2) so sums are exact and
  *    partition-order independent — a double sum would drift at 100 TB;
  *  - every output carries a total ORDER BY with a unique tie-break;
  *  - exact decimals are cast (never rounded) to double on output:
  *    decimal→nearest-double is bit-identical across engines, while
  *    `round(double, n)` half-case semantics are not.
  */
object Relational {

  /** Cast to exact money type before aggregation. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact decimal sum surfaced as a double. */
  def moneySum(c: Column): Column = sum(dec(c)).cast("double")

  /** Scan-filter-aggregate (TPC-H Q1 flavor). Single shuffle with
    * map-side partial aggregation; filter + 6-column projection push
    * down to the parquet scan.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).cast("double")
          .as("sum_disc_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Multi-way join + agg (TPC-H Q3 flavor): revenue of BUILDING-segment
    * orders. customer is tiny relative to lineitem → explicit broadcast;
    * the lineitem⋈orders join shuffles on the order key.
    */
  def segmentRevenue(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    orders
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).cast("double")
        .as("revenue"))
  }

  /** Six-way dim-chain join (TPC-H Q5 flavor): revenue by supplier
    * nation within one region, counting only LOCAL supply (customer
    * and supplier share a nation). The canonical snowflake shape:
    * region (5 rows, pre-filtered to 1) and nation (25 rows) broadcast
    * explicitly; supplier is dim-sized and joins on
    * (suppkey, nationkey); the fact-side lineitem⋈orders⋈customer
    * chain shuffles on its keys with AQE re-planning. At 100 TB only
    * the fact tables scale — the dim broadcasts are constant-size, so
    * the plan's shuffle volume is exactly the fact co-partitioning and
    * nothing else.
    */
  def localSupplierRevenue(region: DataFrame, nation: DataFrame,
      supplier: DataFrame, customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, regionName: String = "ASIA"): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).cast("double")
          .as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** Top-N rows per group (N=3 orders by price per priority class) as
    * a bounded [[graft.expressions.TopKByScore]] partial aggregate —
    * NOT a ranking window. The window shape partitions by
    * `o_orderpriority` (five distinct values), so at scale one task
    * sorts ~20% of ALL orders; the aggregate keeps ≤ N rows per group
    * per map partition pre-exchange, making the shuffle O(groups ×
    * partitions × N) regardless of corpus size. Tie-break identical:
    * (o_totalprice desc, o_orderkey asc) is exactly the aggregate's
    * (score desc, id asc) order.
    */
  def topNPerGroup(orders: DataFrame, n: Int = 3): DataFrame =
    orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .groupBy(col("o_orderpriority"))
      .agg(graft.GraftFunctions.top_k_by_score(
        col("o_totalprice"), col("o_orderkey"), n).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("o_orderpriority"), col("t.id").as("o_orderkey"),
        col("t.score").as("o_totalprice"), (col("pos") + 1).cast("long").as("rn"))
      .orderBy(col("o_orderpriority"), col("rn"))

  /** Running per-customer analytics: cumulative spend (exact decimal
    * frame sum) + order sequence number. */
  def runningCustomerSpend(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"),
        row_number().over(w).cast("long").as("order_seq"))
  }

  /** Market-basket co-occurrence: the `k` part pairs most often
    * ordered TOGETHER — the association-mining probe behind every
    * "frequently bought with" surface. The pair explosion is a
    * per-order self-join: bounded by basket size (≤ tens of items),
    * so the pair stream is O(Σ basket²) ≈ linear in lineitems at any
    * corpus scale — never a global cross join; one map-side-partial
    * keyed count follows, and the global top-k is a distributed
    * TakeOrdered (count desc, pair asc — no vocabulary-wide window).
    * AQE covers hot-pair skew.
    */
  /** Association rules over the co-occurrence pairs: for each
    * DIRECTED pair a→b with support ≥ `minSupport` orders, the
    * confidence P(b | a) and lift P(a,b)/(P(a)·P(b)) — the ranking
    * that separates "popular with everything" from genuinely
    * associated. Same bounded pair explosion as [[coOccurrence]];
    * the per-part totals and the order count ride back as broadcasts;
    * both ratios are integer-product IEEE divisions (exact inputs →
    * cross-engine hash-exact); top-k by (lift desc, pair) is a
    * distributed TakeOrdered.
    */
  def associationRules(lineitem: DataFrame, minSupport: Long = 3,
      k: Int = 20): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = li.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val nPart = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    val undirected = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("x"), col("b.l_partkey").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_ab"))
    val directed = undirected.select(col("x").as("ante"), col("y").as("cons"), col("n_ab"))
      .unionByName(undirected.select(col("y").as("ante"), col("x").as("cons"), col("n_ab")))
    directed
      .filter(col("n_ab") >= minSupport)
      .join(broadcast(nPart.select(col("l_partkey").as("ante"), col("n_part").as("n_a"))),
        Seq("ante"))
      .join(broadcast(nPart.select(col("l_partkey").as("cons"), col("n_part").as("n_b"))),
        Seq("cons"))
      .crossJoin(broadcast(nOrders))
      .select(col("ante"), col("cons"), col("n_ab"),
        (col("n_ab").cast("double") / col("n_a")).as("confidence"),
        ((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("ante"), col("cons")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("lift").desc, col("ante"), col("cons"))).cast("long"))
      .orderBy(col("rank"))
  }

  def coOccurrence(lineitem: DataFrame, k: Int = 20): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
    pairs.groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_orders").desc, col("part_a"), col("part_b"))).cast("long"))
      .orderBy(col("rank"))
  }
}
