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
      .orderBy(col("o_orderkey"))
  }

  /** Top-N rows per group via ranking window (N=3 orders by price per
    * priority class). */
  def topNPerGroup(orders: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
      .orderBy(col("o_orderpriority"), col("rn"))
  }

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
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }
}
