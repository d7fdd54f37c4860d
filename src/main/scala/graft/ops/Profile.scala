package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic table profiler — the data-quality probe every pipeline
  * runs before trusting a new drop: per column, row count, null
  * count, distinct count, and min/max (numeric and timestamp columns
  * in a double slot — epoch-µs for timestamps, exact below 2^53;
  * strings in binary-collation string slots). One output row per
  * column.
  *
  * Scale shape: ONE aggregation pass over the table — all per-column
  * aggregates ride in a single wide `agg`, map-side-partial; the only
  * data-dependent cost is the distinct counts, which Catalyst plans
  * as one Expand (×#distinct-aggs) into the same shuffle. At 100 TB
  * set `exact = false`: `approx_count_distinct` (HLL) collapses the
  * Expand into mergeable sketches — constant memory, same single
  * pass, the classic exact/sketch tier pair this engine uses
  * everywhere (GK percentiles, HLL retention).
  */
object Profile {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields
    def nullNum = max(lit(null).cast("double"))
    def nullStr = max(lit(null).cast("string"))
    def distinctAgg(c: Column) =
      if (exact) count_distinct(c) else approx_count_distinct(c)
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = col(f.name)
      val (numMin, numMax, strMin, strMax) = f.dataType match {
        case StringType =>
          (nullNum, nullNum, min(c), max(c))
        case TimestampType | TimestampNTZType =>
          // epoch-µs in the numeric slot (exact below 2^53); NTZ casts
          // through the session timezone, pinned UTC by GraftSession
          (min(unix_micros(c.cast("timestamp"))).cast("double"),
            max(unix_micros(c.cast("timestamp"))).cast("double"),
            nullStr, nullStr)
        case DateType =>
          (nullNum, nullNum, min(c).cast("string"), max(c).cast("string"))
        case _: NumericType =>
          (min(c).cast("double"), max(c).cast("double"), nullStr, nullStr)
        case _ => // arrays/binary/structs: counts only
          (nullNum, nullNum, nullStr, nullStr)
      }
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"_nn$i"),
        distinctAgg(c).cast("long").as(s"_nd$i"),
        numMin.as(s"_mn$i"), numMax.as(s"_mx$i"),
        strMin.as(s"_sn$i"), strMax.as(s"_sx$i"))
    } :+ count(lit(1)).as("_n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = fields.zipWithIndex.map { case (f, i) =>
      struct(lit(f.name).as("column"), col("_n").as("n_rows"),
        col(s"_nn$i").as("n_null"), col(s"_nd$i").as("n_distinct"),
        col(s"_mn$i").as("min_num"), col(s"_mx$i").as("max_num"),
        col(s"_sn$i").as("min_str"), col(s"_sx$i").as("max_str"))
    }
    row.select(explode(array(perCol.toIndexedSeq: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }
}
