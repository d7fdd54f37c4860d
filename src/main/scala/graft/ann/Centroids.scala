package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-label centroids in fixed-point arithmetic.
  *
  * A float mean over a groupBy is NOT cross-engine reproducible — the
  * accumulation order of a distributed sum is nondeterministic, and
  * float addition doesn't associate. Summing `floor(x·10⁶)` as int64
  * instead is order-independent and bit-identical on any engine, at
  * the cost of quantizing each component to 1e-6 before averaging
  * (vs the ~1e-7 relative error a float32 input already carries).
  * The shuffle carries one (label, i) partial per partition — plain
  * map-side-combine aggregation, no collect_list materialization, so
  * the shape survives a billion rows per label.
  */
object Centroids {

  val Scale = 1000000L

  /** (label, i, sum_fx, n, centroid): component-wise fixed-point mean
    * per label — class prototypes for probing, IVF seeding, or
    * nearest-centroid classification.
    */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("label"), col("i").cast("long").as("i"),
        floor(col("x").cast("double") * Scale).cast("long").as("fx"))
      .groupBy(col("label"), col("i"))
      .agg(sum(col("fx")).as("sum_fx"), count(lit(1)).as("n"))
      .select(col("label"), col("i"), col("sum_fx"), col("n"),
        (col("sum_fx").cast("double") / (col("n") * Scale).cast("double")).as("centroid"))
      .orderBy(col("label"), col("i"))
}
