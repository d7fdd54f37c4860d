package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deliberate skew mitigation for joins whose hot keys AQE cannot
  * split profitably (e.g. a dimension too large to broadcast joined on
  * a power-law key). Complements — does not replace — AQE skew-join,
  * which stays enabled in GraftSession.
  */
object Skew {

  /** Salted inner equi-join: the fact side's rows are spread across
    * `salts` buckets by a deterministic hash of the whole row, the
    * other side is replicated once per salt, and the join runs on
    * (key, salt) — a hot key's rows land in `salts` distinct
    * partitions instead of one. Result is row-identical to
    * `left.join(right, key)`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.toIndexedSeq.map(col): _*), lit(salts.toLong)))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
