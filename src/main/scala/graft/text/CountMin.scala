package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftFunctions.{hex64, tokens}

/** Count-Min sketch over token frequencies — the point-query
  * counterpart of the corpus sketch family (HLL = distinct, GK =
  * quantiles, Misra-Gries = heavy hitters): a `depth × width` counter
  * grid answering "how often does token x occur?" in O(depth) from
  * O(depth·width) state, with the one-sided guarantee `exact ≤ est ≤
  * exact + εN` (ε = e/width) at confidence `1 − e^−depth` (Cormode &
  * Muthukrishnan 2005).
  *
  * Spark realization: the sketch IS a DataFrame `(j, bucket, cnt)` —
  * `cnt = Σ tokens hashing to (j, bucket)` — built by one `groupBy`
  * whose map-side partial aggregation compresses every partition to at
  * most `depth·width` rows before the exchange, so the shuffle is
  * sketch-sized no matter the corpus size: the same
  * constant-state-per-partition shape as the HLL/GK rows. Estimation
  * is an equi-join of the query tokens' `(j, bucket)` probes against
  * the sketch + `min` per token; merging two sketches is `union →
  * groupBy sum` (counter-wise addition, associative by construction).
  *
  * Unlike most sketches, every step is deterministic integer
  * arithmetic on the portable [[hex64]] hash — no RNG, no float — so
  * the DuckDB oracle rebuilds the sketch bit-for-bit and the driver
  * check is an exact hash match, not a tolerance band.
  */
object CountMin {

  /** Sketch frame `(j, bucket, cnt)` for the token stream of `docs`:
    * row `j`'s hash is `hex64("j|token") mod width`.
    */
  def sketch(docs: DataFrame, depth: Int = 4, width: Int = 8192): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    docs
      .select(explode(tokens(col("text"))).as("token"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"), col("token"))
      .groupBy(col("j"), bucketOf(col("j"), col("token"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  private def bucketOf(j: Column, token: Column, width: Int): Column =
    pmod(hex64(concat(j.cast("string"), lit("|"), token)), lit(width.toLong))

  /** Point-estimate each row of `queryTokens` (a `token` column)
    * against a sketch: explode the depth probes, equi-join on
    * `(j, bucket)`, take the min counter. Tokens the sketch never saw
    * keep their true count 0 (a missing bucket means no collisions
    * either).
    */
  def estimate(sketchDf: DataFrame, queryTokens: DataFrame, depth: Int = 4,
      width: Int = 8192): DataFrame = {
    val probes = queryTokens
      .select(col("*"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("bucket", bucketOf(col("j"), col("token"), width))
    probes
      .join(sketchDf, Seq("j", "bucket"), "left")
      .groupBy(queryTokens.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }

  /** Counter-wise merge of sketches built with the same (depth,
    * width) — the distributed-ingest path: shard corpora sketch
    * independently, merge in one tiny aggregation.
    */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("j"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Driver query: sketch the corpus, then estimate the exact top-k
    * tokens next to their true counts — `(token, n_exact, cms_count,
    * overestimate)` ordered by true frequency. One frame shows the
    * guarantee (`cms_count ≥ n_exact`, equality when row `j` has no
    * collision for the token) and is integer-exact for the oracle.
    */
  def sketchTopTokensQuery(docs: DataFrame, depth: Int = 4,
      width: Int = 8192, k: Int = 30): DataFrame = {
    val tok = docs.select(explode(tokens(col("text"))).as("token"))
    val top = tok.groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("token")).limit(k)
    estimate(sketch(docs, depth, width), top, depth, width)
      .withColumn("overestimate", col("cms_count") - col("n_exact"))
      .orderBy(col("n_exact").desc, col("token"))
  }
}
