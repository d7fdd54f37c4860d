package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Relational.dec

/** Event-stream analytics (batch form; streaming twins live in
  * graft.streaming). All time arithmetic is on int64 epoch
  * microseconds — engine- and timezone-independent.
  */
object EventOps {

  /** Epoch-microseconds column for the `ts` field. The events table
    * carries nanosecond parquet timestamps, which Spark surfaces as
    * int64 nanos under `spark.sql.legacy.parquet.nanosAsLong`; integer
    * `div` keeps the full 64-bit precision (a double division would
    * lose sub-µs bits above 2^53).
    */
  private def microsOfTs(df: DataFrame): DataFrame =
    df.withColumn("us", microsOfTsCol(df))

  /** The schema-branched µs expression, shared with the streaming
    * entry (SparkEntry stream_windowed_agg) so both paths tolerate
    * either int64-nanos (nanosAsLong) or timestamp-typed `ts`.
    */
  def microsOfTsCol(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }

  /** Gap-based sessionization: a new session starts when a user's gap
    * from the previous event exceeds `gapMinutes`. Two windows over the
    * same `(user_id, ts)` partitioning → a single shuffle on user_id.
    * At scale user_id partitioning is the natural key distribution;
    * skewed power-users are handled by AQE.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    microsOfTs(events)
      .select(col("user_id"), col("event_id"), col("us"))
      .withColumn("is_new",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs || lag(col("us"), 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
    // unordered from the API (r12): user/event-grain outputs don't pay
    // a global range exchange in production — gate rows sort
  }

  /** Exact interpolated percentiles of `value` per event type
    * (p50/p90/p99). `percentile` is Spark's exact implementation —
    * identical linear-interpolation semantics to DuckDB quantile_cont;
    * for approximate percentiles at extreme scale swap in
    * `approx_percentile` (t-digest, not oracle-comparable).
    */
  def valuePercentiles(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.9)).as("p90"),
        percentile(col("value"), lit(0.99)).as("p99"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Sketch-tier percentiles (the t-digest/GK analogue of the HLL
    * distinct tier): `approx_percentile` keeps a bounded
    * Greenwald-Khanna summary per group — rank error ≤ n/accuracy —
    * where exact [[valuePercentiles]] buffers every value of a group.
    * At 100 TB the exact form is a memory hazard on hot keys; the
    * sketch is constant-memory and mergeable map-side. Rows-only
    * oracle (sketch internals are engine-specific); accuracy
    * spec-asserted against the exact percentiles at test SF.
    */
  def approxValuePercentiles(events: DataFrame, accuracy: Int = 10000): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        percentile_approx(col("value"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(accuracy)).as("p"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"),
        element_at(col("p"), 1).as("p50_approx"),
        element_at(col("p"), 2).as("p90_approx"),
        element_at(col("p"), 3).as("p99_approx"),
        col("n_events"))
      .orderBy(col("event_type"))

  /** As-of join — the time-series/feature-attribution operator: attach
    * to every left event the LATEST right event with `right.us ≤
    * left.us` in the same key group (ties at equal time resolved toward
    * the largest right `ord` value; no prior right event → nulls).
    *
    * Implemented as a tagged union + one running-window pass: right
    * rows sort before left rows at the same key/time, each left row
    * picks `last(payload ignoreNulls)` over the preceding rows. ONE
    * shuffle on the key columns and an O(n log n) per-key sort —
    * instead of the naive range join whose fan-out is O(left × right)
    * per key. The attached columns ride in a single struct so id/value
    * always come from the same matched row even when some values are
    * NULL.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String] = Seq("user_id"),
      ord: String = "event_id",
      attach: Seq[String] = Seq("event_id", "value"),
      prefix: String = "asof_"): DataFrame = {
    val l = microsOfTs(left)
    // a right event without a timestamp can never be "most recent" —
    // and engines disagree on where NULLs sort (Spark ASC = NULLS
    // FIRST, DuckDB = NULLS LAST), so keeping them would make the
    // match order-dependent
    val r = microsOfTs(right).filter(col("us").isNotNull)
    val keyCols = keys.map(col)
    val payloadT = r.select(attach.map(col): _*).schema
    val lu = l.select(keyCols ++ Seq(col("us"), col(ord).as("ord_v"),
      lit(1).as("side"), lit(null).cast(payloadT).as("payload")): _*)
    val ru = r.select(keyCols ++ Seq(col("us"), col(ord).as("ord_v"),
      lit(0).as("side"), struct(attach.map(col): _*).as("payload")): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("us"), col("side"), col("ord_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      // a left event without a timestamp has no "as of" point: null
      // match, regardless of where the engine sorts its null us
      .withColumn("m",
        when(col("us").isNotNull, last(col("payload"), ignoreNulls = true).over(w)))
      .filter(col("side") === 1)
      .select(keyCols ++ Seq(col("ord_v").as(ord), col("us")) ++
        attach.map(a => col(s"m.$a").as(s"$prefix$a")): _*)
  }

  /** Range (interval) join: all pairs of events of the same user
    * within `maxGapUs` of each other — the proximity-pair primitive
    * behind burst detection and session stitching.
    *
    * A naive inequality join is a per-user cartesian; instead events
    * are hashed into `maxGapUs`-wide time buckets and each left event
    * probes its own and both adjacent buckets (a pair within the gap
    * can span at most adjacent buckets, and exactly one probe bucket
    * equals the right event's bucket — so each unordered pair is
    * produced exactly once, no distinct needed). One equi-join shuffle
    * on (user_id, bucket) with 3× probe fan-out, exact |Δt| filter
    * after the join.
    */
  def withinRangePairs(events: DataFrame, maxGapUs: Long = 300000000L): DataFrame = {
    val e = microsOfTs(events)
      .select(col("user_id"), col("event_id"), col("us"))
      .filter(col("us").isNotNull)
    val b = e.withColumn("bucket", expr(s"us div $maxGapUs"))
    val probes = b.select(col("user_id"), col("event_id"), col("us"),
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("jb"))
    probes.as("x").join(b.as("y"),
        col("x.user_id") === col("y.user_id") && col("x.jb") === col("y.bucket") &&
          col("x.event_id") < col("y.event_id") &&
          abs(col("x.us") - col("y.us")) <= maxGapUs)
      .select(col("x.user_id").as("user_id"),
        col("x.event_id").as("e1"), col("y.event_id").as("e2"),
        abs(col("x.us") - col("y.us")).as("gap_us"))
      .orderBy(col("e1"), col("e2"))
  }

  /** Ordered-funnel analysis — the conversion primitive: per user, the
    * earliest time each funnel step was completed IN ORDER (step i
    * counts only at/after the matched time of step i-1), plus the
    * deepest stage reached. Users who never performed step 1 are not
    * in the funnel and are absent.
    *
    * Shape: one conditional min-aggregate per step, every one grouped
    * and joined on user_id — after the first shuffle all steps are
    * co-partitioned, so the funnel depth adds joins but no new
    * partitioning, and each aggregate is map-side partial. Time is
    * exact int64 µs → cross-engine oracle-exact.
    */
  def funnel(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = microsOfTs(events)
      .select(col("user_id"), col("event_type"), col("us"))
      .filter(col("us").isNotNull)
    var acc = e.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("us")).as("step1_us"))
    for (i <- 1 until steps.length) {
      val next = e.filter(col("event_type") === steps(i))
        .join(acc.select(col("user_id"), col(s"step${i}_us")), Seq("user_id"))
        .filter(col("us") >= col(s"step${i}_us"))
        .groupBy(col("user_id")).agg(min(col("us")).as(s"step${i + 1}_us"))
      acc = acc.join(next, Seq("user_id"), "left")
    }
    val stage =
      if (steps.length == 1) lit(1L)
      else {
        var c = when(col(s"step${steps.length}_us").isNotNull, lit(steps.length.toLong))
        for (i <- steps.length - 1 to 2 by -1)
          c = c.when(col(s"step${i}_us").isNotNull, lit(i.toLong))
        c.otherwise(lit(1L)) // step1 is non-null for every funnel row
      }
    acc.withColumn("stage", stage)
  }

  /** Per-type z-score anomaly flags — the monitoring primitive: events
    * whose (2dp-quantized) value deviates more than `zThreshold`
    * standard deviations from their type's mean. Moments come from
    * EXACT decimal sums (order-independent), cast once to double;
    * every double op after that is a single mirrored IEEE step, so the
    * boundary decisions (|z| > t) are bit-identical cross-engine. The
    * sum-of-squares decimal stays exact-in-double while Σv² < 2⁵³
    * quanta — beyond that (extreme per-group scale), shard groups or
    * drop to a sketch. One grouped agg + a broadcast of the tiny
    * per-type stats row.
    */
  def valueAnomalies(events: DataFrame, zThreshold: Double = 3.0): DataFrame = {
    val stats = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_v"),
        sum(dec(col("value")) * dec(col("value"))).cast("double").as("sum_sq"))
      .withColumn("mean_v", col("sum_v") / col("n"))
      .withColumn("m2", col("sum_sq") / col("n"))
      .withColumn("std_v", sqrt(col("m2") - col("mean_v") * col("mean_v")))
      .select(col("event_type"), col("mean_v"), col("std_v"))
    events
      .select(col("event_id"), col("event_type"), dec(col("value")).cast("double").as("value_2dp"))
      .join(broadcast(stats), Seq("event_type"))
      .withColumn("z", (col("value_2dp") - col("mean_v")) / col("std_v"))
      .filter(abs(col("z")) > zThreshold)
      .select(col("event_type"), col("event_id"), col("value_2dp"), col("z"))
  }

  /** ROBUST outlier flags: modified z-score on median / MAD instead
    * of mean / stddev — the version [[valueAnomalies]]' moment
    * statistics cannot be: a single extreme value inflates the mean
    * AND the stddev, masking the very outliers being hunted (masking
    * breakdown); the median and MAD have a 50% breakdown point, so
    * the threshold holds even on heavily contaminated streams. Both
    * medians are Spark's exact interpolated `percentile` ≡ DuckDB
    * `quantile_cont` bitwise (the [[valuePercentiles]] precedent), so
    * the flags are cross-engine hash-exact. Two keyed aggregations
    * (values per type; absolute deviations per type) + a broadcast
    * stats join — the per-type value buffering is the exact tier; at
    * extreme group sizes swap `approx_percentile` (GK) per the
    * established sketch-tier convention.
    */
  def robustAnomalies(events: DataFrame, zThreshold: Double = 3.5): DataFrame = {
    val v = events.select(col("event_id"), col("event_type"),
      dec(col("value")).cast("double").as("value_2dp"))
    val med = v.groupBy(col("event_type"))
      .agg(percentile(col("value_2dp"), lit(0.5)).as("median_v"))
    val mad = v.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), abs(col("value_2dp") - col("median_v")).as("ad"))
      .groupBy(col("event_type"))
      .agg(percentile(col("ad"), lit(0.5)).as("mad_v"))
    v.join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .filter(col("mad_v") > 0)
      // the classic 0.6745 normal-consistency constant; one literal
      // multiply + one division, same expression shape as the oracle
      .withColumn("robust_z",
        lit(0.6745) * (col("value_2dp") - col("median_v")) / col("mad_v"))
      .filter(abs(col("robust_z")) > zThreshold)
      .select(col("event_type"), col("event_id"), col("value_2dp"),
        col("median_v"), col("robust_z"))
  }

  /** Cohort retention — the activation/engagement matrix: users are
    * cohorted by their first-activity day; each (cohort_day,
    * day_offset) cell counts the distinct users of that cohort active
    * `offset` days later. Two shuffles (first-day per user; cell
    * distinct-count), both keyed and map-side-partial. Day arithmetic
    * is integer µs→day division — engine-exact. At extreme user
    * cardinality swap the exact distinct for the HLL sketch tier
    * ([[graft.text.TextAnalysis.corpusApproxDistinct]] pattern).
    */
  def retention(events: DataFrame, maxOffsetDays: Int = 30): DataFrame = {
    val e = microsOfTs(events)
      .select(col("user_id"), expr("us div 86400000000").as("day"))
      .filter(col("day").isNotNull)
    val cohorts = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.join(cohorts, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** The HLL sketch tier of [[retention]] — the extreme-cardinality
    * path the exact version's docstring promises: per-cell distinct
    * users via `approx_count_distinct` (constant-size mergeable HLL++
    * registers map-side) instead of shuffling every (cell, user) pair
    * for the exact distinct. At 10⁹ users per cohort the exact
    * distinct's shuffle carries the full membership; the sketch
    * carries kilobytes per cell. Rows-only at the driver gate like the
    * other sketch tiers; accuracy spec'd vs exact at test SF.
    */
  def retentionApprox(events: DataFrame, maxOffsetDays: Int = 30,
      rsd: Double = 0.02): DataFrame = {
    val e = microsOfTs(events)
      .select(col("user_id"), expr("us div 86400000000").as("day"))
      .filter(col("day").isNotNull)
    val cohorts = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.join(cohorts, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users_approx"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Consecutive-day activity streaks per user (gaps-and-islands):
    * distinct active days, number of maximal consecutive-day runs, and
    * the longest run. Island key = `day − row_number` (constant within
    * a consecutive run, strictly decreasing across gaps) — the
    * classic O(n log n)-per-user rewrite of what a naive self-join
    * does quadratically.
    *
    * Shape: one distinct + one user-keyed window shuffle; the two
    * follow-up aggregations reuse the window's hash partitioning
    * ((user, grp) and (user) are both clustered by user — no further
    * exchange). Integer day arithmetic throughout.
    */
  def streaks(events: DataFrame): DataFrame = {
    val days = microsOfTs(events)
      .select(col("user_id"), expr("us div 86400000000").as("day"))
      .filter(col("day").isNotNull)
      .distinct()
    val run = days.withColumn("rn",
      row_number().over(Window.partitionBy(col("user_id")).orderBy(col("day"))))
      .withColumn("grp", col("day") - col("rn"))
    run.groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"))
  }

  /** Semi-structured property extraction: pull typed fields out of the
    * JSON `props` column and aggregate on them — the "late-binding
    * schema" path every event pipeline needs. The JSON parse is a
    * codegen'd projection (`get_json_object`); everything after is
    * ordinary exact aggregation. At scale prefer parsing ONCE into a
    * typed column and persisting — this operator is the probe shape.
    */
  def propsAgg(events: DataFrame): DataFrame =
    microsOfTs(events)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .withColumn("k_band", expr("k div 10"))
      .groupBy(col("event_type"), col("k_band"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("event_type"), col("k_band"))

  /** Top event-type paths — the product-analytics "what do users do
    * next" probe: every run of `len` consecutive events per user
    * (ordered by time, event_id tie-break) becomes a `a>b>c` path
    * string; returns the `k` most frequent paths with a deterministic
    * (count desc, path) tie-break.
    *
    * Shape: one shuffle for the per-user window (lead projections,
    * linear in events), one keyed count, then a distributed
    * TakeOrdered for the top-k — the path vocabulary is never sorted
    * on a single partition (same plan contract as
    * [[graft.text.TextAnalysis.topNgrams]]).
    */
  def topPaths(events: DataFrame, len: Int = 3, k: Int = 20): DataFrame = {
    require(len >= 2, s"a path needs at least 2 steps, got $len")
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val stepCols = col("event_type").as("s0") +:
      (1 until len).map(i => lead(col("event_type"), i).over(w).as(s"s$i"))
    val paths = microsOfTs(events)
      .filter(col("us").isNotNull)
      .select(col("user_id"), col("event_id"), col("us"), col("event_type"))
      .select(stepCols: _*)
      .filter(col(s"s${len - 1}").isNotNull) // only full-length runs
      .select(concat_ws(">", (0 until len).map(i => col(s"s$i")): _*).as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("path")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n_occurrences").desc, col("path"))).cast("long"))
      .orderBy(col("rank"))
  }

  /** Markov TRANSITION matrix over the event stream: for every
    * (from → to) consecutive pair per user (time order, event_id
    * tie-break), the count and the conditional probability
    * P(to | from) — the chain behind [[topPaths]]' surface, as the
    * model itself. One user-window shuffle for the `lead`
    * projection, one keyed count, and the per-from totals ride back
    * as a broadcast (|event types|² rows at most); the probability is
    * a single integer-ratio IEEE division, so the whole matrix is
    * cross-engine hash-exact.
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val pairs = microsOfTs(events)
      .filter(col("us").isNotNull)
      .select(col("user_id"), col("event_id"), col("us"), col("event_type"))
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("n_from")).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Tumbling time-window aggregation (hourly): exact decimal value
    * sums per (hour, event_type). One shuffle, map-side partials. */
  def hourlyRollup(events: DataFrame): DataFrame =
    microsOfTs(events)
      .select(
        col("event_type"),
        expr("us div 3600000000").as("hour_bucket"),
        col("value"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("hour_bucket"), col("event_type"))

  /** Multi-dimensional CUBE rollup: every (event_type × hour-of-day)
    * aggregation level in ONE pass — totals by type, by hour, by both,
    * and grand total, each row tagged with its `grouping_id` (the
    * OLAP dashboard feed). Catalyst expands the cube as a single
    * map-side-partial aggregate over the 4 grouping sets — one
    * shuffle, not four jobs; value sums in exact decimal.
    */
  def cubeRollup(events: DataFrame): DataFrame =
    microsOfTs(events)
      .select(col("event_type"),
        (expr("us div 3600000000") % 24).as("hour_of_day"), col("value"))
      .cube(col("event_type"), col("hour_of_day"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("event_type"), col("hour_of_day"), col("gid"),
        col("n_events"), col("sum_value"))
      .orderBy(col("gid"), col("event_type"), col("hour_of_day"))

  /** Wide PIVOT: hour-of-day rows × event-type columns, each cell the
    * (count, exact decimal value sum) for that combination — the
    * long-to-wide reshape every BI layer asks for. The pivot values
    * are caller-enumerated, so the plan is ONE map-side-partial
    * aggregate with `count/sum(CASE WHEN type = v ...)` cells — no
    * hidden distinct-collect pass over the corpus to discover the
    * column set, and no second shuffle. Counts are coalesced to 0 so
    * an empty (hour, type) cell is a number, not a NULL (the SQL
    * `FILTER` convention); empty sums stay NULL.
    */
  def pivotByType(events: DataFrame,
      types: Seq[String] = Seq("click", "error", "purchase", "signup", "view")): DataFrame = {
    val wide = microsOfTs(events)
      .select((expr("us div 3600000000") % 24).as("hour_of_day"),
        col("event_type"), col("value"))
      .groupBy(col("hour_of_day"))
      .pivot("event_type", types)
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum"))
    val cells = types.flatMap(v => Seq(
      coalesce(col(s"${v}_n"), lit(0L)).as(s"${v}_n"), col(s"${v}_sum")))
    wide.select(col("hour_of_day") +: cells: _*).orderBy(col("hour_of_day"))
  }

  /** Equi-width histogram of `value` over `nBins` bins spanning the
    * observed [min, max] — the distribution probe behind every data
    * profile. Two passes by construction: a 1-row global min/max
    * aggregate rides back in as a broadcast, then one
    * map-side-partial keyed count — both linear, no sort, no window.
    * Bin arithmetic is plain IEEE double ops in the same expression
    * shape as the oracle, so bin edges are cross-engine bit-exact.
    */
  def valueHistogram(events: DataFrame, nBins: Int = 20): DataFrame = {
    require(nBins >= 1, s"need at least one bin, got $nBins")
    // null values carry no position on the axis — drop them before
    // binning; a degenerate range (all values equal, or one row) puts
    // everything in bin 0 instead of dividing 0/0 into NaN bins
    val vals = events.select(col("value")).filter(col("value").isNotNull)
    val bounds = vals.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    vals
      .crossJoin(broadcast(bounds))
      .select(
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor((col("value") - col("lo")) / (col("hi") - col("lo")) * lit(nBins)),
            lit(nBins - 1L))).as("bin"),
        col("value"), col("lo"), col("hi"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"))
      .select(col("bin"),
        (col("lo") + (col("hi") - col("lo")) * col("bin") / lit(nBins.toDouble)).as("bin_lo"),
        (col("lo") + (col("hi") - col("lo")) * (col("bin") + lit(1L)) / lit(nBins.toDouble)).as("bin_hi"),
        col("n_events"), col("sum_value"))
      .orderBy(col("bin"))
  }

  /** SLIDING (hopping) window aggregation: 1-hour windows every 15
    * minutes — each event contributes to window/slide = 4 overlapping
    * windows (the batch face of Structured Streaming's
    * `window(ts, "1 hour", "15 minutes")`). The window replication is
    * a map-side explode of `window/slide` integer slide indices per
    * event (nonnegative-µs domain, integer arithmetic only — engine-
    * exact), then ONE keyed map-side-partial shuffle, exactly like the
    * tumbling rollup at `window/slide`× the row volume. Only windows
    * with ≥1 event appear.
    */
  def slidingRollup(events: DataFrame, windowUs: Long = 3600000000L,
      slideUs: Long = 900000000L): DataFrame = {
    require(windowUs % slideUs == 0, "window must be a multiple of slide")
    val per = windowUs / slideUs
    microsOfTs(events)
      .select(col("event_type"), col("us"), col("value"))
      .withColumn("slide_idx", explode(expr(
        s"sequence(us div $slideUs - ${per - 1}, us div $slideUs)")))
      // clip the leading partial windows so every reported window is
      // a full [start, start+window) interval with start ≥ 0
      .filter(col("slide_idx") >= 0)
      .select((col("slide_idx") * slideUs).as("window_start_us"),
        col("event_type"), col("value"))
      .groupBy(col("window_start_us"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
  }
}
