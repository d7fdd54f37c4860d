package graft

import graft.ops.Broadcasting

/** The guarded-broadcast helpers (ADVICE r7/r8): the plain estimate
  * gate and the derived-frame rows bound that caps batch-bounded
  * fan-outs (survivors, ADC tables, probes) whose own plan estimates
  * are meaningless.
  */
class BroadcastingSpec extends SparkSpec {
  import spark.implicits._

  lazy val q = (0L until 100L).map(i => (i, Array.fill(8)(1.0f)))
    .toDF("vec_id", "embedding")

  test("fitsBroadcastRows admits small fan-outs and vetoes threshold-breaking ones") {
    assert(Broadcasting.fitsBroadcast(q), "tiny frame should fit as-is")
    assert(Broadcasting.fitsBroadcastRows(q, fanout = 10L, bytesPerRow = 32L),
      "100 rows x 10 x 32B is kilobytes")
    assert(!Broadcasting.fitsBroadcastRows(q, fanout = 100000000L, bytesPerRow = 32L),
      "a fan-out past the threshold must be vetoed even from a tiny source")
  }

  test("fitsBroadcastRows is false when auto-broadcast is disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(!Broadcasting.fitsBroadcastRows(q, 1L, 1L))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
