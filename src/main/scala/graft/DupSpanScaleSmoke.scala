package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Scale evidence for ExactSubstr-style span dedup (`dupSpans` /
  * `removeDupSpans`) at ~100× the bench SF: a synthetic corpus of
  * `nDocs` documents × ~60 tokens whose words are position-unique
  * hashes (so NO accidental duplicated 10-gram exists), with two
  * planted shapes:
  *
  *  - `dupRate` of docs carry one shared 15-token passage mid-doc —
  *    the cross-document boilerplate an ExactSubstr pass removes
  *    (expected coverage: exactly 15 tokens per carrier);
  *  - every 997th doc (coprime to the carrier stride, so all four
  *    shape groups are populated) additionally repeats its own first
  *    10 tokens at the end — the same-doc repetition case; BOTH copies
  *    are covered (ExactSubstr removes repeats everywhere).
  *
  * Verifies the planted arithmetic exactly (window-union coverage 15 /
  * 20 / 35, clean docs 0) and that removal ≡ coverage on every doc,
  * then prints one JSON line with gram count and wall seconds for the
  * accounting and removal passes.
  *
  * Run: `sbt "runMain graft.DupSpanScaleSmoke [nDocs] [dupPct]"`.
  */
object DupSpanScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(500000)
    val dupPct = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    // the planted rate is id % (100/dupPct) == 0 — integer division:
    // a dupPct that doesn't divide 100 silently skews the rate, and
    // dupPct > 100 makes the stride 0 (modulo-by-zero at runtime)
    require(dupPct >= 1 && dupPct <= 100 && 100 % dupPct == 0,
      s"dupPct=$dupPct must be a divisor of 100 in [1, 100]")
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docTokens = 60
    // position-unique filler words: w<hex of (doc_id, pos)> — a
    // duplicated 10-gram can only come from the planted passages
    val filler = transform(sequence(lit(0), lit(docTokens - 1)),
      p => concat(lit("w"), hex(xxhash64(col("id"), p))))
    val passage = (1 to 15).map(i => s"p$i").mkString(" ")
    val isCarrier = col("id") % lit(100L / dupPct) === 0
    val isRepeater = col("id") % 997 === 0
    val docs = spark.range(nDocs).toDF("id")
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          array_join(slice(filler, 1, 30), " "),
          when(isCarrier, lit(passage)).otherwise(array_join(slice(filler, 31, 3), " ")),
          array_join(slice(filler, 34, 20), " "),
          when(isRepeater, array_join(slice(filler, 1, 10), " "))
            .otherwise(array_join(slice(filler, 54, 7), " "))).as("text"))
      .repartition(64).cache()
    docs.count() // materialize generation outside the timing

    val t0 = System.nanoTime()
    val spans = Dedup.dupSpans(docs)
    val nGrams = spans.agg(sum("n_dup_grams")).head.getLong(0)
    val spanSec = (System.nanoTime() - t0) / 1e9

    // planted arithmetic: carriers cover exactly the 15-token passage;
    // repeaters their 10-token echo at BOTH sites (starts gap > 10 → 20)
    val byShape = spans.groupBy(
      (col("doc_id") % lit(100L / dupPct) === 0).as("carrier"),
      (col("doc_id") % 997 === 0).as("repeater"))
      .agg(countDistinct(col("dup_tokens")).as("distinctCov"),
        max(col("dup_tokens")).as("cov"), count(lit(1)).as("n"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def shape(c: Boolean, rep: Boolean): (Long, Long) = {
      val (d, cov, _) = byShape((c, rep)); (d, cov)
    }
    assert(shape(false, false) == ((1L, 0L)), s"clean docs: ${shape(false, false)}")
    assert(shape(true, false) == ((1L, 15L)), s"carriers: ${shape(true, false)}")
    assert(shape(false, true) == ((1L, 20L)), s"repeaters: ${shape(false, true)}")
    assert(shape(true, true) == ((1L, 35L)), s"carrier+repeater: ${shape(true, true)}")

    val t1 = System.nanoTime()
    val removed = Dedup.removeDupSpans(docs)
    val nRemoved = removed.agg(sum(col("n_tokens") - col("n_kept"))).head.getLong(0)
    val removeSec = (System.nanoTime() - t1) / 1e9

    // removal ≡ coverage, corpus-wide
    val mismatch = spans.select(col("doc_id"), col("dup_tokens"))
      .join(removed.select(col("doc_id"),
        (col("n_tokens") - col("n_kept")).as("gone")), Seq("doc_id"))
      .filter(col("dup_tokens") =!= col("gone")).count()
    assert(mismatch == 0, s"$mismatch docs where removal != coverage")

    println(s"""{"smoke":"dup_span_scale","n_docs":$nDocs,"dup_pct":$dupPct,""" +
      s""""dup_grams":$nGrams,"removed_tokens":$nRemoved,""" +
      f""""span_sec":$spanSec%.1f,"remove_sec":$removeSec%.1f}""")
    spark.stop()
  }
}
