package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftFunctions
import graft.GraftFunctions.{hex64, shingles, tokens}

/** Deduplication suite for training-data pipelines.
  *
  * All fingerprints derive from the portable md5-prefix hash
  * ([[GraftFunctions.hex64]]) so results are integer-exact across
  * engines; the MinHash scheme mirrors the reference's banding design
  * (b bands of r rows, collision when a full band matches — reference:
  * lshrs/hash/lsh.py banding, lshrs/utils/br.py S-curve) but over
  * shingle sets with Jaccard similarity, the standard text-dedup
  * instantiation.
  *
  * Scale notes (100 TB):
  *  - minhash signatures are computed with map-side partial aggregation
  *    — the shuffle carries k longs per doc, never the shingles;
  *  - candidate generation joins on (band, band_hash): hash-partition
  *    co-location, hot buckets handled by AQE skew join;
  *  - exact-Jaccard verification only touches candidate pairs (like the
  *    reference's cosine rerank of bucket candidates);
  *  - the raw shingle-join variant (ngramJaccardPairs) is the exact
  *    baseline; at scale prefer minhashLshPairs which bounds join
  *    fan-out by band width.
  */
object Dedup {

  val MinhashK = 16      // hash functions (num_perm)
  val Bands = 4          // b
  val RowsPerBand = 4    // r: threshold ≈ (1/b)^(1/r) = 0.707
  val ShingleWidth = 3

  private def withToks(docs: DataFrame): DataFrame =
    docs.withColumn("toks", tokens(col("text")))

  /** Distinct (doc_id, shingle) pairs. `shingles()` already dedupes
    * within each document (array_distinct), so no extra shuffle is
    * needed to get set semantics.
    */
  def shingleSet(docs: DataFrame): DataFrame =
    withToks(docs)
      .select(col("doc_id"), explode(shingles(col("text"), ShingleWidth)).as("s"))

  /** Exact dedup on the normalized token stream: fingerprint, group
    * size, and a keep flag on the minimum doc_id of each group.
    */
  def exact(docs: DataFrame): DataFrame = {
    val t = withToks(docs)
      .withColumn("fingerprint", hex64(array_join(col("toks"), " ")))
    val w = Window.partitionBy(col("fingerprint"))
    t.select(
      col("doc_id"), col("fingerprint"),
      count(lit(1)).over(w).as("group_size"),
      (col("doc_id") === min(col("doc_id")).over(w)).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** MinHash aggregation over a (doc_id, s) shingle table. */
  private def minhashOf(sh: DataFrame): DataFrame = {
    val hashed = sh
      .withColumn("h", hex64(concat(lit("mh|"), col("s"))))
      .withColumn("hi", shiftright(col("h"), 30))
      .withColumn("lo", col("h").bitwiseAND(lit(MinhashFamily.LoMask)))
    val cs = MinhashFamily.coefs(MinhashK)
    val aggs = (0 until MinhashK).map { i =>
      val c = cs(i)
      min((col("hi") * c.a + col("lo") * c.b + lit(c.c)) % MinhashFamily.Prime)
        .as(f"mh_$i%02d")
    }
    hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash signature per document: ONE md5 per shingle feeds a
    * k-wise Carter-Wegman family ([[MinhashFamily]]); min over the
    * shingle set per function. One explode + one grouped aggregation
    * with map-side partials — the shuffle carries k longs per doc.
    */
  def minhash(docs: DataFrame): DataFrame =
    minhashOf(shingleSet(docs)).orderBy(col("doc_id"))

  /** (doc_id, band, band_hash) — one row per band; band hash combines
    * the band's r minhash values.
    */
  def minhashBands(mh: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map { j =>
      hex64(concat_ws(",", (0 until RowsPerBand).map(i => col(f"mh_${j * RowsPerBand + i}%02d")): _*))
    }
    mh.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "band_hash")))
  }

  /** MinHash-LSH near-duplicate pairs: candidates share ≥1 full band;
    * each candidate is verified with exact shingle-set Jaccard (the
    * analogue of the reference's cosine rerank of bucket candidates).
    * Returns (a, b, n_int, n_a, n_b, jaccard) for candidates with ≥1
    * shared shingle.
    */
  def minhashLshPairs(docs: DataFrame): DataFrame = {
    // the shingle set feeds both the signature branch and the exact
    // verification branch — cache it instead of recomputing the
    // tokenize/shingle pipeline twice
    val sh = shingleSet(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = minhashBands(minhashOf(sh))
    // cand is tiny but referenced three times downstream (both sides of
    // the doc filter + the intersection join) — cache it so the
    // signature/band subtree runs once
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    jaccardOf(cand, sh)
  }

  /** Exact n-gram Jaccard pairs: every pair sharing ≥1 shingle, kept
    * when jaccard ≥ minJaccard. The exact baseline for the LSH variant.
    * Intersection counts come straight off the shingle self-join (one
    * shuffle), no separate candidate materialization.
    */
  def ngramJaccardPairs(docs: DataFrame, minJaccard: Double = 0.5): DataFrame = {
    val sh = shingleSet(docs)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("n_int"))
    inter
      .join(sizes.as("za"), col("a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("b") === col("zb.doc_id"))
      .select(
        col("a"), col("b"), col("n_int"),
        col("za.n").as("n_a"), col("zb.n").as("n_b"),
        (col("n_int") / (col("za.n") + col("zb.n") - col("n_int"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .orderBy(col("a"), col("b"))
  }

  /** Exact Jaccard for given candidate pairs over a shingle set. The
    * shingle set is first narrowed to candidate docs with a broadcast
    * semi-join — at scale the candidate set is a vanishing fraction of
    * the corpus, so verification never re-shuffles the full data.
    */
  private def jaccardOf(cand: DataFrame, sh: DataFrame): DataFrame = {
    val candDocs = cand
      .select(explode(array(col("a"), col("b"))).as("doc_id")).distinct()
    val shc = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
    val sizes = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shc.as("sa"), col("a") === col("sa.doc_id"))
      .join(shc.as("sb"), col("b") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_int"))
    inter
      .join(sizes.as("za"), col("a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("b") === col("zb.doc_id"))
      .select(
        col("a"), col("b"), col("n_int"),
        col("za.n").as("n_a"), col("zb.n").as("n_b"),
        (col("n_int") / (col("za.n") + col("zb.n") - col("n_int"))).as("jaccard"))
      .orderBy(col("a"), col("b"))
  }

  /** Near-duplicate clusters: connected components over the MinHash-LSH
    * pair graph at `minJaccard`, labeled by the minimum doc_id of each
    * component — the canonical "keep one per cluster" dedup output.
    *
    * Iterative min-label propagation to the fixpoint (label of every
    * doc = min reachable doc_id); deterministic regardless of
    * iteration order. Iterations are bounded by component diameter —
    * near-dup components are shallow; a 100 TB run would swap in
    * large-star/small-star contraction with the same fixpoint.
    * Output: (doc_id, cluster_id, keep).
    */
  def nearDupClusters(docs: DataFrame, minJaccard: Double = 0.7, maxIters: Int = 20): DataFrame = {
    val pairs = minhashLshPairs(docs)
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = pairs.unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = docs.select(col("doc_id"), col("doc_id").as("cluster_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "b"), Seq("b"))
        .groupBy(col("a").as("doc_id"))
        .agg(min(col("cluster_id")).as("n_min"))
      val next = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("n_min"), col("cluster_id"))).as("cluster_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("cluster_id", "old"), Seq("doc_id"))
        .filter(col("cluster_id") =!= col("old")).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    labels
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("keep"))
      .orderBy(col("doc_id"))
  }

  val SimhashBits = 32

  /** 32-bit SimHash fingerprint: per token (with multiplicity) each
    * hash bit votes ±1; fingerprint bit = sign of the vote sum.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = withToks(docs).select(col("doc_id"), explode(col("toks")).as("t"))
    val h = tok.withColumn("h", hex64(concat(lit("t|"), col("t"))))
    val sums = (0 until SimhashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"s$b")
    }
    val bits = h.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
    val fp = (0 until SimhashBits)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    bits.select(col("doc_id"), fp.as("simhash")).orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming,
    * blocked on 4 byte-bands (a pair within Hamming ≤ 3 of a 32-bit
    * fingerprint must agree on ≥1 byte; wider distances may be missed
    * — that is the LSH trade-off, tunable via band count).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    // one row per doc; cached so the band self-join doesn't recompute
    // the 32-aggregate fingerprint pipeline for each side
    val sims = simhash(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandCols = (0 until 4).map(j => shiftright(col("simhash"), 8 * j).bitwiseAND(lit(255L)))
    val bands = sims.select(col("doc_id"), col("simhash"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bv")))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming) // filter before the distinct shuffle
      .distinct()
      .orderBy(col("a"), col("b"))
  }
}
