package graft

import org.apache.spark.sql.functions._

import graft.lsh.{LshIndex, LshParams, RandomProjection}

/** Mirrors the reference's own behavioral test suite
  * (reference: tests/test_core.py, tests/test_lshrs.py) in the
  * set-oriented Spark model. Redis/buffer mechanics
  * (test_buffer_semantics, test_redis_pooling, test_concurrency)
  * dissolve in the immutable-DataFrame design — there is no partial
  * flush state to test; the remaining behavioral surface is covered
  * here or in LshSpec/LshConfigSpec/VectorFunctionsSpec.
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private def randVec(dim: Int): Array[Float] = Array.fill(dim)(rng.nextGaussian().toFloat)

  // test_core.py:17-29 — constructor validation. rowsPerBand > 64 is
  // ACCEPTED, like the reference (its signatures are arbitrary-width
  // packed bytes, hash/lsh.py:171): wide configs route to the
  // byte-packed signature variant instead of being rejected.
  test("invalid params rejected: dim, num_perm, bands*rows; r>64 routes wide") {
    assertThrows[IllegalArgumentException](LshParams(dim = 0))
    assertThrows[IllegalArgumentException](LshParams(dim = 4, numPerm = 0))
    assertThrows[IllegalArgumentException](
      LshParams(dim = 4, numPerm = 8, numBands = Some(3), rowsPerBand = Some(2)))
    val wp = LshParams(dim = 4, numPerm = 130, numBands = Some(1), rowsPerBand = Some(130))
    assert(wp.wide && wp.b === 1 && wp.r === 130)
    assert(!LshParams(dim = 4, numPerm = 8, numBands = Some(2), rowsPerBand = Some(4)).wide)
  }

  // test_core.py:33 — auto-config when bands not specified
  test("auto-config picks b*r = numPerm for the target threshold") {
    val p = LshParams(dim = 16, numPerm = 128, similarityThreshold = 0.5)
    assert(p.b * p.r === 128)
  }

  // test_core.py:112 — a vector is its own best match
  test("identical vector found: query vector's twin ranks in top-5") {
    val dim = 32
    val p = LshParams(dim = dim, numPerm = 32, numBands = Some(8), rowsPerBand = Some(4))
    val target = randVec(dim)
    val corpus = ((0L, target) +: (1 until 20).map(i => (i.toLong, randVec(dim)))).toDF("vec_id", "embedding")
    val query = Seq((100L, target)).toDF("vec_id", "embedding")
    val top = LshIndex.topK(corpus, query, p, 5).collect().map(_.getAs[Long]("cand_id"))
    assert(top.contains(0L), s"target not in top-5: ${top.mkString(",")}")
    // and it collides in every band
    val best = LshIndex.topK(corpus, query, p, 1).collect().head
    assert(best.getAs[Long]("cand_id") === 0L)
    assert(best.getAs[Long]("n_collisions") === p.b)
  }

  // test_core.py:127 — near-duplicates rank above random vectors
  test("similar vectors ranked above dissimilar") {
    val dim = 64
    val p = LshParams(dim = dim, numPerm = 64, numBands = Some(16), rowsPerBand = Some(4))
    val base = randVec(dim)
    val near = base.map(x => x + rng.nextGaussian().toFloat * 0.01f)
    val corpus = ((0L, near) +: (1 until 30).map(i => (i.toLong, randVec(dim)))).toDF("vec_id", "embedding")
    val query = Seq((100L, base)).toDF("vec_id", "embedding")
    val top = LshIndex.topK(corpus, query, p, 5).collect().map(_.getAs[Long]("cand_id"))
    assert(top.contains(0L))
  }

  // test_core.py:146 — empty corpus returns no results
  test("query returns empty when no data") {
    val p = LshParams(dim = 8, numPerm = 8, numBands = Some(4), rowsPerBand = Some(2))
    val corpus = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val query = Seq((0L, randVec(8))).toDF("vec_id", "embedding")
    assert(LshIndex.topK(corpus, query, p, 10).collect().isEmpty)
  }

  // test_core.py:175 — top_p validation
  test("top_p out of range raises") {
    val p = LshParams(dim = 8, numPerm = 8, numBands = Some(4), rowsPerBand = Some(2))
    val df = Seq((0L, randVec(8))).toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException](LshIndex.topPRerank(df, df, p, topP = 0.0))
    assertThrows[IllegalArgumentException](LshIndex.topPRerank(df, df, p, topP = 1.5))
  }

  // test_core.py:201 — top_p returns (index, similarity) rows covering candidates
  test("top_p=1.0 reranks and returns every candidate with a cosine score") {
    val dim = 8
    val p = LshParams(dim = dim, numPerm = 4, numBands = Some(2), rowsPerBand = Some(2))
    val basis = (0 until dim).map { i =>
      (i.toLong, Array.tabulate(dim)(j => if (i == j) 1f else 0f))
    }
    val corpus = basis.toDF("vec_id", "embedding")
    val query = Seq((100L, basis.head._2)).toDF("vec_id", "embedding")
    val res = LshIndex.topPRerank(corpus, query, p, topP = 1.0).collect()
    assert(res.nonEmpty)
    assert(res.forall(r => !r.isNullAt(r.fieldIndex("sim"))))
    // sorted by similarity descending with rn contiguous from 1
    val rns = res.map(_.getAs[Long]("rn")).sorted
    assert(rns.sameElements(1L to res.length))
  }

  // test_core.py:393/404 — seed determinism
  test("same seed same signatures; different seed different signatures") {
    val dim = 16
    val df = (0 until 10).map(i => (i.toLong, randVec(dim))).toDF("vec_id", "embedding")
    def sigs(seed: Long) = LshIndex.signatures(
      df, LshParams(dim = dim, numPerm = 16, numBands = Some(4), rowsPerBand = Some(4), seed = seed))
      .orderBy("vec_id").collect().map(_.getSeq[Long](1))
    assert(sigs(42L).toSeq === sigs(42L).toSeq)
    assert(sigs(42L).toSeq !== sigs(43L).toSeq)
  }

  // test_lshrs.py:31 — signature shapes: numBands longs, r bits each
  test("signature shapes match the band layout") {
    val p = LshParams(dim = 16, numPerm = 12, numBands = Some(3), rowsPerBand = Some(4))
    val df = Seq((0L, randVec(16))).toDF("vec_id", "embedding")
    val s = LshIndex.signatures(df, p).collect().head.getSeq[Long](1)
    assert(s.length === 3)
    assert(s.forall(v => v >= 0 && v < 16))
  }

  // test_lshrs.py:100/110 — unit norm; zero vector surfaces as NULL
  test("l2 normalize: unit output, NULL for the zero vector") {
    val df = Seq((1L, Array(3f, 4f)), (2L, Array(0f, 0f))).toDF("id", "v")
      .select(col("id"), GraftFunctions.l2_normalize(col("v")).as("u"),
        GraftFunctions.l2_norm(col("v")).as("n"))
      .orderBy("id").collect()
    assert(df(0).getSeq[Double](1) === Seq(0.6, 0.8))
    assert(df(1).isNullAt(1)) // reference raises "Cannot normalize zero vector"
  }
}
