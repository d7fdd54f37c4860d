package graft

import org.apache.spark.sql.functions._

import graft.ann.Knn
import graft.lsh.{LshIndex, LshParams}

/** Scale evidence for the serving path at 100× the bench SF.
  *
  * Synthesizes 500k × 64-dim deterministic vectors with 100 planted
  * near-duplicates (cosine ≈ 0.9) of the 100 query vectors — the
  * reference engine's actual workload (near-dup retrieval above the
  * family threshold; LSH cannot and should not find the "top-k" of
  * uniformly random data, where neighbors are barely closer than
  * chance — with loose params the candidate set degenerates toward
  * the whole corpus and brute force wins, measured here before the
  * band layout below was chosen).
  *
  * Reports the one-time index/signature cost separately from per-batch
  * serving (the reference amortizes create_signatures the same way),
  * plus planted-pair recall for both paths.
  *
  * Run: `sbt "runMain graft.ScaleSmoke [nVectors]"`.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    val nQ = args.drop(1).headOption.map(_.toInt).getOrElse(1000)
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic pseudo-random coordinates from xxhash64 — exactly
    // reproducible regardless of partitioning
    def coords(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(63)),
        j => (pmod(xxhash64(id * 64 + j), lit(1000003L)) / 1000003.0 - 0.5).cast("float"))

    val base = spark.range(n).toDF("vec_id")
      .select(col("vec_id"), coords(col("vec_id")).as("embedding"))
    // planted near-dups of queries 0..99: 0.9*q + noise scaled for cosine≈0.9
    val planted = spark.range(nQ).toDF("qid")
      .select((col("qid") + n).as("vec_id"),
        zip_with(coords(col("qid")), coords(col("qid") + 7919 * n.toLong),
          (q, z) => (q * 2.0 + z).cast("float")).as("embedding"))
    val corpus = base.unionByName(planted).repartition(64).cache()
    corpus.count() // materialize data generation outside all timings

    val queries = corpus.filter(col("vec_id") < nQ).cache()
    queries.count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // exact serving: scan all n vectors per query batch
    val (bruteRows, tBrute) = time(Knn.cosineTopK(corpus, queries, 10).collect())

    // LSH serving: 16 bands × 12 rows — random collision ≈ 2^-12/band,
    // planted-pair detection ≈ 1-(1-p^12)^16 ≈ 0.93 at cosine 0.9
    val p = LshParams(dim = 64, numPerm = 192, numBands = Some(16), rowsPerBand = Some(12))
    val (_, tBuild) = time {
      val idx = LshIndex.build(corpus, p).cache()
      idx.count()
      idx
    }
    val (lshRows, tServe) = time {
      LshIndex.topPRerank(corpus, queries, p, topP = 1.0, topK = 10).collect()
    }

    // quantized-prefilter serving: same O(n·q) scoring pass but over
    // int8 codes (4× less data through the scan, integer multiply-adds)
    // with exact-cosine rerank of the 4k survivors per query
    val (quantRows, tQuant) = time {
      graft.ann.Quantize.quantizedTopK(corpus, queries, 10, prefilterK = 40).collect()
    }

    // 1-bit serving: the bottom of the compression ladder — the scan
    // reads two int64 words per vector (32× less than float32) and the
    // inner loop is XOR+popcount; same exact rerank of 40/query
    val (hamRows, tHam) = time {
      graft.ann.Quantize.binaryTopK(corpus, queries, 10, prefilterK = 40).collect()
    }

    // PQ / IVFADC: the ladder's middle rung — 8-byte code rows (32×
    // scan shrink vs float32) AND cell pruning (nProbe=8 of ~64 cells
    // → the ADC scan touches ~12% of the code rows), scored by the
    // codegen AdcScore kernel, exact rerank of 40/query. This rung is
    // the PRODUCTION path end-to-end: build = codebook fit on the
    // deterministic 10% sample + encode+assign + the bucketed-by-cell
    // table WRITE (saveCellIndex, one-time, amortized like the LSH
    // index build); serving reads the index AT REST (loadCellIndex →
    // the probe equi-join rides the table's cell bucketing).
    val pqCents = corpus
      .filter(col("vec_id") % math.max(n / 64, 1) === 0 && col("vec_id") < n)
      .cache()
    val pqTmp = java.nio.file.Files.createTempDirectory("graft_scale_ivfpq").toString
    val (pqIndex, tPqBuild) = time {
      val model = graft.ann.Pq.train(corpus, m = 8, k = 16)
      graft.ann.Pq.saveCellIndex(model, corpus, pqCents, "graft_scale_ivfpq",
        path = Some(s"$pqTmp/tbl"))
      graft.ann.Pq.loadCellIndex(spark, "graft_scale_ivfpq")
    }
    val (pqRows, tPqServe) = time {
      graft.ann.Pq.pqTopKOnCells(pqIndex._2, corpus, pqIndex._3, queries,
        pqIndex._1, nProbe = 8, k = 10, prefilterK = 40).collect()
    }

    // residual IVFADC (Jégou §V proper): same serving join shape plus
    // the centroid-similarity bias term — measures what the recall
    // refinement costs at scale on build (per-cell residual encode)
    // and serve (bias add), also from the index at rest
    val resTmp = java.nio.file.Files.createTempDirectory("graft_scale_ivfpq_res").toString
    val (resIndex, tResBuild) = time {
      val model = graft.ann.Pq.trainResidual(corpus, pqCents, m = 8, k = 16)
      graft.ann.Pq.saveCellIndex(model, corpus, pqCents, "graft_scale_ivfpq_res",
        path = Some(s"$resTmp/tbl"), residual = true)
      graft.ann.Pq.loadCellIndex(spark, "graft_scale_ivfpq_res")
    }
    val (resRows, tResServe) = time {
      graft.ann.Pq.pqTopKOnCells(resIndex._2, corpus, resIndex._3, queries,
        resIndex._1, nProbe = 8, k = 10, prefilterK = 40, residual = true).collect()
    }

    def plantedRecall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val hits = rows.count { r =>
        r.getAs[Long]("cand_id") == r.getAs[Long]("q_id") + n
      }
      hits.toDouble / nQ
    }
    // recall vs the exact top-k through Knn.recallEval — the SAME
    // operator (and driver row, ann_recall_eval) a production
    // deployment tunes nProbe/prefilterK/band layout by, not an
    // ad-hoc recount; inputs are the already-collected queries×k
    // frames, so the evaluation is corpus-size-free
    def recallVsExact(rows: Array[org.apache.spark.sql.Row]): Double = {
      import spark.implicits._
      def pairs(rs: Array[org.apache.spark.sql.Row]) =
        rs.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id"))).toSeq
          .toDF("q_id", "cand_id")
      Knn.recallEval(pairs(rows), pairs(bruteRows))
        .agg(avg(col("recall"))).head().getDouble(0)
    }
    // brute serving is O(corpus × queries); LSH serving touches only
    // ~0.5% of the corpus per query — the gap widens with batch size
    println(f"""{"corpus":$n,"queries":$nQ,"k":10,""" +
      f""""brute_serve_sec":$tBrute%.2f,""" +
      f""""lsh_build_sec":$tBuild%.2f,"lsh_serve_sec":$tServe%.2f,""" +
      f""""serve_speedup":${tBrute / tServe}%.2f,""" +
      f""""quant_serve_sec":$tQuant%.2f,""" +
      f""""hamming_serve_sec":$tHam%.2f,""" +
      f""""pq_build_incl_write_sec":$tPqBuild%.2f,"pq_ivfadc_serve_sec":$tPqServe%.2f,""" +
      f""""pq_res_build_incl_write_sec":$tResBuild%.2f,"pq_res_serve_sec":$tResServe%.2f,""" +
      f""""planted_recall_brute":${plantedRecall(bruteRows)}%.2f,""" +
      f""""planted_recall_lsh":${plantedRecall(lshRows)}%.2f,""" +
      f""""planted_recall_quant":${plantedRecall(quantRows)}%.2f,""" +
      f""""planted_recall_hamming":${plantedRecall(hamRows)}%.2f,""" +
      f""""planted_recall_pq":${plantedRecall(pqRows)}%.2f,""" +
      f""""planted_recall_pq_res":${plantedRecall(resRows)}%.2f,""" +
      f""""recall_vs_exact_lsh":${recallVsExact(lshRows)}%.2f,""" +
      f""""recall_vs_exact_quant":${recallVsExact(quantRows)}%.2f,""" +
      f""""recall_vs_exact_hamming":${recallVsExact(hamRows)}%.2f,""" +
      f""""recall_vs_exact_pq":${recallVsExact(pqRows)}%.2f,""" +
      f""""recall_vs_exact_pq_res":${recallVsExact(resRows)}%.2f}""")
    spark.stop()
  }
}
