package graft

import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import GraftFunctions._
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): Any = df.collect().head.get(0)

  test("cosine_sim basic geometry") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(1f, 0f, 0f)),   // identical → 1
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),   // orthogonal → 0
      (Array(1f, 0f, 0f), Array(-1f, 0f, 0f)),  // opposite → -1
      (Array(1f, 1f, 0f), Array(1f, 0f, 0f))    // 45° → √2/2
    ).toDF("a", "b").select(cosine_sim($"a", $"b").as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
    assert(math.abs(got(3) - math.sqrt(2) / 2) < 1e-12)
  }

  test("cosine_sim zero vector is NULL (reference raises ValueError)") {
    val df = Seq((Array(0f, 0f), Array(1f, 2f))).toDF("a", "b")
      .select(cosine_sim($"a", $"b").as("c"))
    assert(df.collect().head.isNullAt(0))
  }

  test("DetLn.ln: accurate to ~ulp against math.log over the supported range") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.tabulate(20000) { _ =>
      math.pow(2.0, rnd.nextDouble() * 128 - 64) * (0.5 + rnd.nextDouble())
    } ++ (-64 to 64).map(j => math.pow(2.0, j)) ++
      Seq(1.0, 1.0000000001, 0.9999999999, math.E)
    samples.filter(x => x >= math.pow(2.0, -64) && x <= math.pow(2.0, 64)).foreach { x =>
      val got = graft.expressions.DetLn.ln(x)
      val want = math.log(x)
      // near x=1 the k=±1 paths cancel k·LN2 against ln m, leaving an
      // absolute error of ~ulp(LN2) regardless of the tiny result
      val tol = math.max(math.ulp(want) * 8, 8e-16)
      assert(math.abs(got - want) <= tol, s"ln($x): $got vs $want")
    }
    // codegen and interpreted agree (same static call)
    val df = Seq(0.5, 1.0, 123.456).toDF("x")
      .select(org.apache.spark.sql.GraftColumnBridge.column(
        graft.expressions.DetLnExpr(org.apache.spark.sql.GraftColumnBridge.expression(
          org.apache.spark.sql.functions.col("x")))).as("l"))
    assert(df.collect().map(_.getDouble(0)).toSeq ===
      Seq(0.5, 1.0, 123.456).map(graft.expressions.DetLn.ln))
  }

  test("dimension mismatch raises instead of truncating (reference ValueError)") {
    val mismatched = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    Seq(cosine_sim($"a", $"b"), dot_product($"a", $"b")).foreach { c =>
      val e = intercept[Exception] { mismatched.select(c).collect() }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(_.getMessage != null) &&
        causes(e).exists(c => Option(c.getMessage).exists(_.contains("dimensions differ"))),
        s"unexpected error: $e")
    }
    // LSH signatures likewise refuse a vector that disagrees with dim
    val p = graft.lsh.LshParams(dim = 64, numPerm = 32,
      numBands = Some(8), rowsPerBand = Some(4))
    val bad = Seq((1L, Array.fill(63)(1f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] { graft.lsh.LshIndex.build(bad, p).collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage).exists(_.contains("dimensions differ"))))
  }

  test("adc_score: hand-computed lookup sums; layout and range errors raise") {
    // m=2 subspaces, k=3 codes: tab slots [s0: 1,2,3 | s1: 10,20,30]
    // Seq[Byte] → array<tinyint> (an Array[Byte] column would be binary)
    val tab = Array(1.0, 2.0, 3.0, 10.0, 20.0, 30.0)
    val rows = Seq(
      (Seq(0.toByte, 0.toByte), 1.0 + 10.0),
      (Seq(2.toByte, 1.toByte), 3.0 + 20.0),
      (Seq(1.toByte, 2.toByte), 2.0 + 30.0))
    rows.foreach { case (codes, want) =>
      val got = one(Seq((codes, tab)).toDF("c", "t")
        .select(adc_score($"c", $"t"))).asInstanceOf[Double]
      assert(got === want, s"adc_score(${codes.toSeq}) = $got, want $want")
    }
    // interpreted eval (constant-folded literals) agrees with codegen
    val lit2 = one(Seq(1).toDF("x").select(adc_score(
      typedLit(Seq(2.toByte, 1.toByte)), typedLit(tab)))).asInstanceOf[Double]
    assert(lit2 === 23.0)
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    // table length not a multiple of m → loud error, not a mis-indexed score
    val badLayout = intercept[Exception] {
      Seq((Seq(0.toByte, 0.toByte, 0.toByte, 0.toByte), tab)).toDF("c", "t")
        .select(adc_score($"c", $"t")).collect()
    }
    assert(causes(badLayout).exists(c =>
      Option(c.getMessage).exists(_.contains("not a multiple"))))
    // code outside [0, k) → loud error (would read another subspace's slot)
    val badCode = intercept[Exception] {
      Seq((Seq(3.toByte, 0.toByte), tab)).toDF("c", "t")
        .select(adc_score($"c", $"t")).collect()
    }
    assert(causes(badCode).exists(c =>
      Option(c.getMessage).exists(_.contains("out of range"))))
    // a mistyped table (array<float> — would read misaligned bytes)
    // fails at ANALYSIS time, before any task runs
    val mistyped = intercept[Exception] {
      Seq((Seq(0.toByte, 0.toByte), tab.map(_.toFloat))).toDF("c", "t")
        .select(adc_score($"c", $"t"))
    }
    assert(causes(mistyped).exists(c =>
      Option(c.getMessage).exists(_.contains("array<double>"))), s"got: $mistyped")
  }

  test("cosine_sim interpreted eval matches codegen") {
    // force interpreted path via filter on the expression in a situation
    // Catalyst may constant-fold; compare against a manual computation
    val a = Array.tabulate(64)(i => (i % 7 - 3).toFloat)
    val b = Array.tabulate(64)(i => (i % 5 - 2).toFloat)
    val got = one(Seq((a, b)).toDF("a", "b").select(cosine_sim($"a", $"b"))).asInstanceOf[Double]
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- 0 until 64) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
    assert(got === dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  test("dot_product and l2_norm") {
    val got = Seq((Array(3f, 4f), Array(1f, 2f))).toDF("a", "b")
      .select(dot_product($"a", $"b"), l2_norm($"a"), l2_normalize($"a"))
      .collect().head
    assert(got.getDouble(0) === 11.0)
    assert(got.getDouble(1) === 5.0)
    assert(got.getSeq[Double](2) == Seq(0.6, 0.8))
  }

  test("hex64 matches md5-prefix reference computation") {
    val got = Seq("abc").toDF("s").select(hex64($"s")).collect().head.getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got === java.lang.Long.parseLong(md.take(15), 16))
  }

  test("SQL registration: cosine_sim usable from spark.sql") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    emb.createOrReplaceTempView("emb_v")
    val n = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_v LIMIT 5")
      .collect().map(_.getDouble(0))
    assert(n.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("cosine_sim over embeddings stays in whole-stage codegen") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val plan = emb.select(cosine_sim($"embedding", $"embedding").as("c"))
      .queryExecution.executedPlan
    val hasCodegen = plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasCodegen, s"plan lacks codegen span:\n$plan")
  }

  test("gaussian_project: bitwise JVM recount with the shared plane family") {
    import graft.ann.Project
    val emb = Tables.load(spark, sfDir, "embeddings").limit(20)
    val got = emb.select($"vec_id", Project.project($"embedding").as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val planes = graft.lsh.RandomProjection.bandPlanes(
      Project.Seed, 0, Project.OutDim, Project.Dim)
    val raw = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    raw.foreach { case (id, v) =>
      val expect = (0 until Project.OutDim).map { r =>
        var dot = 0.0
        var i = 0
        while (i < Project.Dim) { dot += planes(r * Project.Dim + i) * v(i); i += 1 }
        dot * 0.25
      }
      assert(got(id) === expect, s"vec $id")
    }
  }

  test("gaussian_project: JL cosine preservation on real embeddings") {
    import graft.ann.Project
    val emb = Tables.load(spark, sfDir, "embeddings")
    def mae(outDim: Int): Double = {
      val q = emb.select($"vec_id", $"embedding",
        Project.project($"embedding", outDim = outDim).as("proj"))
      val qa = q.filter($"vec_id" < 20).as("a")
      val qb = q.filter($"vec_id" >= 20 && $"vec_id" < 60).as("b")
      qa.crossJoin(qb)
        .select(abs(cosine_sim($"a.embedding", $"b.embedding") -
          cosine_sim($"a.proj", $"b.proj")).as("e"))
        .agg(avg($"e")).head().getDouble(0)
    }
    // JL distortion for near-orthogonal random vectors is ~0.8/sqrt(d')
    // per pair (0.20 measured at d'=16): assert the absolute scale AND
    // the 1/sqrt(d') scaling law from 16 -> 64 dims
    val m16 = mae(16)
    val m64 = mae(64)
    assert(m16 < 0.25, s"mae16 $m16")
    assert(m64 < 0.65 * m16, s"mae did not shrink with d': $m16 -> $m64")
    // identical vectors keep cosine exactly 1 in the projected space
    val self = emb.limit(5)
      .select(Project.project($"embedding").as("proj"))
      .select(cosine_sim($"proj", $"proj").as("c")).collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("probeTopKProjected: window-free plan; probed-cell recall vs exhaustive within each query's cells") {
    import graft.ann.Project
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" < 10)
    val cents = emb.filter($"vec_id" < 8)
    val df = Project.probeTopKProjected(emb, q, cents, nProbe = 2, k = 5)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("Window"), s"projected IVF plans a window:\n$phys")
    // probing EVERY cell makes the projected path an exhaustive search
    // in disguise — it must then agree with brute force row-for-row
    val all = Project.probeTopKProjected(emb, q, cents, nProbe = 8, k = 5)
      .collect().map(_.toString)
    val brute = graft.ann.Knn.cosineTopK(emb, q, k = 5).collect().map(_.toString)
    assert(all.sameElements(brute))
  }

  test("vec_quality flags: NaN vectors, zero vectors, and healthy ones") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vecs = Seq(
      (1L, Array(3.0f, 4.0f)), //                      healthy, norm 5
      (2L, Array(Float.NaN, 1.0f)), //                 NaN dim
      (3L, Array(0.0f, 0.0f)), //                      zero vector
      (4L, Array(1.0f, 0.0f))) //                      one zero dim, fine
      .toDF("vec_id", "embedding")
    val got = vecs.select(col("vec_id"),
        size(filter(col("embedding"), x => isnan(x))).cast("long").as("n_nan"),
        size(filter(col("embedding"), x => x === 0f)).cast("long").as("n_zero_dims"),
        GraftFunctions.l2_norm(col("embedding")).as("l2norm"))
      .withColumn("keep",
        col("n_nan") === 0L && !isnan(col("l2norm")) && col("l2norm") > 0.0)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(got(1L).getAs[Boolean]("keep") && got(1L).getAs[Double]("l2norm") === 5.0)
    assert(got(2L).getAs[Long]("n_nan") === 1L && !got(2L).getAs[Boolean]("keep"))
    assert(got(3L).getAs[Long]("n_zero_dims") === 2L && !got(3L).getAs[Boolean]("keep"))
    assert(got(4L).getAs[Boolean]("keep"))
  }

  test("labelOutliers: farthest-from-centroid ranking; window-free bounded top-k") {
    // label 0: three vectors at x = 0, 0, 3 → centroid x = 1.0;
    // distances 1, 1, 2 → outlier #1 is vec 3, then the tie (1,2)
    // breaks on vec_id
    val emb = Seq(
      (1L, Array(0f, 0f), 0L), (2L, Array(0f, 0f), 0L), (3L, Array(3f, 0f), 0L),
      (10L, Array(5f, 5f), 1L), (11L, Array(5f, 5f), 1L))
      .toDF("vec_id", "embedding", "label")
    val got = graft.ann.Centroids.labelOutliers(emb, k = 2).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("rn")) ->
        (r.getAs[Long]("vec_id"), r.getAs[Double]("dist"))).toMap
    assert(got((0L, 1L)) === (3L, 2.0))
    assert(got((0L, 2L)) === (1L, 1.0), "distance tie must break on vec_id asc")
    // label 1 is degenerate: both vectors AT the centroid, dist 0
    assert(got((1L, 1L))._2 === 0.0 && got((1L, 2L))._2 === 0.0)
    // bounded aggregate, not a rank window over the corpus
    val phys = graft.ann.Centroids.labelOutliers(emb, k = 2)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Window"), s"labelOutliers routes through a window:\n$phys")
  }
}
