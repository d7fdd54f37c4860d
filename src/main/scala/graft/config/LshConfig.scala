package graft.config

/** LSH band/row configuration math — the Spark-side equivalent of the
  * reference's parameter optimizer (lshrs/utils/br.py).
  *
  * S-curve: P(s) = 1 - (1 - s^r)^b; threshold ≈ (1/b)^(1/r); false
  * rates by numeric integration (Simpson; the reference uses adaptive
  * quadrature — agreement verified in LshConfigSpec).
  */
object LshConfig {

  /** Similarity where detection probability ≈ 0.5 (br.py:81). */
  def threshold(b: Int, r: Int): Double = math.pow(1.0 / b, 1.0 / r)

  /** P(two items with similarity s collide in ≥1 band) (br.py:120). */
  def collisionProbability(s: Double, b: Int, r: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  /** (falsePositiveRate, falseNegativeRate) for a threshold, via
    * Simpson integration of the S-curve mass on each side (br.py:162 —
    * the reference integrates without normalizing; mirrored here).
    */
  def falseRates(b: Int, r: Int, threshold: Double, n: Int = 2048): (Double, Double) = {
    def simpson(f: Double => Double, lo: Double, hi: Double): Double = {
      if (hi <= lo) return 0.0
      val h = (hi - lo) / n
      var s = f(lo) + f(hi)
      var i = 1
      while (i < n) {
        s += f(lo + i * h) * (if (i % 2 == 1) 4.0 else 2.0)
        i += 1
      }
      s * h / 3.0
    }
    val fp = simpson(s => collisionProbability(s, b, r), 0.0, threshold)
    val fn = simpson(s => 1.0 - collisionProbability(s, b, r), threshold, 1.0)
    (fp, fn)
  }

  /** Pre-computed optimal configurations for common hash sizes
    * (behavioral constants of the reference, br.py:38
    * PRECOMPUTED_CONFIGS: hash size → threshold → (bands, rows)).
    */
  val Precomputed: Map[Int, Map[Double, (Int, Int)]] = Map(
    4096 -> Map(0.5 -> (512, 8), 0.7 -> (256, 16), 0.85 -> (128, 32),
      0.9 -> (64, 64), 0.95 -> (32, 128)),
    8192 -> Map(0.4 -> (1024, 8), 0.7 -> (512, 16), 0.8 -> (256, 32),
      0.85 -> (256, 32), 0.9 -> (128, 64), 0.95 -> (64, 128)),
    16384 -> Map(0.4 -> (2048, 8), 0.6 -> (1024, 16), 0.8 -> (512, 32),
      0.85 -> (512, 32), 0.9 -> (256, 64), 0.95 -> (128, 128)),
    32768 -> Map(0.4 -> (4096, 8), 0.6 -> (2048, 16), 0.8 -> (1024, 32),
      0.85 -> (1024, 32), 0.9 -> (512, 64), 0.95 -> (256, 128)),
    65536 -> Map(0.3 -> (8192, 8), 0.6 -> (4096, 16), 0.8 -> (2048, 32),
      0.85 -> (1024, 64), 0.9 -> (1024, 64), 0.95 -> (512, 128)))

  /** Exhaustive factorization search minimizing FP+FN within threshold
    * tolerance (br.py:223 find_optimal_br; same iteration order and
    * strict-improvement tie-break).
    */
  def findOptimalBr(numPerm: Int, target: Double, tolerance: Double = 0.05): Option[(Int, Int)] = {
    var best: Option[(Int, Int)] = None
    var bestScore = Double.PositiveInfinity
    def consider(b: Int, r: Int): Unit = {
      if (math.abs(threshold(b, r) - target) <= tolerance) {
        val (fp, fn) = falseRates(b, r, target)
        if (fp + fn < bestScore) { bestScore = fp + fn; best = Some((b, r)) }
      }
    }
    val sqrtN = math.sqrt(numPerm).toInt
    for (r <- 1 to sqrtN if numPerm % r == 0) consider(numPerm / r, r)
    for (b <- 1 to sqrtN if numPerm % b == 0) consider(b, numPerm / b)
    best
  }

  /** Human-readable configuration analysis (reference: br.py:398
    * print_config_analysis) — optimal layout, threshold, error rates,
    * and the detection-probability curve at key similarities.
    */
  def analysisReport(numPerm: Int, targetThreshold: Double = 0.5): String = {
    val (b, r) = optimalConfig(numPerm, targetThreshold)
    val (fp, fn) = falseRates(b, r, targetThreshold)
    val curve = Seq(0.3, 0.5, 0.7, 0.9)
      .map(s => f"  similarity $s%.1f: ${collisionProbability(s, b, r) * 100}%.2f%% detection")
      .mkString("\n")
    f"""LSH configuration analysis
       |num_perm=$numPerm target_threshold=$targetThreshold%.2f
       |bands=$b rows_per_band=$r
       |actual_threshold=${threshold(b, r)}%.4f
       |false_positive_rate=${fp * 100}%.2f%% false_negative_rate=${fn * 100}%.2f%%
       |s_curve_steepness=${b * r}
       |$curve""".stripMargin
  }

  /** Three-tier config selection (br.py:325 get_optimal_config):
    * precomputed table → optimal search → square-root heuristic.
    */
  def optimalConfig(numPerm: Int, target: Double = 0.5): (Int, Int) = {
    Precomputed.get(numPerm).foreach { table =>
      val closest = table.keys.minBy(t => math.abs(t - target))
      if (math.abs(closest - target) <= 0.05) return table(closest)
    }
    findOptimalBr(numPerm, target).getOrElse {
      var b = math.sqrt(numPerm).toInt
      while (numPerm % b != 0) b -= 1
      (b, numPerm / b)
    }
  }
}
