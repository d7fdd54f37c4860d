package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.LshConfig

class LshConfigSpec extends AnyFunSuite {

  // Note: br.py docstring examples contradict its own formulas; the
  // asserts below are the values the reference CODE computes.
  test("threshold matches closed form (1/b)^(1/r)") {
    assert(math.abs(LshConfig.threshold(100, 5) - math.pow(0.01, 0.2)) < 1e-12)
    assert(math.abs(LshConfig.threshold(10, 10) - 0.7943282347242815) < 1e-12)
  }

  test("collision probability matches 1-(1-s^r)^b") {
    assert(math.abs(LshConfig.collisionProbability(0.5, 20, 5) -
      (1.0 - math.pow(1.0 - math.pow(0.5, 5), 20))) < 1e-12)
    assert(LshConfig.collisionProbability(0.0, 20, 5) === 0.0)
    assert(LshConfig.collisionProbability(1.0, 20, 5) === 1.0)
  }

  test("optimalConfig: b*r = numPerm always; precomputed table honored") {
    for (np <- Seq(128, 256, 512, 1024); t <- Seq(0.5, 0.7, 0.8, 0.9)) {
      val (b, r) = LshConfig.optimalConfig(np, t)
      assert(b * r === np, s"np=$np t=$t -> ($b,$r)")
    }
    assert(LshConfig.optimalConfig(4096, 0.9) === (64, 64))
    assert(LshConfig.optimalConfig(16384, 0.8) === (512, 32))
    assert(LshConfig.optimalConfig(65536, 0.95) === (512, 128))
  }

  test("optimalConfig(128, 0.8): no factorization within tolerance → sqrt fallback (8, 16)") {
    // reference code path: find_optimal_br returns None (nearest
    // thresholds 0.707 and 0.878 are both >0.05 away), heuristic walks
    // b=11→8 → (8, 16); the br.py docstring's (16,8) is not what the
    // code produces.
    assert(LshConfig.findOptimalBr(128, 0.8).isEmpty)
    assert(LshConfig.optimalConfig(128, 0.8) === (8, 16))
  }

  test("false rates integrate to sane values and shrink with steeper curves") {
    val (fp1, fn1) = LshConfig.falseRates(16, 8, 0.8)
    assert(fp1 > 0 && fp1 < 0.2 && fn1 > 0 && fn1 < 0.2)
    val (fp2, fn2) = LshConfig.falseRates(512, 32, 0.8)
    assert(fp2 + fn2 < fp1 + fn1)
  }

  test("analysisReport contains layout, threshold, and curve (br.py print_config_analysis)") {
    val rep = LshConfig.analysisReport(128, 0.5)
    assert(rep.contains("bands=") && rep.contains("rows_per_band="))
    assert(rep.contains("actual_threshold="))
    assert(rep.contains("similarity 0.9"))
  }

  test("S-curve is monotone in similarity") {
    val ps = (0 to 20).map(i => LshConfig.collisionProbability(i / 20.0, 32, 8))
    assert(ps.zip(ps.tail).forall { case (a, b) => b >= a })
  }
}
