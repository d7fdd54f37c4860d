package graft.lsh

/** Deterministic Gaussian hyperplanes for sign-random-projection LSH
  * (the reference seeds one numpy Generator and draws per-band
  * matrices, lshrs/hash/lsh.py:93; a distributed engine needs planes
  * that are a pure function of (seed, band, row, j) so every executor
  * materializes identical matrices with no broadcast and no RNG state).
  *
  * SplitMix64 bit-mixing supplies two uniforms per plane coefficient;
  * Box-Muller converts to N(0,1). Quality is ample for LSH: the only
  * requirement is a spherically-symmetric projection distribution.
  */
object RandomProjection {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Uniform in (0, 1): 53 random bits, offset to exclude 0. */
  private def uniform(bits: Long): Double = ((bits >>> 11) + 0.5) / (1L << 53).toDouble

  /** N(0,1) coefficient for plane (band, row) component j under seed. */
  def gaussian(seed: Long, band: Int, row: Int, j: Int): Double = {
    val key = mix(seed) ^ (band.toLong * 0xD6E8FEB86659FD93L) ^
      (row.toLong * 0xCA5A826395121157L) ^ j.toLong
    val u1 = uniform(mix(key))
    val u2 = uniform(mix(key + 0x632BE59BD9B4E019L))
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** All planes for a band, flattened row-major: planes(row * dim + j). */
  def bandPlanes(seed: Long, band: Int, rowsPerBand: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](rowsPerBand * dim)
    var r = 0
    while (r < rowsPerBand) {
      var j = 0
      while (j < dim) { out(r * dim + j) = gaussian(seed, band, r, j); j += 1 }
      r += 1
    }
    out
  }

  /** planes(band)(row * dim + j) for all bands. */
  def planes(seed: Long, numBands: Int, rowsPerBand: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numBands)(b => bandPlanes(seed, b, rowsPerBand, dim))
}
