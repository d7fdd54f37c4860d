package graft.dedup

/** k-wise family of integer hash functions over the 60-bit base hash:
  * h_i(x) = (A_i·hi(x) + B_i·lo(x) + C_i) mod (2^61 − 1), with
  * hi/lo the 30-bit halves of hex64(x).
  *
  * One md5 per shingle (the expensive part) feeds all k functions —
  * 16× fewer digests than hashing per function. Products are ≤ 2^60
  * and the three-term sum ≤ 2^62, so the arithmetic is overflow-free
  * in any int64 engine (DuckDB raises on overflow rather than
  * wrapping; this family is chosen to stay in range there too).
  */
object MinhashFamily {

  val Prime: Long = 2305843009213693951L // 2^61 − 1
  val LoMask: Long = 0x3FFFFFFFL         // low 30 bits

  final case class Coef(a: Long, b: Long, c: Long)

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic coefficients: A,B odd in [2^29, 2^30), C in [0, 2^60). */
  def coefs(k: Int, seed: Long = 0x5EEDCAFEL): IndexedSeq[Coef] =
    (0 until k).map { i =>
      val a = (mix(seed + 3L * i) & 0x1FFFFFFFL) | 0x20000001L
      val b = (mix(seed + 3L * i + 1) & 0x1FFFFFFFL) | 0x20000001L
      val c = mix(seed + 3L * i + 2) & ((1L << 60) - 1)
      Coef(a, b, c)
    }
}
