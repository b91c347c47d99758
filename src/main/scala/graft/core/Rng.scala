package graft.core

import java.util.SplittableRandom

/** Deterministic per-config RNG. The reference seeds one global NumPy MT19937
  * (seed 42) per generator construction (a1.py:123-126); bit-level parity with
  * NumPy is explicitly a non-goal (SURVEY §6.2-3). Instead each config gets an
  * independent, partition-stable stream keyed by (seed, configId) — this keeps
  * generation deterministic under any Spark task placement or retry.
  */
final class Rng(seed: Long, streamId: Long) {
  private val r = new SplittableRandom(Rng.mix(seed, streamId))

  def nextDouble(): Double = r.nextDouble()
  def nextGaussian(): Double = r.nextGaussian()
  def nextExponential(): Double = r.nextExponential()
  def nextInt(bound: Int): Int = r.nextInt(bound)
  /** uniform int in [lo, hi) — matches np.random.randint(lo, hi). */
  def nextInt(lo: Int, hi: Int): Int = r.nextInt(lo, hi)

  /** Gaussian(0, scale) — np.random.normal(0, scale) (a1.py:131). */
  def gaussian(scale: Double): Double = nextGaussian() * scale

  /** Student-t(df, loc=0, scale) — scipy stats.t.rvs (a1.py:133-135).
    * t = Z / sqrt(chi2(df)/df), chi2(df) = Gamma(df/2, 2).
    */
  def studentT(df: Double, scale: Double): Double = {
    val z = nextGaussian()
    val chi2 = nextGamma(df / 2.0) * 2.0
    scale * z / math.sqrt(chi2 / df)
  }

  /** Laplace(0, scale) — np.random.laplace (b2.py:82), via inverse CDF. */
  def laplace(scale: Double): Double = {
    val u = nextDouble() - 0.5
    -scale * math.signum(u) * math.log1p(-2.0 * math.abs(u))
  }

  /** Marsaglia-Tsang gamma(shape, 1), shape >= 1 (df/2 = 1.5 for t(3)). */
  private def nextGamma(shape: Double): Double = {
    val d = shape - 1.0 / 3.0
    val c = 1.0 / math.sqrt(9.0 * d)
    while (true) {
      val z = nextGaussian()
      val v1 = 1.0 + c * z
      if (v1 > 0) {
        val v3 = v1 * v1 * v1
        val u = nextDouble()
        if (u < 1.0 - 0.0331 * z * z * z * z) return d * v3
        if (math.log(u) < 0.5 * z * z + d * (1.0 - v3 + math.log(v3))) return d * v3
      }
    }
    0.0 // unreachable
  }

  /** k distinct ints from [0, n) — np.random.choice(n, k, replace=False)
    * (d2.py:126), partial Fisher-Yates.
    */
  def choiceNoReplace(n: Int, k: Int): Array[Int] = {
    val idx = Array.tabulate(n)(identity)
    var i = 0
    while (i < k) {
      val j = i + nextInt(n - i)
      val tmp = idx(i); idx(i) = idx(j); idx(j) = tmp
      i += 1
    }
    java.util.Arrays.copyOfRange(idx, 0, k)
  }
}

object Rng {
  /** splitmix64 finalizer over (seed, streamId) for decorrelated streams. */
  def mix(seed: Long, streamId: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L * (streamId + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
