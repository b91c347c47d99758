package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Statistical-equivalence tests for the generation kernel (SURVEY §6.2-3):
  * fitted coefficients ≈ declared, quirk preservation, mask rates, timestamp
  * empirics. RNG bit-parity with NumPy is explicitly out of scope.
  */
class KernelSpec extends AnyFunSuite {

  private def cfg(family: String, v: Int = 4, lag: Int = 2, n: Int = 5000,
      noise: String = "gaussian", ratio: Double = 0.5,
      mcar: Double = 0.0, block: Double = 0.0, seed: Long = 42L): GenConfig = {
    val ts = Kernel.specs(family).trendSeason
    GenConfig(7L, family, v, lag, n, noise, 0.1, ratio, mcar, block,
      if (ts) 0.01 else 0.0, if (ts) 0.5 else 0.0, seed)
  }

  private def col(s: Series, j: Int): Array[Double] = s.x.map(_(j))
  private def mean(a: Array[Double]): Double = a.sum / a.length
  private def variance(a: Array[Double]): Double = {
    val m = mean(a); a.map(x => (x - m) * (x - m)).sum / a.length
  }
  private def cov(a: Array[Double], b: Array[Double]): Double = {
    val ma = mean(a); val mb = mean(b)
    a.indices.map(i => (a(i) - ma) * (b(i) - mb)).sum / a.length
  }
  /** OLS slope of y on x. */
  private def slope(x: Array[Double], y: Array[Double]): Double = cov(x, y) / variance(x)
  private def corr(a: Array[Double], b: Array[Double]): Double =
    cov(a, b) / math.sqrt(variance(a) * variance(b))

  test("determinism: same config generates identical series") {
    val c = cfg("D3C", 6, 3, 500, "mixed", mcar = 0.05, block = 0.05)
    val s1 = Kernel.generate(c)
    val s2 = Kernel.generate(c)
    assert(s1.x.flatten.toSeq == s2.x.flatten.toSeq)
    assert(s1.times.toSeq == s2.times.toSeq)
    assert(s1.mask.toSeq == s2.mask.toSeq)
    assert(s1.u.toSeq == s2.u.toSeq)
  }

  test("A1 4-var lag-2: fitted coefficients match declared equations") {
    val s = Kernel.generate(cfg("A1"))
    val drop = 2
    def c(j: Int) = col(s, j).drop(drop)
    // X1 = 0.4 * X2[t] + e1 (a1.py:28)
    assert(math.abs(slope(c(1), c(0)) - 0.4) < 0.05)
    // X3 = 0.35 * X4[t] + e3
    assert(math.abs(slope(c(3), c(2)) - 0.35) < 0.05)
    // X2 = 0.3 * X3[t-1] + e2
    val x3lag = col(s, 2).drop(drop - 1).dropRight(1)
    assert(math.abs(slope(x3lag, c(1)) - 0.3) < 0.05)
    // X4 = 0.25 * X1[t-2] + e4
    val x1lag2 = col(s, 0).dropRight(2).drop(0)
    assert(math.abs(slope(x1lag2.drop(0), col(s, 3).drop(2)) - 0.25) < 0.05)
  }

  test("A1 6-var: X6 reads zero-valued X5[t] (broken contemporaneous quirk §2.4-2)") {
    val s = Kernel.generate(cfg("A1", v = 6))
    assert(math.abs(corr(col(s, 5), col(s, 4))) < 0.05) // declared 0.85 edge, effectively 0
    // X6 is pure noise: std ≈ 0.1
    assert(math.abs(math.sqrt(variance(col(s, 5))) - 0.1) < 0.02)
  }

  test("A2 6-var: exogenous pre-pass keeps X5→X6 intact (no quirk)") {
    val s = Kernel.generate(cfg("A2", v = 6))
    assert(math.abs(slope(col(s, 4).drop(2), col(s, 5).drop(2)) - 0.85) < 0.1)
  }

  test("A2C: all-noise generation (empty link dict quirk)") {
    val s = Kernel.generate(cfg("A2C", v = 4))
    for (i <- 0 until 4; j <- 0 until i)
      assert(math.abs(corr(col(s, i), col(s, j))) < 0.05, s"corr X${i + 1},X${j + 1}")
    assert(math.abs(math.sqrt(variance(col(s, 0))) - 0.1) < 0.02)
  }

  test("D1 4-var: X1 and X3 exactly zero for t >= maxLag (two-pass shadow quirk)") {
    val s = Kernel.generate(cfg("D1", mcar = 0.1))
    val lag = 2
    assert(s.x.drop(lag).forall(r => r(0) == 0.0), "X1 must be exactly 0")
    assert(s.x.drop(lag).forall(r => r(2) == 0.0), "X3 must be exactly 0")
    // X2 and X4 are NOT zero
    assert(variance(col(s, 1).drop(lag)) > 1e-4)
    assert(variance(col(s, 3).drop(lag)) > 1e-4)
  }

  test("B2: quadratic-only response (cubic dropped) and mask-free") {
    val s = Kernel.generate(cfg("B2", noise = "mixed"))
    // X3 = 0.35 * X4^2 + e3: regress X3 on X4² — slope ≈ .35; on X4³ ≈ 0 extra
    val x4sq = col(s, 3).drop(2).map(x => x * x)
    assert(math.abs(slope(x4sq, col(s, 2).drop(2)) - 0.35) < 0.06)
    assert(s.mask.forall(_ == 0))
  }

  test("irregular timestamps: ends at 100, gaps match reference empirics (§2.4-4)") {
    val s = Kernel.generate(cfg("B2", n = 5000, noise = "mixed"))
    val t = s.times
    assert(math.abs(t.last - 100.0) < 1e-6)
    val gaps = t.sliding(2).map(p => p(1) - p(0)).toArray
    assert(math.abs(mean(gaps) - 0.02) < 0.001)
    assert(gaps.min < 0.01, "min_gap violated by prefix rescale")
    assert(t.sameElements(t.sorted))
  }

  test("MCAR mask rate ≈ p; U never masked") {
    val s = Kernel.generate(cfg("D1", v = 8, n = 5000, mcar = 0.2))
    val rate = s.mask.map(Integer.bitCount).sum.toDouble / (5000.0 * 8)
    assert(math.abs(rate - 0.2) < 0.01)
  }

  test("D3C block+mcar combined rate matches reference empirics (~26%)") {
    val s = Kernel.generate(cfg("D3C", v = 8, lag = 4, n = 5000, noise = "mixed",
      mcar = 0.05, block = 0.05))
    val rate = s.mask.map(Integer.bitCount).sum.toDouble / (5000.0 * 8)
    // BASELINE.md: 25.9% observed for these settings
    assert(rate > 0.18 && rate < 0.34, s"rate=$rate")
  }

  test("C1: matches reference empirics (trend-dominated explosive dynamics)") {
    // Reference c1.py, n=3000 vars=4 lag=2 seed=42 (measured in this env):
    //   X1 mean 2710.8 std 3076.2 | X2 mean 15.00 std 8.67
    //   X3 mean  442.3 std  388.3 | X4 mean 29.99 std 17.32
    val s = Kernel.generate(cfg("C1", n = 3000))
    def stats(j: Int) = { val c = col(s, j); (mean(c), math.sqrt(variance(c))) }
    val (m1, s1) = stats(0); val (m2, s2) = stats(1)
    val (m3, s3) = stats(2); val (m4, s4) = stats(3)
    assert(math.abs(m1 - 2710.8) / 2710.8 < 0.02, s"X1 mean $m1")
    assert(math.abs(s1 - 3076.2) / 3076.2 < 0.02, s"X1 std $s1")
    assert(math.abs(m2 - 15.0) < 0.5 && math.abs(s2 - 8.67) < 0.3)
    assert(math.abs(m3 - 442.3) / 442.3 < 0.02 && math.abs(s3 - 388.3) / 388.3 < 0.02)
    assert(math.abs(m4 - 30.0) < 0.5 && math.abs(s4 - 17.32) < 0.5)
  }

  test("A2/A2C student-t noise is frozen (scipy re-seed quirk): degenerate series") {
    // shipped A2C-t columns have exactly ONE distinct value; A2-t ~17
    val a2c = Kernel.generate(cfg("A2C", v = 4, n = 2000, noise = "student_t"))
    for (j <- 0 until 4)
      assert(a2c.x.drop(2).map(_(j)).distinct.length == 1, s"A2C-t X${j + 1} must be constant")
    val a2 = Kernel.generate(cfg("A2", v = 4, n = 2000, noise = "student_t"))
    for (j <- 0 until 4)
      assert(a2.x.map(_(j)).distinct.length < 40, s"A2-t X${j + 1} must be near-degenerate")
    // gaussian path unaffected
    val g = Kernel.generate(cfg("A2", v = 4, n = 2000, noise = "gaussian"))
    assert(g.x.map(_(0)).distinct.length > 1900)
  }

  test("student-t noise has heavier tails than gaussian (D1's X2 is pure noise)") {
    // A2/A2C/B1/B1C t-noise is frozen by the scipy re-seed quirk, so measure
    // tails on D1 whose X2 = 0.3·X3[t-1] + e2 with X3 ≡ 0 (shadow quirk)
    val g = Kernel.generate(cfg("D1", n = 5000, noise = "gaussian"))
    val t = Kernel.generate(cfg("D1", n = 5000, noise = "student_t", seed = 43L))
    def kurt(a: Array[Double]): Double = {
      val m = mean(a); val v = variance(a)
      a.map(x => math.pow(x - m, 4)).sum / a.length / (v * v)
    }
    assert(kurt(col(g, 1)) < 4.0)
    assert(kurt(col(t, 1)) > 5.0)
  }

  test("irregular timestamps: lazy O(n) rescale tracks the eager reference " +
      "loop element-for-element past the catalog range") {
    // same seeded stream → identical draw sequence; the lazy fold differs
    // from per-element eager rescaling only in rounding order
    val n = 20000
    val eager = Kernel.irregularTimestampsEager(n, new graft.core.Rng(42L, 7L))
    val lazi = Kernel.irregularTimestampsLazy(n, new graft.core.Rng(42L, 7L))
    assert(eager.length == n && lazi.length == n)
    var maxRel = 0.0
    var i = 0
    while (i < n) {
      val d = math.abs(eager(i) - lazi(i)) /
        math.max(1e-12, math.abs(eager(i)))
      if (d > maxRel) maxRel = d
      i += 1
    }
    assert(maxRel < 1e-9, s"lazy deviates: maxRel=$maxRel")
    // invariants both paths promise: sorted, bounded by TotalTime
    (1 until n).foreach(i => assert(lazi(i) >= lazi(i - 1) - 1e-12))
    assert(lazi.last <= 100.0 + 1e-9 && eager.last <= 100.0 + 1e-9)
    // the catalog range itself always takes the eager path bit-for-bit
    val small = Kernel.irregularTimestampsEager(5000, new graft.core.Rng(1L, 2L))
    assert(small.length == 5000)
  }

  test("rows emission: wide schema with nulls beyond nVars, U populated only for C-variants") {
    val rows = Kernel.rows(cfg("A1C", v = 6, n = 100)).toVector
    assert(rows.size == 100)
    assert(rows.forall(r => r.x6.isDefined && r.x7.isEmpty && r.x8.isEmpty))
    assert(rows.forall(_.u.isDefined))
    val rows2 = Kernel.rows(cfg("A1", v = 4, n = 50)).toVector
    assert(rows2.forall(r => r.u.isEmpty && r.x5.isEmpty))
    assert(rows2.map(_.time) == (0 until 50).map(_.toDouble))
  }
}
