package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** SURVEY §2.4's optional "fixed" mode: strict=true corrects EXACTLY three
  * quirks — cubic terms kept (§2.4-1, b2.py:160-194), contemporaneous links
  * resolved (§2.4-2, a1.py:147,177-184), true min-gap timestamps (§2.4-4,
  * a2.py:146-160) — and nothing else. The tests pin both directions:
  * configs touched by a quirk must change, configs untouched must stay
  * BITWISE identical to compat mode.
  */
class StrictModeSpec extends AnyFunSuite {

  private def cfg(family: String, v: Int = 6, lag: Int = 2, n: Int = 1000) =
    Grid.forFamily(family).find(c =>
      c.nPoints == n && c.nVars == v && c.maxLag == lag &&
        (c.noiseType == "gaussian" || c.noiseType == "mixed")).get

  test("quirk 1: strict parser keeps exactly the declared cubic terms (B2 4-var lag-2)") {
    val compat = Parser.truthLinks("B2", 4, 2).map(l => (l.source, l.lag, l.target)).toSet
    val strict = Parser.strictLinks("B2", 4, 2)
    val cubics = strict.filter(_.power == 3)
    // SURVEY §2.4-1: every quadratic edge declares a matching cubic sub-term
    // with a negative coefficient; the compat extractor drops all of them
    assert(cubics.nonEmpty, "strict must surface the dropped cubic terms")
    assert(cubics.forall(_.coef < 0), s"declared cubics are minus-signed: $cubics")
    assert(cubics.map(c => (c.source, c.lag, c.target)).toSet.subsetOf(compat),
      "each cubic rides an edge the quadratic already declares")
    // and the quadratic terms themselves agree with the compat extraction
    val quad = strict.filter(_.power == 2).map(c => (c.source, c.lag, c.target)).toSet
    assert(quad == compat, s"strict quadratics $quad vs compat $compat")
  }

  test("quirk 1: cubic terms change generated B1 data (regular sampling isolates it)") {
    val c = cfg("B1", v = 4) // 4-var: no contemporaneous zero-read; regular: no timestamps
    val a = Kernel.generate(c, strict = false)
    val b = Kernel.generate(c, strict = true)
    assert(a.times.sameElements(b.times), "regular timestamps identical")
    val nDiff = (0 until c.nPoints).count(t => a.x(t).toSeq != b.x(t).toSeq)
    assert(nDiff > 0, "kept cubic terms must change the values")
    // rows before the recurrence starts are pure noise — identical draws
    (0 until c.maxLag).foreach(t => assert(a.x(t).toSeq == b.x(t).toSeq))
  }

  test("quirk 2: strict resolves X5->X6 (compat reads zero; declared slope recovers)") {
    val c = cfg("A1") // 6-var: X6[t] = 0.85*X5[t] + e6 declared, zero-read in compat
    def slope(s: Series): Double = {
      val n = c.nPoints
      val xs = (c.maxLag until n).map(t => s.x(t)(4))
      val ys = (c.maxLag until n).map(t => s.x(t)(5))
      val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
      val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = xs.map(a => (a - mx) * (a - mx)).sum
      cov / vx
    }
    val compat = slope(Kernel.generate(c, strict = false))
    val strict = slope(Kernel.generate(c, strict = true))
    assert(math.abs(compat) < 0.15, s"compat X6 ignores X5 (slope $compat)")
    assert(math.abs(strict - 0.85) < 0.15, s"strict recovers the declared 0.85 (got $strict)")
  }

  test("quirk 4: strict timestamps honor min-gap up to feasibility, end at 100") {
    for (n <- Seq(500, 1000, 5000)) {
      val c = cfg("A2", v = 4, n = n)
      val s = Kernel.generate(c, strict = true)
      val gaps = (1 until n).map(t => s.times(t) - s.times(t - 1))
      val g = math.min(0.1, 100.0 / n)
      assert(gaps.min >= g - 1e-9, s"n=$n strict min gap ${gaps.min} < $g")
      assert(math.abs(s.times(n - 1) - 100.0) < 1e-9)
      // compat at n=5000 violates the declared floor (measured §2.4-4)
      if (n == 5000) {
        val compatGaps = {
          val sc = Kernel.generate(c, strict = false)
          (1 until n).map(t => sc.times(t) - sc.times(t - 1))
        }
        assert(compatGaps.min < g, "compat must keep its documented violation")
      }
    }
  }

  test("strict composes in the maximal family (D3C: min-gap, masks, U) — q374's cell") {
    // the q374 oracle row's config: every mechanism at once — mixed noise,
    // irregular sampling, MCAR∪block, U²
    val c = Grid.forFamily("D3C").find(c =>
      c.nPoints == 1000 && c.nVars == 6 && c.maxLag == 2 &&
        c.mixRatio == 0.5 && c.mcarProb == 0.1 && c.blockProb == 0.1).get
    val s = Kernel.generate(c, strict = true)
    val n = c.nPoints
    // strict correction 3 survives the composition: honest min-gap, end at 100
    val gaps = (1 until n).map(t => s.times(t) - s.times(t - 1))
    val g = math.min(0.1, 100.0 / n)
    assert(gaps.min >= g - 1e-9, s"strict D3C min gap ${gaps.min} < $g")
    assert(math.abs(s.times(n - 1) - 100.0) < 1e-9)
    // masks still apply (MCAR .1 ∪ block .1 over 6 vars) and U is never masked
    val cellRate = (0 until n).map(t =>
      java.lang.Integer.bitCount(s.mask(t))).sum.toDouble / (6.0 * n)
    assert(cellRate > 0.15 && cellRate < 0.40, s"mask cell rate $cellRate")
    assert(s.mask.forall(m => (m & ~0x3f) == 0), "mask bits beyond the 6 X vars")
    assert(s.u.forall(v => !v.isNaN), "U must stay fully observed")
    // strict values genuinely diverge from compat in this family (cubic
    // retention + contemporaneous resolution both fire)
    val comp = Kernel.generate(c, strict = false)
    assert((0 until n).exists(t => s.x(t)(0) != comp.x(t)(0)),
      "strict D3C must change X1 values vs compat")
  }

  test("nothing else: untouched configs generate bitwise identically") {
    // A1C (native toposort), D1/D1C (shadowing preserved), A1 4-var (chain
    // already resolves in reverse order) — none touched by the three fixes
    for (c <- Seq(cfg("A1C"), cfg("D1"), cfg("D1C"), cfg("A1", v = 4))) {
      val a = Kernel.generate(c, strict = false)
      val b = Kernel.generate(c, strict = true)
      assert(a.times.sameElements(b.times), s"${c.family}: times must match")
      (0 until c.nPoints).foreach { t =>
        assert(a.x(t).sameElements(b.x(t)), s"${c.family} t=$t values must match")
        }
      assert(a.u.sameElements(b.u) && a.mask.sameElements(b.mask))
    }
  }
}
