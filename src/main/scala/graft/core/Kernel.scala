package graft.core

import scala.collection.mutable
import Parser.{Func, GTerm, GenEq, GenProgram, Strategy}

/** Sequential per-series generation kernel (SURVEY §3.2 G3-G13).
  *
  * Inherently sequential in t (the recurrence reads its own past) — so this is
  * a black-box JVM kernel invoked once per GenConfig; Spark parallelizes across
  * the config grid, not within a series (SURVEY §5.2). All per-variant
  * evaluation-order quirks (§2.4) are reproduced:
  *  - zero-valued contemporaneous reads in 6/8-var reverse/list-order families
  *  - D1/D1C two-pass var_name shadowing → X1/X3 exactly 0 for t ≥ maxLag
  *  - A2's `value != 0` conditional noise; A2C's all-noise generation
  *  - C2C/D3C linear-U dead-branch; B-family cubic-term drop (via Parser)
  *  - irregular timestamps with prefix-rescale (min_gap violated, §2.4-4)
  *  - nearest-to-target lag resolution (can pick a LATER-than-target point)
  */
object Kernel {

  final case class FamilySpec(
      irregular: Boolean,
      trendSeason: Boolean,
      continuousSeason: Boolean, // τ = timestamp (c2.py:102-108) vs integer index (c1.py:132-141)
      hasU: Boolean,
      mcar: Boolean,
      block: Boolean)

  val specs: Map[String, FamilySpec] = Map(
    "A1"  -> FamilySpec(irregular = false, trendSeason = false, continuousSeason = false, hasU = false, mcar = false, block = false),
    "A1C" -> FamilySpec(irregular = false, trendSeason = false, continuousSeason = false, hasU = true,  mcar = false, block = false),
    "A2"  -> FamilySpec(irregular = true,  trendSeason = false, continuousSeason = false, hasU = false, mcar = false, block = false),
    "A2C" -> FamilySpec(irregular = true,  trendSeason = false, continuousSeason = false, hasU = true,  mcar = false, block = false),
    "B1"  -> FamilySpec(irregular = false, trendSeason = false, continuousSeason = false, hasU = false, mcar = false, block = false),
    "B1C" -> FamilySpec(irregular = false, trendSeason = false, continuousSeason = false, hasU = true,  mcar = false, block = false),
    "B2"  -> FamilySpec(irregular = true,  trendSeason = false, continuousSeason = false, hasU = false, mcar = false, block = false),
    "B2C" -> FamilySpec(irregular = true,  trendSeason = false, continuousSeason = false, hasU = true,  mcar = false, block = false),
    "C1"  -> FamilySpec(irregular = false, trendSeason = true,  continuousSeason = false, hasU = false, mcar = false, block = false),
    "C1C" -> FamilySpec(irregular = false, trendSeason = true,  continuousSeason = false, hasU = true,  mcar = false, block = false),
    "C2"  -> FamilySpec(irregular = true,  trendSeason = true,  continuousSeason = true,  hasU = false, mcar = false, block = false),
    "C2C" -> FamilySpec(irregular = true,  trendSeason = true,  continuousSeason = true,  hasU = true,  mcar = false, block = false),
    "D1"  -> FamilySpec(irregular = false, trendSeason = false, continuousSeason = false, hasU = false, mcar = true,  block = false),
    "D1C" -> FamilySpec(irregular = false, trendSeason = false, continuousSeason = false, hasU = true,  mcar = true,  block = false),
    "D2"  -> FamilySpec(irregular = true,  trendSeason = false, continuousSeason = false, hasU = false, mcar = false, block = true),
    "D2C" -> FamilySpec(irregular = true,  trendSeason = false, continuousSeason = false, hasU = true,  mcar = false, block = true),
    "D3"  -> FamilySpec(irregular = true,  trendSeason = true,  continuousSeason = true,  hasU = false, mcar = true,  block = true),
    "D3C" -> FamilySpec(irregular = true,  trendSeason = true,  continuousSeason = true,  hasU = true,  mcar = true,  block = true))

  private val TotalTime = 100.0
  private val MinGap = 0.1
  private val SeasonPeriod = 12.0
  private val BlockSizeLo = 5
  private val BlockSizeHi = 20 // np.random.randint(5, 20) → [5, 20)
  private val TDf = 3.0

  def generate(cfg: GenConfig): Series = generate(cfg, strict = false)

  /** `strict = true` is SURVEY §2.4's optional corrected mode: exactly three
    * behaviors change — cubic terms are kept (§2.4-1), contemporaneous links
    * resolve in dependency order instead of reading zero (§2.4-2), and
    * irregular timestamps honor the declared min-gap up to feasibility
    * (§2.4-4). Every other quirk (D1 shadowing, A2's value≠0 noise rule,
    * A2C's empty links, frozen-t, the U-power dead branch) is preserved, so
    * configs untouched by those three quirks generate BITWISE identically in
    * both modes (proven in StrictModeSpec).
    */
  def generate(cfg: GenConfig, strict: Boolean): Series = {
    val spec = specs(cfg.family)
    val prog =
      if (strict) Parser.compileGenStrict(cfg.family, cfg.nVars, cfg.maxLag)
      else Parser.compileGen(cfg.family, cfg.nVars, cfg.maxLag)
    val rng = new Rng(cfg.seed, cfg.configId)
    val n = cfg.nPoints
    val v = cfg.nVars

    // A2/A2C/B1/B1C pass an INT random_state into stats.t.rvs, which re-seeds
    // scipy on EVERY call — so every student-t noise draw returns the same
    // vector and the recurrence collapses to a fixed point (shipped t-dist
    // CSVs for these families are near-constant: A2C-t columns have exactly
    // one distinct value; verified empirically). Reproduce with a frozen
    // per-series noise vector.
    val frozenT = cfg.noiseType == "student_t" &&
      Set("A2", "A2C", "B1", "B1C").contains(cfg.family)
    val frozenNoise: Array[Double] =
      if (frozenT) Array.fill(cfg.nVars + 1)(rng.studentT(TDf, cfg.noiseScale))
      else null

    def noiseDraw(): Double =
      if (frozenT) frozenNoise(0)
      else cfg.noiseType match {
        case "gaussian" => rng.gaussian(cfg.noiseScale)
        case "student_t" => rng.studentT(TDf, cfg.noiseScale)
        case "mixed" =>
          if (rng.nextDouble() < cfg.mixRatio) rng.gaussian(cfg.noiseScale)
          else rng.laplace(cfg.noiseScale)
        case other => throw new IllegalArgumentException(s"noise $other")
      }
    def noiseVec(k: Int): Array[Double] =
      if (frozenT) java.util.Arrays.copyOfRange(frozenNoise, 0, k)
      else Array.fill(k)(noiseDraw())

    // -- timestamps (G9) --
    val times: Array[Double] =
      if (!spec.irregular) Array.tabulate(n)(_.toDouble)
      else if (strict) strictIrregularTimestamps(n, rng)
      else irregularTimestamps(n, rng)

    // -- trend & seasonality precompute (G7, G8) --
    val trend: Array[Array[Double]] =
      if (!spec.trendSeason) null
      else Array.tabulate(v, n)((i, t) => cfg.trendStrength * (i + 1) * 0.5 * t)
    val season: Array[Array[Double]] =
      if (!spec.trendSeason) null
      else Array.tabulate(v, n) { (i, t) =>
        val tau = if (spec.continuousSeason) times(t) else t.toDouble
        val phase = 2.0 * math.Pi * i / 8.0
        cfg.seasonalStrength * (math.sin(2.0 * math.Pi * tau / SeasonPeriod + phase)
          + 0.5 * math.cos(4.0 * math.Pi * tau / SeasonPeriod + phase))
      }

    val x = Array.ofDim[Double](n, v)
    val u = if (spec.hasU) new Array[Double](n) else Array.emptyDoubleArray

    // -- init rows 0..maxLag-1 (§2.4-6) --
    var i = 0
    while (i < cfg.maxLag) {
      val nv = noiseVec(v)
      var j = 0
      while (j < v) {
        x(i)(j) = nv(j) + (if (spec.trendSeason) trend(j)(i) + season(j)(i) else 0.0)
        j += 1
      }
      if (spec.hasU) u(i) = noiseDraw()
      i += 1
    }

    // mean_diff is constant across the loop (timestamps fixed before recurrence);
    // reference recomputes it per t (a2.py:221) — hoisted here, same value.
    val meanDiff = if (n > 1) (times(n - 1) - times(0)) / (n - 1) else 0.0
    val lagIdx = new Array[Int](cfg.maxLag)

    // -- recurrence (G5) --
    var t = cfg.maxLag
    while (t < n) {
      if (spec.irregular) {
        var k = 1
        while (k <= cfg.maxLag) {
          lagIdx(k - 1) = nearestLagIdx(times, t, k * meanDiff)
          k += 1
        }
      } else {
        var k = 1
        while (k <= cfg.maxLag) { lagIdx(k - 1) = t - k; k += 1 }
      }
      step(prog, spec, cfg, x, u, trend, season, t, lagIdx, noiseVec, noiseDraw,
        strict)
      t += 1
    }

    // -- missingness masks (G11, G12) — X only, U never masked (§2.4-7) --
    val mask = new Array[Int](n)
    if (spec.mcar && spec.block) {
      // D3: MCAR matrix first, then block scan, OR-combined (d3.py:97-125)
      applyMcar(mask, n, v, cfg.mcarProb, rng)
      applyBlock(mask, n, v, cfg.blockProb, rng)
    } else if (spec.mcar) {
      applyMcar(mask, n, v, cfg.mcarProb, rng)
    } else if (spec.block) {
      applyBlock(mask, n, v, cfg.blockProb, rng)
    }

    Series(cfg, times, x, u, mask)
  }

  /** Exponential-gap scan with clamp + whole-prefix rescale (a2.py:146-160).
    * min_gap is NOT actually guaranteed (§2.4-4).
    *
    * The reference loop (numpy `times = times * scale` per overflow) is
    * O(n²) once MinGap·n > TotalTime — every step past ~T/MinGap rows
    * triggers a whole-prefix rescale (37-84 s per 500k-point config,
    * measured). n ≤ 5000 covers the ENTIRE reference catalog, so every
    * bitwise-gated artifact keeps the exact eager loop; above it (engine
    * scale-ladder territory the reference never reaches) the same
    * recurrence runs with the prefix rescales folded into one running
    * multiplier — algebraically identical, O(n) (amortized renorm keeps
    * the factor inside double range), differing only in ulp-level
    * rounding of values nothing gates. KernelSpec pins closeness and the
    * invariants (sorted, ≤ TotalTime, identical RNG draw sequence).
    */
  private val EagerRescaleMaxN = 5000

  private def irregularTimestamps(n: Int, rng: Rng): Array[Double] =
    if (n <= EagerRescaleMaxN) irregularTimestampsEager(n, rng)
    else irregularTimestampsLazy(n, rng)

  private[graft] def irregularTimestampsEager(n: Int, rng: Rng): Array[Double] = {
    {
      val times = new Array[Double](n)
      times(0) = rng.nextDouble() * MinGap
      var i = 1
      while (i < n) {
        val gap = rng.nextExponential() * ((TotalTime - times(i - 1)) / (n - i))
        times(i) = times(i - 1) + math.max(gap, MinGap)
        if (times(i) > TotalTime) {
          val scale = TotalTime / times(i)
          var j = 0
          while (j <= i) { times(j) *= scale; j += 1 }
        }
        i += 1
      }
      times
    }
  }

  private[graft] def irregularTimestampsLazy(n: Int, rng: Rng): Array[Double] = {
    {
      // raw(j)·m == times(j) at every step; a rescale multiplies m only.
      // m decays ~e^(−MinGap/T) per clamped step, so fold it back into
      // raw (and reset to 1) before it can leave double range — ~every
      // 230k rows, amortized O(n)
      val raw = new Array[Double](n)
      var m = 1.0
      raw(0) = rng.nextDouble() * MinGap
      var i = 1
      while (i < n) {
        val prev = raw(i - 1) * m
        val gap = rng.nextExponential() * ((TotalTime - prev) / (n - i))
        var ti = prev + math.max(gap, MinGap)
        if (ti > TotalTime) {
          val scale = TotalTime / ti
          m *= scale
          ti *= scale
        }
        raw(i) = ti / m
        if (m < 1e-100) {
          var j = 0
          while (j <= i) { raw(j) *= m; j += 1 }
          m = 1.0
        }
        i += 1
      }
      var j = 0
      while (j < n) { raw(j) *= m; j += 1 }
      raw
    }
  }

  /** Strict-mode irregular timestamps: the DECLARED constraint honored up to
    * feasibility — every gap is at least g = min(0.1, totalTime/n) (the
    * declared 0.1 is infeasible for n ≥ 1000 within totalTime = 100), and the
    * remaining budget splits across gaps proportionally to exponential draws,
    * so the final time is exactly totalTime and no prefix rescale ever
    * violates the floor (the §2.4-4 compat quirk).
    */
  private def strictIrregularTimestamps(n: Int, rng: Rng): Array[Double] = {
    val times = new Array[Double](n)
    val g = math.min(MinGap, TotalTime / n)
    times(0) = rng.nextDouble() * g
    if (n == 1) return times
    val e = Array.fill(n - 1)(rng.nextExponential())
    val eSum = e.sum
    val budget = TotalTime - times(0) - g * (n - 1)
    var i = 1
    while (i < n) {
      times(i) = times(i - 1) + g + e(i - 1) / eSum * budget
      i += 1
    }
    times(n - 1) = TotalTime // close the telescoping sum exactly
    times
  }

  /** argmin |t_past − (t_now − lagTime)| over past points (a2.py:162-167).
    * Binary search (O(log n) vs reference's linear scan — same result;
    * np.argmin tie → first/lower index).
    */
  private def nearestLagIdx(times: Array[Double], currentIdx: Int, lagTime: Double): Int = {
    if (currentIdx == 0) return 0
    val target = times(currentIdx) - lagTime
    var lo = 0
    var hi = currentIdx // exclusive
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (times(mid) < target) lo = mid + 1 else hi = mid
    }
    // candidates lo-1 and lo (clamped); ties → lower index
    if (lo == 0) 0
    else if (lo >= currentIdx) currentIdx - 1
    else if (math.abs(times(lo - 1) - target) <= math.abs(times(lo) - target)) lo - 1
    else lo
  }

  private def applyMcar(mask: Array[Int], n: Int, v: Int, p: Double, rng: Rng): Unit = {
    var t = 0
    while (t < n) {
      var j = 0
      while (j < v) {
        if (rng.nextDouble() < p) mask(t) |= (1 << j)
        j += 1
      }
      t += 1
    }
  }

  /** Stateful block scan (d2.py:112-138): per-t start Bernoulli, length
    * randint(5,20), uniform random var subset, countdown suppresses new starts.
    */
  private def applyBlock(mask: Array[Int], n: Int, v: Int, p: Double, rng: Rng): Unit = {
    var currentBlock = false
    var remaining = 0
    var t = 0
    while (t < n) {
      if (!currentBlock && rng.nextDouble() < p) {
        currentBlock = true
        remaining = rng.nextInt(BlockSizeLo, BlockSizeHi)
        val nAffected = rng.nextInt(1, v + 1)
        val affected = rng.choiceNoReplace(v, nAffected)
        var bits = 0
        affected.foreach(j => bits |= (1 << j))
        var k = 0
        while (k < remaining && t + k < n) { mask(t + k) |= bits; k += 1 }
      }
      if (currentBlock) {
        remaining -= 1
        if (remaining <= 0) currentBlock = false
      }
      t += 1
    }
  }

  // ---------------------------------------------------------------------------
  // per-timestep structural update (G4), one branch per ordering strategy
  // ---------------------------------------------------------------------------

  private def step(prog: GenProgram, spec: FamilySpec, cfg: GenConfig,
      x: Array[Array[Double]], u: Array[Double],
      trend: Array[Array[Double]], season: Array[Array[Double]],
      t: Int, lagIdx: Array[Int],
      noiseVec: Int => Array[Double], noiseDraw: () => Double,
      strict: Boolean = false): Unit = {
    val v = cfg.nVars

    def depValue(d: GTerm.Dep): Double = {
      val base =
        if (d.isU) u(t)
        else if (d.lag == 0) x(t)(d.srcIdx)
        else if (spec.irregular) x(lagIdx(d.lag - 1))(d.srcIdx)
        else x(t - d.lag)(d.srcIdx)
      d.func match {
        case Func.Linear => d.coef * base
        case Func.Cos => d.coef * math.cos(base * math.Pi / 2.0)
        case Func.Sin => d.coef * math.sin(base * math.Pi / 2.0)
        case Func.Pow => d.coef * math.pow(base, d.pow)
      }
    }

    // strict §2.4-2 fix: evaluate in contemporaneous-dependency order (retry
    // queue, like A1C's native ToposortRetry) so no zero-initialized cell is
    // ever read. The noise layout and per-term arithmetic are the compat
    // ones — ONLY the evaluation order changes. The guard breaks a (never
    // observed) contemporaneous cycle by falling back to compat zero-reads.
    def resolveOrder(order: Seq[Int], contempDeps: Int => Seq[Int],
        eval: Int => Unit): Unit = {
      val computed = mutable.BitSet.empty
      val queue = mutable.Queue.empty[Int]
      order.foreach(queue += _)
      var guard = 0
      while (queue.nonEmpty) {
        val i = queue.dequeue()
        guard += 1
        val ready = guard > 10 * v * v ||
          contempDeps(i).forall(computed.contains)
        if (!ready) queue += i
        else { eval(i); computed += i }
      }
    }

    prog.strategy match {
      case Strategy.LinkReverse if strict =>
        val noise = noiseVec(if (spec.hasU) v + 1 else v)
        if (spec.hasU) u(t) = noise(noise.length - 1)
        resolveOrder((v - 1) to 0 by -1,
          i => prog.byVar(i).collect { case d if !d.isU && d.lag == 0 => d.srcIdx },
          { i =>
            var value = 0.0
            prog.byVar(i).foreach(d => value += depValue(d))
            x(t)(i) = value + noise(i)
          })

      case Strategy.LinkReverse =>
        // b2.py:109-132: reverse index order; X[t,i] = Σ links + noise[i]
        val noise = noiseVec(if (spec.hasU) v + 1 else v)
        if (spec.hasU) u(t) = noise(noise.length - 1)
        var i = v - 1
        while (i >= 0) {
          var value = 0.0
          prog.byVar(i).foreach(d => value += depValue(d))
          x(t)(i) = value + noise(i)
          i -= 1
        }

      case Strategy.LinkPrePass =>
        // a2.py:169-201: exogenous pre-pass, then reverse loop, noise iff value≠0
        val noise = noiseVec(if (spec.hasU) v + 1 else v)
        if (spec.hasU) u(t) = noise(noise.length - 1)
        var i = 0
        while (i < v) {
          if (!prog.linkTargets.contains(i)) x(t)(i) = noise(i)
          i += 1
        }
        i = v - 1
        while (i >= 0) {
          var value = 0.0
          prog.byVar(i).foreach(d => value += depValue(d))
          if (value != 0.0) x(t)(i) = value + noise(i)
          i -= 1
        }

      case Strategy.EqReverse if strict =>
        val noise = noiseVec(v)
        def eqDeps(i: Int): Seq[Int] =
          prog.eqs.find(_.targetIdx == i).toSeq.flatMap(_.terms.collect {
            case d: GTerm.Dep if !d.isU && d.lag == 0 => d.srcIdx
          })
        resolveOrder((v - 1) to 0 by -1, eqDeps, { i =>
          prog.eqs.find(_.targetIdx == i).foreach { eq =>
            var value = 0.0
            eq.terms.foreach {
              case GTerm.Noise => value += noise(i)
              case d: GTerm.Dep => value += depValue(d)
              case _ => ()
            }
            x(t)(i) = value
          }
        })

      case Strategy.EqReverse =>
        // a1.py:147-192: reverse index, contemporaneous falls back to the
        // zero-initialized X[t] cell (§2.4-2)
        val noise = noiseVec(v)
        var i = v - 1
        while (i >= 0) {
          prog.eqs.find(_.targetIdx == i).foreach { eq =>
            var value = 0.0
            eq.terms.foreach {
              case GTerm.Noise => value += noise(i)
              case d: GTerm.Dep => value += depValue(d)
              case _ => ()
            }
            x(t)(i) = value
          }
          i -= 1
        }

      case Strategy.ListOrder if strict =>
        val noise = noiseVec(if (spec.hasU) v + 1 else v)
        if (spec.hasU) u(t) = noise(noise.length - 1)
        def evalEq(k: Int): Unit = {
          val eq = prog.eqs(k)
          var value = 0.0
          eq.terms.foreach {
            case GTerm.Noise => value += noise(eq.targetIdx)
            case GTerm.Trend => value += trend(eq.targetIdx)(t)
            case GTerm.Season => value += season(eq.targetIdx)(t)
            case d: GTerm.Dep => value += depValue(d)
          }
          x(t)(eq.targetIdx) = value
        }
        // queue over equation positions; readiness tracked on target var idx
        val targetOf = prog.eqs.map(_.targetIdx)
        val computedVars = mutable.BitSet.empty
        val queue = mutable.Queue.empty[Int]
        prog.eqs.indices.foreach(queue += _)
        var guard = 0
        while (queue.nonEmpty) {
          val k = queue.dequeue()
          guard += 1
          val deps = prog.eqs(k).terms.collect {
            case d: GTerm.Dep if !d.isU && d.lag == 0 => d.srcIdx
          }
          if (guard <= 10 * v * v && !deps.forall(computedVars.contains)) queue += k
          else { evalEq(k); computedVars += targetOf(k) }
        }

      case Strategy.ListOrder =>
        // c1.py:196-222 / d3c.py:333-363: equation-list order; contemporaneous
        // reads the current X[t] cell (zero if not yet computed)
        val noise = noiseVec(if (spec.hasU) v + 1 else v)
        if (spec.hasU) u(t) = noise(noise.length - 1)
        prog.eqs.foreach { eq =>
          var value = 0.0
          eq.terms.foreach {
            case GTerm.Noise => value += noise(eq.targetIdx)
            case GTerm.Trend => value += trend(eq.targetIdx)(t)
            case GTerm.Season => value += season(eq.targetIdx)(t)
            case d: GTerm.Dep => value += depValue(d)
          }
          x(t)(eq.targetIdx) = value
        }

      case Strategy.TwoPassShadow =>
        // d1.py:136-204: pass 1 = lag-only equations, recording the LAST dep
        // term's SOURCE name in var_values (shadowing quirk); pass 2 skips any
        // equation whose target name was (bogusly) recorded → those vars stay 0.
        val noise = noiseVec(if (spec.hasU) v + 1 else v)
        val vv = mutable.HashMap.empty[String, Double]
        if (spec.hasU) { u(t) = noise(noise.length - 1); vv("U") = u(t) }
        prog.eqs.foreach { eq =>
          if (eq.pass1Eligible) {
            var value = 0.0
            eq.terms.foreach {
              case GTerm.Noise => value += noise(eq.targetIdx)
              case d: GTerm.Dep => value += depValue(d)
              case _ => ()
            }
            x(t)(eq.targetIdx) = value
            vv(eq.shadowName) = value
          }
        }
        prog.eqs.foreach { eq =>
          if (!eq.pass1Eligible && !vv.contains(eq.targetName)) {
            var value = 0.0
            eq.terms.foreach {
              case GTerm.Noise => value += noise(eq.targetIdx)
              case d: GTerm.Dep if d.isU => value += d.coef * u(t)
              case d: GTerm.Dep if d.lag == 0 =>
                value += d.coef * vv.getOrElse(d.srcName, x(t)(d.srcIdx))
              case d: GTerm.Dep => value += depValue(d)
              case _ => ()
            }
            x(t)(eq.targetIdx) = value
            vv(eq.targetName) = value
          }
        }

      case Strategy.ToposortRetry =>
        // a1c.py:160-253: U first, X5 exogenous pre-pass (6/8-var), then a
        // retry queue that defers equations whose contemporaneous deps aren't
        // computed yet — so A1C does NOT exhibit the zero-read quirk.
        val noise = noiseVec(v + 1)
        u(t) = noise(v)
        val vv = mutable.HashMap.empty[String, Double]
        vv("U") = u(t)
        val processed = mutable.BitSet.empty
        if (v >= 6) {
          x(t)(4) = noise(4)
          vv("X5") = noise(4)
          processed += 4
        }
        val queue = mutable.Queue.empty[Int]
        (v - 1) to 0 by -1 foreach (queue += _)
        var guard = 0
        while (queue.nonEmpty && guard < 10 * v * v) {
          guard += 1
          val i = queue.dequeue()
          if (!processed.contains(i)) {
            prog.eqs.find(_.targetIdx == i) match {
              case None => processed += i
              case Some(eq) =>
                val ready = eq.terms.forall {
                  case d: GTerm.Dep if !d.isU && d.lag == 0 => vv.contains(d.srcName)
                  case _ => true
                }
                if (!ready) queue += i
                else {
                  var value = 0.0
                  eq.terms.foreach {
                    case GTerm.Noise => value += noise(i)
                    case d: GTerm.Dep if d.isU => value += d.coef * u(t)
                    case d: GTerm.Dep if d.lag == 0 =>
                      value += d.coef * vv.getOrElse(d.srcName, x(t)(d.srcIdx))
                    case d: GTerm.Dep => value += depValue(d)
                    case _ => ()
                  }
                  x(t)(i) = value
                  vv(eq.targetName) = value
                  processed += i
                }
            }
          }
        }
    }
  }

  /** Emit wide rows for a generated series (the Spark flatMap payload). */
  def rows(cfg: GenConfig): Iterator[SeriesRow] = {
    val s = generate(cfg)
    val spec = specs(cfg.family)
    val v = cfg.nVars
    (0 until cfg.nPoints).iterator.map { t =>
      def cell(j: Int): Option[Double] = if (j < v) Some(s.x(t)(j)) else None
      SeriesRow(
        cfg.configId, cfg.family, v, cfg.maxLag, cfg.nPoints,
        t.toLong, s.times(t),
        cell(0), cell(1), cell(2), cell(3), cell(4), cell(5), cell(6), cell(7),
        if (spec.hasU) Some(s.u(t)) else None,
        s.mask(t))
    }
  }
}
