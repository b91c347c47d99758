package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Distributional cross-validation of the kernel against the reference
  * generators themselves: per-column mean/std/missing-fraction at n=5000,
  * maxLag=2, seed=42 for every family × nVars (fixture: RefStats, produced by
  * tools/ref_stats.py running the actual reference code).
  */
class RefStatsSpec extends AnyFunSuite {

  private val n = 5000

  private def cfgFor(fam: String, v: Int, lag: Int): GenConfig = {
    val (noise, ratio) = fam match {
      case "B2" | "B2C" | "D3" | "D3C" => ("mixed", 0.5)
      case _ => ("gaussian", 1.0)
    }
    val (mcar, block) = fam match {
      case "D1" | "D1C" => (0.2, 0.0)
      case "D2" | "D2C" => (0.0, 0.2)
      case "D3" | "D3C" => (0.05, 0.05)
      case _ => (0.0, 0.0)
    }
    val ts = Kernel.specs(fam).trendSeason
    GenConfig(11L, fam, v, lag, n, noise, 0.1, ratio, mcar, block,
      if (ts) 0.01 else 0.0, if (ts) 0.5 else 0.0, 42L)
  }

  for (((fam, v, lag), refCols) <- RefStats.stats.toVector.sortBy(k => (k._1._1, k._1._2, k._1._3))) {
    test(s"$fam nVars=$v maxLag=$lag matches reference column stats") {
      val s = Kernel.generate(cfgFor(fam, v, lag))
      val spec = Kernel.specs(fam)
      for ((colName, (refMean, refStd, refMiss)) <- refCols) {
        val vals: Array[Double] =
          if (colName == "U") s.u
          else {
            val j = colName.drop(1).toInt - 1
            val raw = s.x.map(_(j))
            // reference stats are over the MISSING view (NaN cells excluded)
            if (spec.mcar || spec.block)
              raw.indices.filter(t => (s.mask(t) & (1 << j)) == 0).map(raw).toArray
            else raw
          }
        val m = vals.sum / vals.length
        val sd = math.sqrt(vals.map(x => (x - m) * (x - m)).sum / vals.length)
        val gotMiss =
          if (colName == "U") 0.0
          else {
            val j = colName.drop(1).toInt - 1
            s.mask.count(b => (b & (1 << j)) != 0).toDouble / n
          }
        // Tolerances calibrated to the reference's own cross-seed spread:
        // block-mask families swing ±0.05 in miss rate; the explosive D3/D2
        // dynamics swing ±3-5% in mean across RNG streams.
        val relTol = if (fam.startsWith("D2") || fam.startsWith("D3")) 0.10 else 0.03
        val missTol = if (spec.block) 0.10 else 0.06
        def close(got: Double, ref: Double, tag: String): Unit =
          assert(math.abs(got - ref) <= math.max(relTol * math.abs(ref), 0.015),
            s"$fam/$v $colName $tag: got $got ref $ref")
        close(m, refMean, "mean")
        close(sd, refStd, "std")
        assert(math.abs(gotMiss - refMiss) <= missTol, s"$fam/$v $colName miss: got $gotMiss ref $refMiss")
      }
    }
  }
}
