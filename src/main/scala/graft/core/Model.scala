package graft.core

/** One cell of the reference's generation grid (SURVEY §1.4, §2).
  * The grid Dataset[GenConfig] is the engine's unit of parallelism: generation
  * fans out one kernel invocation per config (reference: nested for-loops,
  * a1.py:308-344, d3c.py:524-573).
  */
final case class GenConfig(
    configId: Long,
    family: String,   // A1 A1C A2 A2C B1 B1C B2 B2C C1 C1C C2 C2C D1 D1C D2 D2C D3 D3C
    nVars: Int,       // 4 | 6 | 8
    maxLag: Int,      // 2 | 3 | 4
    nPoints: Int,     // 500 | 1000 | 3000 | 5000
    noiseType: String, // gaussian | student_t | mixed
    noiseScale: Double, // 0.1 throughout the reference
    mixRatio: Double,   // gaussian fraction for mixed noise (b2.py:75-85)
    mcarProb: Double,   // D1/D1C/D3/D3C cell-missing rate (d1.py:206-211)
    blockProb: Double,  // D2/D2C/D3/D3C block-start prob (d2.py:112-138)
    trendStrength: Double,    // C/D3 families (c1.py:126-130)
    seasonalStrength: Double, // C/D3 families (c1.py:132-141)
    seed: Long)

/** Ground-truth causal edge (reference link dict, SURVEY §1.2).
  * `lag` is stored non-negative ("source at t-lag → target at t").
  * `func`: linear | cos | sin | power2 | power3 | confounder.
  */
final case class CausalLink(
    family: String, nVars: Int, maxLag: Int,
    source: String, lag: Int, target: String, func: String, coef: Double)

/** One generated observation, wide form. x5..x8/u are None when the config has
  * fewer variables / no confounder. `maskBits` bit i set = X(i+1) masked
  * missing (D families); always 0 elsewhere. `time` is the integer index for
  * regular sampling, continuous timestamp for irregular.
  */
final case class SeriesRow(
    configId: Long, family: String, nVars: Int, maxLag: Int, nPoints: Int,
    t: Long, time: Double,
    x1: Option[Double], x2: Option[Double], x3: Option[Double], x4: Option[Double],
    x5: Option[Double], x6: Option[Double], x7: Option[Double], x8: Option[Double],
    u: Option[Double], maskBits: Int)

/** Kernel output for a single config, before row emission. */
final case class Series(
    cfg: GenConfig,
    times: Array[Double],
    x: Array[Array[Double]],  // [nPoints][nVars], complete (pre-mask) values
    u: Array[Double],         // empty when family has no confounder
    mask: Array[Int])         // per-row bitmask of masked X cells
