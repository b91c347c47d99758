package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-insensitive aggregation contracts.
  *
  * A `round(avg(x), k)` over doubles depends on partial-aggregation merge
  * order: change the partition topology (CPU count, input splits) and the sum
  * drifts a few ulps, which flips the rounded digit whenever the true value
  * sits near a rounding boundary. These helpers quantize each value to an
  * exact integer grid FIRST — `floor(x * 1e6)` of an IEEE multiply is
  * bit-identical in every engine — then aggregate in exact integer arithmetic
  * (LONG / DECIMAL(38,0)), so every merge order yields the same integers and
  * any final double math runs on identical inputs on both sides of a
  * cross-engine comparison.
  *
  * The closed-form OLS here mirrors the reference's `np.polyfit(time, col, 1)`
  * usage (c1.py:390-411) at a fixed micro-unit quantization.
  */
object ExactStats {

  /** floor(x · 1e6) as LONG — exact micro-unit quantization. */
  def micro(c: Column): Column = floor(c * lit(1e6))

  /** Order-insensitive Σ floor(x·1e6): an exact LONG sum. */
  def sumMicro(c: Column): Column = sum(micro(c))

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Shared exact sums for the OLS closed form over micro-quantized pairs;
    * rows where either side is null are excluded (regr_* semantics).
    * All five aggregates are exact integers, so any merge order agrees.
    */
  private final case class OlsSums(n: Column, sx: Column, sy: Column,
      sxx: Column, sxy: Column)

  private def olsSums(y: Column, x: Column): OlsSums = {
    val both = x.isNotNull && y.isNotNull
    val xm = dec(when(both, micro(x)))
    val ym = dec(when(both, micro(y)))
    OlsSums(
      n = dec(sum(when(both, lit(1L)).otherwise(lit(0L)))),
      sx = sum(xm), sy = sum(ym),
      sxx = sum(xm * xm), sxy = sum(xm * ym))
  }

  /** Magnitude bound of the DECIMAL(38,0) cross-products (n·Σxy, Σx·Σy,
    * n·Σxx, Σx²): with |x|,|y| ≤ M in natural units, micro values are
    * ≤ 1e6·M, so each product is ≤ n²·1e12·M² and must stay under 1e38 —
    * i.e. n²·M² < 1e26, e.g. M = 100 allows n ≤ 1e11 rows per group.
    * Past that, Spark's non-ANSI decimal arithmetic returns NULL silently;
    * rather than let the column quietly go null at exactly the scales this
    * module targets, the guard below turns overflow into a raised error
    * (n > 0 with a null cross-product is impossible otherwise). For groups
    * beyond the bound use the BigInt-based `OlsAggregator.slopeMilli`,
    * which is arbitrary-precision.
    */
  private def checkedRatio(s: OlsSums, num: Column, den: Column): Column =
    when(s.n > lit(0) && (num.isNull || den.isNull),
      raise_error(lit("graft.ExactStats: DECIMAL(38,0) overflow in OLS " +
        "cross-products (n^2*M^2 >= 1e26) — use OlsAggregator (BigInt)")))
      .otherwise(num / den)

  /** OLS slope of y on x in milli-units, rounded half-up:
    * floor(slope · 1000 + 0.5). Evaluated as
    * (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) over the exact micro sums; the
    * micro scale cancels, so this is the slope in y-per-x units. The final
    * double division runs on two exact integers that are identical under any
    * partition order (DuckDB mirror: HUGEINT sums, same formula text).
    */
  def slopeMilli(y: Column, x: Column): Column = {
    val s = olsSums(y, x)
    val num = (s.n * s.sxy - s.sx * s.sy).cast("double")
    val den = (s.n * s.sxx - s.sx * s.sx).cast("double")
    floor(checkedRatio(s, num, den) * lit(1000.0) + lit(0.5))
  }

  /** OLS intercept of y on x in milli-units of y (same contract as
    * slopeMilli): (Σy·Σxx − Σx·Σxy) / (n·Σxx − Σx²) is the intercept in
    * MICRO-y units, so the milli output divides by 1000 instead of
    * multiplying.
    */
  def interceptMilli(y: Column, x: Column): Column = {
    val s = olsSums(y, x)
    val num = (s.sy * s.sxx - s.sx * s.sxy).cast("double")
    val den = (s.n * s.sxx - s.sx * s.sx).cast("double")
    floor(checkedRatio(s, num, den) / lit(1000.0) + lit(0.5))
  }
}
