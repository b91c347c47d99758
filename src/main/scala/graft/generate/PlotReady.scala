package graft.generate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S5 "plot-ready" aggregates: the reference renders matplotlib figures
  * (a1.py:272-295 series plot, c1.py:390-411 per-var trend decomposition,
  * d3c.py:487-510 missing-pattern heatmap + sampling-interval histogram).
  * Pixel output is out of engine scope (SURVEY §3.1), but the DATA each
  * figure consumes is a small aggregation — exported here so a user can
  * re-render every reference figure from engine output.
  *
  * Scale note: each of these reduces an arbitrarily large series table to
  * O(plot) rows — strided sampling and fixed-width bucketing are narrow
  * per-row ops, the per-var fits are single-pass aggregations; nothing here
  * materializes the series on the driver.
  */
object PlotReady {

  private def longForm(wide: DataFrame, vars: Seq[String], extra: Seq[String]): DataFrame = {
    val stackArgs = vars.map(v => s"'$v', $v").mkString(", ")
    wide.selectExpr(extra ++ Seq(s"stack(${vars.size}, $stackArgs) AS (var, value)"): _*)
  }

  /** Series line-plot data (a1.py:286-295): long-form (var, t, time, value)
    * sampled every `stride` steps — exact row passthrough, no arithmetic.
    */
  def seriesSample(wide: DataFrame, vars: Seq[String], stride: Int): DataFrame =
    longForm(wide, vars, Seq("t", "time"))
      .where(pmod(col("t"), lit(stride)) === 0)
      .select(col("var"), col("t"), col("time"), col("value"))

  /** Missing-pattern heatmap counts (d3c.py:487-499): per (var, t-bucket)
    * missing and total cell counts over the masked view.
    */
  def missingPatternCounts(missingWide: DataFrame, vars: Seq[String],
      bucket: Int): DataFrame = {
    val stackArgs = vars.map(v => s"'$v', CAST($v IS NULL AS INT)").mkString(", ")
    missingWide
      .selectExpr("t div " + bucket + " AS t_bucket",
        s"stack(${vars.size}, $stackArgs) AS (var, is_missing)")
      .groupBy("var", "t_bucket")
      .agg(sum("is_missing").as("n_missing"), count(lit(1)).as("n_total"))
  }

  /** Sampling-interval histogram (d3c.py:501-510): consecutive time diffs per
    * config, bucketed at `binWidth` — (bin, n) with bin_lo for the axis.
    */
  def samplingIntervalHist(wide: DataFrame, binWidth: Double): DataFrame = {
    val w = Window.partitionBy("configId").orderBy("t")
    wide.select(col("configId"), col("t"), col("time"))
      .withColumn("diff", col("time") - lag("time", 1).over(w))
      .where(col("diff").isNotNull)
      .withColumn("bin", floor(col("diff") / binWidth).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", col("bin") * binWidth)
      .select("bin", "bin_lo", "n")
  }

  /** Per-variable linear trend fit (c1.py:390-411 np.polyfit(time, col, 1)):
    * slope + intercept of value on time, one row per var.
    */
  def trendFit(wide: DataFrame, vars: Seq[String]): DataFrame =
    longForm(wide, vars, Seq("time"))
      .groupBy("var")
      .agg(round(expr("regr_slope(value, time)"), 3).as("slope"),
           round(expr("regr_intercept(value, time)"), 3).as("intercept"),
           count(lit(1)).as("n"))

  /** Exact-contract variant of trendFit: integer milli-unit outputs via
    * order-insensitive exact sums (graft.ops.ExactStats), so the result is
    * identical under any partition topology — the cross-engine verification
    * entry (q46); `trendFit` remains the double-valued user API.
    */
  def trendFitExact(wide: DataFrame, vars: Seq[String]): DataFrame =
    longForm(wide, vars, Seq("time"))
      .groupBy("var")
      .agg(graft.ops.ExactStats.slopeMilli(col("value"), col("time")).as("slope_milli"),
           graft.ops.ExactStats.interceptMilli(col("value"), col("time")).as("intercept_milli"),
           count(lit(1)).as("n"))
}
