package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group center/spread: EXACT lower median and MAD (median
  * absolute deviation) over integer-quantized values, plus the robust
  * outlier count |v − med| > k·MAD. The robust complement to
  * [[Anomaly.threeSigmaOutliers]]: a single 10^6× spike shifts a mean/σ
  * gate arbitrarily but moves the median by at most one rank.
  *
  * PURE INTEGER contract: the lower median is min{v : 2·cum(v) ≥ n} over
  * the per-value count histogram — no interpolation, no doubles — and MAD
  * applies the same selector to |v − med|. Bit-identical across engines
  * and partition topologies.
  *
  * Scale design: the value scan collapses to a (group, value) count
  * histogram FIRST (map-side combinable; the shuffle carries distinct
  * values, not rows — bounded by the quantized value domain, not the
  * corpus). The cumulative rank runs per group over that histogram, and
  * medians re-enter as a BROADCAST of |groups| rows. Two histogram passes
  * (values, then deviations) + one outlier count — three scans, zero
  * row-level shuffles.
  */
object Robust {

  private def lowerMedian(hist: DataFrame, keyCol: String, vCol: String,
      outCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(vCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(keyCol)))
      .where(col("_cum") * 2 >= col("_n"))
      .groupBy(keyCol)
      .agg(min(col(vCol)).as(outCol), max(col("_n")).as(s"${outCol}_n"))
  }

  /** Per-`keyCol` exact median/MAD of integer `vCol`, and the count of rows
    * beyond `k`·MAD. Output: key, n, median, mad, n_outliers.
    */
  def medianMadOutliers(df: DataFrame, keyCol: String, vCol: String,
      k: Int): DataFrame = {
    val vals = df.select(col(keyCol), col(vCol).cast("long").as("_v"))
    val hist = vals.groupBy(keyCol, "_v").agg(count(lit(1)).as("_c"))
    val med = lowerMedian(hist, keyCol, "_v", "median")
    val withMed = vals.join(broadcast(med.select(col(keyCol), col("median"))), keyCol)
    val devHist = withMed.select(col(keyCol), abs(col("_v") - col("median")).as("_v"))
      .groupBy(keyCol, "_v").agg(count(lit(1)).as("_c"))
    val mad = lowerMedian(devHist, keyCol, "_v", "mad")
    val centers = med.join(mad.select(col(keyCol), col("mad")), keyCol)
    withMed.join(broadcast(centers.select(col(keyCol), col("mad"))), keyCol)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        max(col("median")).as("median"), max(col("mad")).as("mad"),
        count(when(abs(col("_v") - col("median")) > col("mad") * k, 1))
          .as("n_outliers"))
  }
}
