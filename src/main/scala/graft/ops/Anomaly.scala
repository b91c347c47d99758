package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group 3-sigma outlier detection with a PURE INTEGER contract: the
  * test (x − μ)² > 9σ² is cross-multiplied into
  *
  *   (n·x − S)² > 9·(n·Q − S²)        S = Σx, Q = Σx² (micro-units)
  *
  * so no mean/variance double ever crosses an aggregation or an engine
  * boundary — the flag is a deterministic function of exact integer sums.
  *
  * Distribution: one groupBy for the sufficient statistics (map-side
  * combined; |groups| rows out), broadcast back over the scan — two passes
  * over the data, zero wide shuffles of the event rows themselves.
  *
  * Magnitude bound (the ExactStats DECIMAL discipline): products are
  * DECIMAL(38,0) on Spark / HUGEINT in DuckDB, so the test needs
  * (n·|x|_max)² < 10^38, i.e. n·|x|_max < 10^19 — e.g. a billion rows per
  * group at |value| ≤ 10^3 (micro = 10^9) — beyond that, re-quantize to
  * milli-units before calling.
  */
object Anomaly {

  /** Flag rows whose `vMicroCol` deviates more than 3σ from their group
    * mean. Emits only the flagged rows (id, group, value, n of its group) —
    * at any real scale the anomaly set is the small output.
    */
  def threeSigmaOutliers(df: DataFrame, keyCols: Seq[String], idCol: String,
      vMicroCol: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val v = col(vMicroCol)
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n"),
        sum(dec(v)).as("_s"),
        // v² stays in LONG per row only below |v| < 3e9: widen BEFORE the
        // product, the r3-advice overflow lesson
        sum(dec(v) * dec(v)).as("_q"))
    val lhs = dec(col("_n")) * dec(v) - col("_s")
    val rhs = (dec(col("_n")) * col("_q") - col("_s") * col("_s")) * lit(9)
    df.join(broadcast(stats), keyCols)
      .where(lhs * lhs > rhs)
      .select((keyCols.map(col) :+ col(idCol) :+ v :+
        col("_n").as("group_n")): _*)
  }

  /** CUSUM changepoint profile per key: the running sum of deviations from
    * the GLOBAL mean,
    *
    *   cusum_i = Σ_{j ≤ i} (v_j − μ),   μ = ⌊Σv / n⌋  (integer floor — exact
    *                                     on both engines for v ≥ 0)
    *
    * peaks where the series' level shifts; the report emits, per key, the
    * extreme excursion (max, min), the FIRST timestamp attaining the maximal
    * |cusum| (deterministic tie-break: |cusum| desc, ts asc, id asc), and n.
    *
    * Distribution: one scalar aggregate for μ (broadcast back as a literal
    * join — no data moves), then a single shuffle partitioning by key; the
    * prefix sum, the ranking, and every per-key aggregate all run inside
    * that one window partition. Output is |keys| rows.
    *
    * Reference anchor: the reference's block-missing scan is the closest
    * sequential-state op (SURVEY §2.4); CUSUM is the standard drift /
    * level-shift detector a feed-monitoring pipeline adds on top.
    */
  def cusumPeaks(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      vMicroCol: String): DataFrame = {
    val mu = df.agg(expr(s"sum($vMicroCol) div count(1)").as("_mu"))
    val wRun = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy(keyCol)
    val wPeak = Window.partitionBy(keyCol)
      .orderBy(abs(col("cusum")).desc, col(tsCol), col(idCol))
    df.join(broadcast(mu))
      .withColumn("cusum", sum(col(vMicroCol) - col("_mu")).over(wRun))
      .withColumn("_rn", row_number().over(wPeak))
      .withColumn("n", count(lit(1)).over(wKey))
      .withColumn("cusum_max", max(col("cusum")).over(wKey))
      .withColumn("cusum_min", min(col("cusum")).over(wKey))
      .where(col("_rn") === 1)
      .select(col(keyCol), col("n"), col("cusum_max"), col("cusum_min"),
        col(tsCol).as("peak_ts"), abs(col("cusum")).as("peak_abs"))
  }
}
