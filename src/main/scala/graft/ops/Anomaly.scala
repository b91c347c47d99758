package graft.ops

import org.apache.spark.sql.{DataFrame}
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
}
