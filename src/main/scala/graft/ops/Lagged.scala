package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lagged projection (R1) — the reference's only windowed relational operator
  * (py_tetrad_helper.py:225-237: concat of df.shift(lag) for lag 0..L, columns
  * `X1_0..Xp_L`, then dropna).
  *
  * Spark-first: window `lag` over (partition, order) — whole-stage-codegen'd,
  * single shuffle on the partition key. At 100 TB the partition key (series id)
  * keeps state bounded per task; no driver materialization.
  */
object Lagged {

  /** Wide lagged view: for each value column c and lag k ∈ 0..maxLag adds
    * `${c}_$k` = c shifted k rows back within the partition; rows whose full
    * lag frame is incomplete are dropped (reference's trailing dropna).
    */
  def laggedView(df: DataFrame, partitionCols: Seq[String], orderCol: String,
      valueCols: Seq[String], maxLag: Int): DataFrame = {
    val w =
      if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val names = for { c <- valueCols; k <- 0 to maxLag } yield s"${c}_$k"
    val lagCols: Seq[Column] = for {
      c <- valueCols
      k <- 0 to maxLag
    } yield (if (k == 0) col(c) else lag(col(c), k).over(w)).as(s"${c}_$k")
    val keep = partitionCols.map(col) :+ col(orderCol)
    // rows with an incomplete lag frame are dropped (reference dropna)
    df.select(keep ++ lagCols: _*).na.drop("any", names)
  }

  /** Nearest-lag index view over an irregular time spine (a2.py:162-167
    * `find_nearest_lag_idx`): for each row i ≥ 1, the index j < i whose
    * timestamp is closest to `time_i − lagMult·meanDiff`, ties resolved to
    * the EARLIER index (np.argmin first-hit); `meanDiff` is the mean
    * successive gap, computed as (max−min)/(n−1) — np.mean(np.diff)
    * telescoped, so both engines evaluate ONE identical IEEE expression.
    *
    * Shape: union the spine with per-row probe rows at the target time,
    * one sort per partition, and two carries (last data row at-or-before /
    * first data row after) — the AsOf pattern, linear in the spine, no
    * per-row range probe. The spine is per-series at scale; pass
    * `partitionCols` to keep the sort partition-local.
    *
    * Output: (partitionCols..., idxCol, lag_idx).
    */
  def nearestLagIndexView(spine: DataFrame, idxCol: String, tsCol: String,
      partitionCols: Seq[String] = Nil, lagMult: Int = 1): DataFrame = {
    val keys = if (partitionCols.isEmpty) Seq("_pk") else partitionCols
    val keyed =
      if (partitionCols.isEmpty) spine.withColumn("_pk", lit(1)) else spine
    val st = keyed.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol).cast("double")).as("_mn"),
        max(col(tsCol).cast("double")).as("_mx"),
        count(lit(1)).as("_n"))
    val withMd = keyed.join(broadcast(st), keys)
      .withColumn("_md",
        (col("_mx") - col("_mn")) / (col("_n") - lit(1)) * lagMult)
    val data = withMd.select(keys.map(col) :+
      col(tsCol).cast("double").as("_ts") :+ lit(0).as("_kind") :+
      col(idxCol).cast("long").as("_idx"): _*)
    val probes = withMd.where(col(idxCol) >= 1)
      .select(keys.map(col) :+
        (col(tsCol).cast("double") - col("_md")).as("_ts") :+
        lit(1).as("_kind") :+ col(idxCol).cast("long").as("_idx"): _*)
    // _idx DESC inside an equal-_ts group: the carried (= last) data row
    // is then the SMALLEST index among duplicate timestamps, matching
    // np.argmin's first-hit rule on a spine with repeated clocks
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_kind").asc, col("_idx").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // the forward carry runs over the exactly-REVERSED total order with a
    // growing frame: Spark recomputes an unbounded-FOLLOWING frame's
    // aggregate from scratch at every row (O(n²) —
    // UnboundedFollowingWindowFunctionFrame; profiled at 3 s for a 5k-row
    // spine), while growing frames update incrementally
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").desc, col("_kind").desc, col("_idx").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // the candidate travels as one struct: ts and idx must come from the
    // SAME data row (see the AsOf chimera note)
    val dRow = when(col("_kind") === 0,
      struct(col("_ts").as("ts"), col("_idx").as("idx")))
    val carried = data.unionByName(probes)
      .withColumn("_b", last(dRow, ignoreNulls = true).over(wb))
      .withColumn("_f", last(dRow, ignoreNulls = true).over(wf))
      .where(col("_kind") === 1)
    // forward candidate only counts when it is still a PAST index; an
    // exact tie goes backward (argmin returns the first minimizing index)
    val takeFwd = col("_f").isNotNull && col("_f.idx") < col("_idx") &&
      (col("_b").isNull ||
        (col("_f.ts") - col("_ts")) < (col("_ts") - col("_b.ts")))
    carried.select(partitionCols.map(col) :+ col("_idx").as(idxCol) :+
      when(takeFwd, col("_f.idx"))
        .otherwise(coalesce(col("_b.idx"), lit(0L))).as("lag_idx"): _*)
  }

  /** Per-partition successive time gaps (R12 sanity stats: np.diff on time). */
  def timeGaps(df: DataFrame, partitionCols: Seq[String], tsCol: String): DataFrame = {
    val w =
      if (partitionCols.isEmpty) Window.orderBy(col(tsCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(tsCol))
    df.withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .where(col("prev_ts").isNotNull)
      .withColumn("gap", col(tsCol).cast("double") - col("prev_ts").cast("double"))
  }
}
