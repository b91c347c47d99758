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
      partitionCols: Seq[String] = Nil, lagMult: Int = 1): DataFrame =
    nearestLagIndicesView(spine, idxCol, tsCol, partitionCols,
      Seq(lagMult)).drop("lag_mult")

  /** Multi-lag [[nearestLagIndexView]]: ALL requested lag multiples in
    * ONE union + ONE sort per partition (q365's four per-lag passes each
    * re-sorted the same spine; fusing them is a |lags|× cut on the
    * dominant window cost). Per lag the probe stream and tie rules are
    * IDENTICAL to the single-lag op — probes only read carried data
    * rows, so interleaving probes of different lags never changes a
    * carry — pinned bitwise-equal per lag by OpsSpec.
    *
    * Output: (partitionCols..., idxCol, lag_mult, lag_idx).
    */
  def nearestLagIndicesView(spine: DataFrame, idxCol: String,
      tsCol: String, partitionCols: Seq[String] = Nil,
      lagMults: Seq[Int] = Seq(1)): DataFrame = {
    // an empty list would yield zero probe rows (downstream joins silently
    // drop everything); duplicates would emit duplicated (idx, lag_mult)
    // rows — same guards as laggedCrossMoments
    require(lagMults.nonEmpty, "nearestLagIndicesView: lagMults is empty")
    val lags = lagMults.distinct
    val keys = if (partitionCols.isEmpty) Seq("_pk") else partitionCols
    val keyed =
      if (partitionCols.isEmpty) spine.withColumn("_pk", lit(1)) else spine
    val st = keyed.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol).cast("double")).as("_mn"),
        max(col(tsCol).cast("double")).as("_mx"),
        count(lit(1)).as("_n"))
    val withMd = keyed.join(broadcast(st), keys)
      .withColumn("_md",
        (col("_mx") - col("_mn")) / (col("_n") - lit(1)))
    val data = withMd.select(keys.map(col) :+
      col(tsCol).cast("double").as("_ts") :+ lit(0).as("_kind") :+
      col(idxCol).cast("long").as("_idx") :+ lit(0).as("_k"): _*)
    val probes = withMd.where(col(idxCol) >= 1)
      .withColumn("_k", explode(lit(lags.toArray)))
      .select(keys.map(col) :+
        (col(tsCol).cast("double") - col("_md") * col("_k")).as("_ts") :+
        lit(1).as("_kind") :+ col(idxCol).cast("long").as("_idx") :+
        col("_k"): _*)
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
      col("_k").as("lag_mult") :+
      when(takeFwd, col("_f.idx"))
        .otherwise(coalesce(col("_b.idx"), lit(0L))).as("lag_idx"): _*)
  }

  /** [[nearestLagIndexView]]'s DuckDB twin, rendered from ONE Scala value
    * (the pcSkeletonSqlCtes discipline): CTEs `md$sfx, pts$sfx, car$sfx,
    * lx$sfx` over a spine CTE `$spine(t, $tsExpr [, partCols...])`,
    * yielding `lx$sfx(partCols..., t, $outCol)`. The q314/q325/q333/q334
    * oracles each rendered a hand-edited copy of this block before —
    * a tie-break or carry fix had to land in four places.
    */
  def nearestLagIndexSqlCtes(spine: String, tsExpr: String,
      partCols: Seq[String] = Nil, lagMult: Int = 1, sfx: String = "",
      outCol: String = "lag_idx", materialized: Boolean = false): String = {
    val pcSel = partCols.map(c => s"$c, ").mkString
    val pcPart =
      if (partCols.isEmpty) "" else s"PARTITION BY ${partCols.mkString(", ")} "
    val mdGroup =
      if (partCols.isEmpty) ""
      else s" GROUP BY ${partCols.indices.map(_ + 1).mkString(", ")}"
    val mdJoin =
      if (partCols.isEmpty) s"$spine s, md$sfx m"
      else s"$spine s JOIN md$sfx m USING (${partCols.mkString(", ")})"
    val mult = if (lagMult == 1) "m.md" else s"m.md * $lagMult"
    val mat = if (materialized) "MATERIALIZED " else ""
    s"""md$sfx AS (
       |  SELECT $pcSel(max($tsExpr) - min($tsExpr)) / (count(*) - 1) AS md
       |  FROM $spine$mdGroup),
       |pts$sfx AS (
       |  SELECT $pcSel$tsExpr AS ts, 0 AS kind, t AS idx FROM $spine
       |  UNION ALL
       |  SELECT ${partCols.map(c => s"s.$c, ").mkString}s.$tsExpr - $mult,
       |    1, s.t
       |  FROM $mdJoin WHERE s.t >= 1),
       |car$sfx AS (
       |  SELECT ${pcSel}ts, kind, idx,
       |    last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
       |      OVER wb AS bts,
       |    last_value(CASE WHEN kind = 0 THEN idx END IGNORE NULLS)
       |      OVER wb AS bidx,
       |    first_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
       |      OVER wf AS fts,
       |    first_value(CASE WHEN kind = 0 THEN idx END IGNORE NULLS)
       |      OVER wf AS fidx
       |  FROM pts$sfx
       |  WINDOW wb AS (${pcPart}ORDER BY ts, kind, idx DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    wf AS (${pcPart}ORDER BY ts, kind, idx
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
       |lx$sfx AS $mat(
       |  SELECT ${pcSel}idx AS t,
       |    CASE WHEN fidx IS NOT NULL AND fidx < idx
       |        AND (bts IS NULL OR (fts - ts) < (ts - bts))
       |      THEN fidx ELSE coalesce(bidx, 0) END AS $outCol
       |  FROM car$sfx WHERE kind = 1)""".stripMargin
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
