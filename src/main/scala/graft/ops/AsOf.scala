package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-past) join — the relational form of the reference's
  * nearest-lag lookup (G10, a2.py:162-167). Spark has no built-in ASOF join;
  * the scalable pattern used here is union + sorted carry-forward:
  *
  *   tag left/right, union, single shuffle on the key, sort by (ts, tag),
  *   last_value(ignoreNulls) carries the latest right-side row forward.
  *
  * One shuffle, linear in |L|+|R|, no per-row range probe — this survives a
  * 100× scale-up where a broadcast-range-join or per-key collect would not.
  */
object AsOf {

  /** For each left row, attach the latest right row with right.ts <= left.ts
    * (backward as-of) within the same key. Right value columns come back as
    * `asof_<col>`; rows with no prior right match keep nulls.
    */
  def asofBackward(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String, valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns
    val rVals = right.select((keyCols :+ tsCol).map(col) ++ valueCols.map(col): _*)
      .withColumn("_side", lit(0))
    // right rows sort before left rows at the same timestamp (<= semantics)
    val unioned = left.withColumn("_side", lit(1))
      .unionByName(rVals, allowMissingColumns = true)

    // tie-break on the right value columns so duplicate right timestamps
    // within a key resolve deterministically across runs/partitionings
    val tieBreak = valueCols.map(c => col(c).asc_nulls_first)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).cast("double").asc +: col("_side").asc +: tieBreak): _*)
      .rowsBetween(Window.unboundedPreceding, 0)

    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w))
    }.withColumn("asof_ts",
      last(when(col("_side") === 0, col(tsCol)), ignoreNulls = true).over(w))

    carried.where(col("_side") === 1)
      .select(lCols.map(col) ++ valueCols.map(c => col(s"asof_$c")) :+ col("asof_ts"): _*)
  }

  /** For each left row, attach the EARLIEST right row with right.ts >=
    * left.ts (forward as-of) — the symmetric third of the family
    * (backward / nearest / forward). Same union + single-shuffle carry as
    * asofBackward; the sort puts left rows BEFORE right rows at equal
    * timestamps so an exactly-simultaneous right row qualifies
    * (>= semantics, matching DuckDB's `ASOF JOIN ... ON l.ts <= r.ts`).
    */
  def asofForward(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String, valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns
    val rVals = right.select((keyCols :+ tsCol).map(col) ++ valueCols.map(col): _*)
      .withColumn("_side", lit(0))
    val unioned = left.withColumn("_side", lit(1))
      .unionByName(rVals, allowMissingColumns = true)

    val tieBreak = valueCols.map(c => col(c).asc_nulls_first)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).cast("double").asc +: col("_side").desc +: tieBreak): _*)
      .rowsBetween(0, Window.unboundedFollowing)

    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        first(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w))
    }.withColumn("asof_ts",
      first(when(col("_side") === 0, col(tsCol)), ignoreNulls = true).over(w))

    carried.where(col("_side") === 1)
      .select(lCols.map(col) ++ valueCols.map(c => col(s"asof_$c")) :+ col("asof_ts"): _*)
  }

  /** Nearest (either direction) as-of: argmin |right.ts - left.ts| per left
    * row — the reference's literal semantics (nearest can be LATER than the
    * target, §2.4-5). Backward + forward carry, then pick the closer.
    */
  def asofNearest(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String, valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns
    val rVals = right.select((keyCols :+ tsCol).map(col) ++ valueCols.map(col): _*)
      .withColumn("_side", lit(0))
    val unioned = left.withColumn("_side", lit(1))
      .unionByName(rVals, allowMissingColumns = true)

    val base = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).cast("double").asc +: col("_side").asc +:
        valueCols.map(c => col(c).asc_nulls_first)): _*)
    val wb = base.rowsBetween(Window.unboundedPreceding, 0)
    val wf = base.rowsBetween(0, Window.unboundedFollowing)

    val withBoth = valueCols.foldLeft(
      unioned
        .withColumn("_bts", last(when(col("_side") === 0, col(tsCol)), ignoreNulls = true).over(wb))
        .withColumn("_fts", first(when(col("_side") === 0, col(tsCol)), ignoreNulls = true).over(wf))
    ) { (df, c) =>
      df.withColumn(s"_b_$c", last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(wb))
        .withColumn(s"_f_$c", first(when(col("_side") === 0, col(c)), ignoreNulls = true).over(wf))
    }

    val takeBackward = col("_fts").isNull ||
      (col("_bts").isNotNull &&
        abs(col(tsCol).cast("double") - col("_bts").cast("double")) <=
        abs(col("_fts").cast("double") - col(tsCol).cast("double")))

    val picked = valueCols.foldLeft(
      withBoth.withColumn("asof_ts", when(takeBackward, col("_bts")).otherwise(col("_fts")))
    ) { (df, c) =>
      df.withColumn(s"asof_$c", when(takeBackward, col(s"_b_$c")).otherwise(col(s"_f_$c")))
    }

    picked.where(col("_side") === 1)
      .select(lCols.map(col) ++ valueCols.map(c => col(s"asof_$c")) :+ col("asof_ts"): _*)
  }
}
