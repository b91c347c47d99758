package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * The matched right row travels as ONE struct: carrying each value column
  * independently with ignoreNulls would stitch fields from DIFFERENT right
  * rows whenever a value column is null (a chimera row no engine's ASOF
  * semantics would produce); the struct is null exactly for left rows, so
  * the whole matched row stays together.
  */
object AsOf {

  private def tagged(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String, valueCols: Seq[String]): DataFrame = {
    val rVals = right.select((keyCols :+ tsCol).map(col) ++ valueCols.map(col): _*)
      .withColumn("_side", lit(0))
    left.withColumn("_side", lit(1))
      .unionByName(rVals, allowMissingColumns = true)
  }

  /** The matched right row as a single nullable struct (ts first). */
  private def rightRow(tsCol: String, valueCols: Seq[String]): Column =
    when(col("_side") === 0, struct((tsCol +: valueCols).map(col): _*))

  private def unpack(df: DataFrame, lCols: Seq[String], rowCol: Column,
      tsCol: String, valueCols: Seq[String]): DataFrame =
    df.where(col("_side") === 1)
      .select(lCols.map(col) ++
        valueCols.map(c => rowCol.getField(c).as(s"asof_$c")) :+
        rowCol.getField(tsCol).as("asof_ts"): _*)

  /** For each left row, attach the latest right row with right.ts <= left.ts
    * (backward as-of) within the same key. Right value columns come back as
    * `asof_<col>`; rows with no prior right match keep nulls.
    */
  def asofBackward(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String, valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val unioned = tagged(left, right, keyCols, tsCol, valueCols)
    // tie-break on the right value columns so duplicate right timestamps
    // within a key resolve deterministically across runs/partitionings
    val tieBreak = valueCols.map(c => col(c).asc_nulls_first)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).cast("double").asc +: col("_side").asc +: tieBreak): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("_r",
      last(rightRow(tsCol, valueCols), ignoreNulls = true).over(w))
    unpack(carried, lCols, col("_r"), tsCol, valueCols)
  }

  /** [[asofBackward]] with a STALENESS BOUND: a match older than
    * `toleranceUs` reverts to null — the sensor-fusion contract ("join the
    * latest reading unless it's too stale to trust"). Same union + single
    * shuffle + carry; the tolerance is one codegen'd comparison on the
    * carried struct, so the plan is identical to the unbounded form.
    */
  def asofBackwardTolerance(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String, valueCols: Seq[String],
      toleranceUs: Long): DataFrame = {
    val lCols = left.columns.toSeq
    val unioned = tagged(left, right, keyCols, tsCol, valueCols)
    val tieBreak = valueCols.map(c => col(c).asc_nulls_first)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).cast("double").asc +: col("_side").asc +: tieBreak): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned
      .withColumn("_r0", last(rightRow(tsCol, valueCols), ignoreNulls = true).over(w))
      .withColumn("_r",
        when(col(tsCol) - col("_r0").getField(tsCol) <= toleranceUs, col("_r0")))
    unpack(carried, lCols, col("_r"), tsCol, valueCols)
  }

  /** For each left row, attach the EARLIEST right row with right.ts >=
    * left.ts (forward as-of) within the same key — the symmetric third of
    * the family (backward / nearest / forward). Same union + single-shuffle
    * carry; the sort puts left rows BEFORE right rows at equal timestamps so
    * an exactly simultaneous right row qualifies (>= semantics, matching
    * DuckDB's `ASOF JOIN ... ON l.ts <= r.ts`).
    */
  def asofForward(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String, valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val unioned = tagged(left, right, keyCols, tsCol, valueCols)
    // the forward carry runs over the exactly-REVERSED total order with a
    // growing frame: Spark recomputes an unbounded-FOLLOWING frame's
    // aggregate from scratch at every row
    // (UnboundedFollowingWindowFunctionFrame, O(n²) per key) while
    // growing frames update incrementally — `last` over the reversed
    // prefix selects the same row `first` over the forward suffix did
    val tieBreakRev = valueCols.map(c => col(c).desc_nulls_last)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).cast("double").desc +: col("_side").asc +:
        tieBreakRev): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("_r",
      last(rightRow(tsCol, valueCols), ignoreNulls = true).over(w))
    unpack(carried, lCols, col("_r"), tsCol, valueCols)
  }

  /** Nearest (either direction) as-of: argmin |right.ts - left.ts| per left
    * row — the reference's literal semantics (nearest can be LATER than the
    * target, §2.4-5). Backward + forward carry, then pick the closer.
    */
  def asofNearest(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String, valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val unioned = tagged(left, right, keyCols, tsCol, valueCols)
    val wb = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).cast("double").asc +: col("_side").asc +:
        valueCols.map(c => col(c).asc_nulls_first)): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // reversed growing frame instead of an unbounded-following frame —
    // see the asofForward O(n²) note
    val wf = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).cast("double").desc +: col("_side").desc +:
        valueCols.map(c => col(c).desc_nulls_last)): _*)
      .rowsBetween(Window.unboundedPreceding, 0)

    val rrow = rightRow(tsCol, valueCols)
    val withBoth = unioned
      .withColumn("_b", last(rrow, ignoreNulls = true).over(wb))
      .withColumn("_f", last(rrow, ignoreNulls = true).over(wf))
    val bts = col("_b").getField(tsCol).cast("double")
    val fts = col("_f").getField(tsCol).cast("double")
    val takeBackward = col("_f").isNull ||
      (col("_b").isNotNull &&
        abs(col(tsCol).cast("double") - bts) <= abs(fts - col(tsCol).cast("double")))
    val picked = withBoth.withColumn("_r", when(takeBackward, col("_b")).otherwise(col("_f")))
    unpack(picked, lCols, col("_r"), tsCol, valueCols)
  }
}
