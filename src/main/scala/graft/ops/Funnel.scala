package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter-funnel retention: how many rows survive each prefix of an ordered
  * filter chain — the per-stage report every corpus-curation pipeline emits
  * (and re-reads before shipping a crawl snapshot).
  *
  * ONE scan, no shuffle beyond the final single-row aggregate: every stage
  * predicate is evaluated per row inside the same whole-stage-codegen'd
  * projection, and the cumulative counts are conditional aggregates. The
  * naive formulation — N chained .filter().count() actions — scans the
  * corpus N times; at 100 TB that is N extra full passes.
  */
object Funnel {

  /** Cumulative retention counts through `stages` (name, predicate), in one
    * pass. Row i of the output is the count of rows satisfying ALL
    * predicates up to and including stage i; stage 0 is the unfiltered
    * count. Columns: stage_idx, stage, n_docs.
    */
  def retention(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty)
    val cumulative = stages.tail.scanLeft(stages.head._2) {
      case (acc, (_, c)) => acc && c
    }
    val aggs = count(lit(1)).as("c_0") +: cumulative.zipWithIndex.map {
      case (f, i) => count_if(f).as(s"c_${i + 1}")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs =
      struct(lit(0).as("stage_idx"), lit("all").as("stage"),
        col("c_0").as("n_docs")) +:
      stages.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(i + 1).as("stage_idx"), lit(name).as("stage"),
          col(s"c_${i + 1}").as("n_docs"))
      }
    row.select(explode(array(structs: _*)).as("s"))
      .select(col("s.stage_idx").as("stage_idx"), col("s.stage").as("stage"),
        col("s.n_docs").as("n_docs"))
  }

  /** Event-sequence conversion: of the users whose stream contains a
    * `fromType` event, how many later (ts ≥ first `fromType`) emit a
    * `toType` event, and what is the exact total first-touch→conversion
    * lag. Emits ONE row: n_users, n_from, n_converted, lag_sum_us.
    *
    * Distribution: one shuffle partitioning by user — the per-user first
    * `fromType` timestamp is a window min over that partition, the
    * conversion min folds in the same per-user groupBy, and only |users|
    * rows reach the final single-row reduce. Lag is an exact integer sum
    * (micros), so the result is partition-order independent.
    */
  def conversionStats(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, fromType: String, toType: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(userCol)
    events
      .withColumn("_t_from",
        min(when(col(typeCol) === fromType, col(tsCol))).over(w))
      .groupBy(userCol)
      .agg(max("_t_from").as("t_from"), // constant within the user partition
        min(when(col(typeCol) === toType && col(tsCol) >= col("_t_from"),
          col(tsCol))).as("t_conv"))
      .agg(count(lit(1)).as("n_users"),
        count(col("t_from")).as("n_from"),
        count(col("t_conv")).as("n_converted"),
        sum(col("t_conv") - col("t_from")).as("lag_sum_us"))
  }
}
