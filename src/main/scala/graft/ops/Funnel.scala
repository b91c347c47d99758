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
}
