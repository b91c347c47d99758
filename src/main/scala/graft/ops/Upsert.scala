package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-wins upsert merge — the batch MERGE INTO / SCD-type-1 pattern: a
  * base snapshot and an update set collapse to one surviving record per key,
  * the one with the highest (ordCols..., src) tuple, so updates beat the
  * base on ties and the merge is a pure function of the data (no "last
  * writer" race).
  *
  * Shape: union + ONE map-side-combined `max(struct(...))` aggregation —
  * a single shuffle of pre-reduced rows, no window sort, no join. At 100 TB
  * this is the cheapest possible merge: each task emits at most one
  * candidate per key it sees, and the struct max merges associatively.
  * (A window row_number formulation shuffles every row and sorts; the
  * aggregate shuffles one row per key per task.)
  */
object Upsert {

  /** Merge `base` and `updates` (same schema on keyCols ++ ordCols ++
    * payloadCols), keeping per key the row with the greatest
    * (ordCols..., src) — src is 0 for base, 1 for updates. Output:
    * keyCols..., ordCols..., payloadCols..., src. Deterministic whenever
    * (ordCols, src) is unique per key; payload fields participate as a
    * final tie-break otherwise.
    */
  def latestWins(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
      ordCols: Seq[String], payloadCols: Seq[String]): DataFrame = {
    val sel = (df: DataFrame, src: Int) =>
      df.select((keyCols ++ ordCols ++ payloadCols).map(col): _*)
        .withColumn("src", lit(src))
    val tagged = sel(base, 0).unionByName(sel(updates, 1))
    val winner = struct((ordCols :+ "src") ++ payloadCols map col: _*)
    tagged.groupBy(keyCols.map(col): _*)
      .agg(max(winner).as("_w"))
      .select(keyCols.map(col) ++
        (ordCols ++ payloadCols :+ "src").map(c => col(s"_w.$c").as(c)): _*)
  }
}
