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
