package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the gap to the previous
  * event exceeds `gapUs`. One shuffle on the key; session ids via running sum
  * of new-session flags — the standard scalable formulation (no state store
  * needed in batch; the streaming analogue is session windows).
  */
object Sessionize {

  def sessions(events: DataFrame, keyCol: String, tsCol: String, gapUs: Long,
      tieBreakCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreakCol))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    events
      .withColumn("new_sess",
        when(col(tsCol) - lag(col(tsCol), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum("new_sess").over(run))
  }

  def sessionStats(events: DataFrame, keyCol: String, tsCol: String, gapUs: Long,
      tieBreakCol: String = "event_id"): DataFrame =
    sessions(events, keyCol, tsCol, gapUs, tieBreakCol)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col(tsCol)).as("start_us"),
           max(col(tsCol)).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
}
