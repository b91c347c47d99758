package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Holt double-exponential smoothing over a (series, day, v:long) panel —
  * an integer-contract recurrence: with centi-weights α, β,
  *   l_t = (α·v_t + (100−α)·(l_{t−1}+b_{t−1})) div 100
  *   b_t = (β·(l_t − l_{t−1}) + (100−β)·b_{t−1}) div 100
  * initialized l₂ = v₂, b₂ = v₂ − v₁, accumulating the one-step-ahead
  * SSE from t = 3. Every division truncates toward zero — the DuckDB
  * oracle replays the identical recurrence as a recursive CTE.
  *
  * Scale shape: a recurrence is inherently sequential PER SERIES, so the
  * panel is grouped once (one shuffle keyed by series) and each series'
  * day-array folds inside a single codegen'd higher-order `aggregate` —
  * thousands of series smooth in parallel, no driver loop, no iteration
  * of Spark jobs. Day-counts per series are panel-sized (the fact scan
  * already aggregated to days), so collect_list holds ~365·years values,
  * not fact rows.
  */
object Smoothing {

  def holt(panel: DataFrame, alphaCenti: Int = 30, betaCenti: Int = 10)
      : DataFrame = {
    val a = alphaCenti
    val b = betaCenti
    require(a > 0 && a < 100 && b > 0 && b < 100)
    val lNext = s"($a * x.v + ${100 - a} * (st.l + st.b)) div 100"
    panel.groupBy("series")
      .agg(sort_array(collect_list(struct(col("day"), col("v"))))
        .as("arr"))
      .select(col("series"), size(col("arr")).as("n_obs"),
        expr(
          s"""aggregate(
             |  slice(arr, 3, size(arr) - 2),
             |  named_struct(
             |    'l', arr[1].v,
             |    'b', arr[1].v - arr[0].v,
             |    'sse', cast(0 as bigint)),
             |  (st, x) -> named_struct(
             |    'l', $lNext,
             |    'b', ($b * (($lNext) - st.l) + ${100 - b} * st.b) div 100,
             |    'sse', st.sse
             |      + (x.v - (st.l + st.b)) * (x.v - (st.l + st.b))),
             |  st -> st)""".stripMargin).as("st"))
      .select(col("series"), col("n_obs"),
        col("st.l").as("level_milli"), col("st.b").as("trend_milli"),
        col("st.sse").as("sse_milli2"))
  }

  /** The identical recurrence as a DuckDB recursive-CTE fragment over a
    * CTE `\$panel(series, day, v)` — yields `holt_out`. Shared from one
    * builder so the two engines cannot drift. NOTE: the caller's WITH
    * must be declared RECURSIVE.
    */
  def holtSqlCtes(panel: String, alphaCenti: Int = 30,
      betaCenti: Int = 10): String = {
    val a = alphaCenti
    val b = betaCenti
    val lNext = s"($a * x.v + ${100 - a} * (r.l + r.bb)) // 100"
    s"""hw_ix AS (
       |  SELECT series, v,
       |    row_number() OVER (PARTITION BY series ORDER BY day) AS i,
       |    count(*) OVER (PARTITION BY series) AS n_obs
       |  FROM $panel),
       |hw_rec AS (
       |  SELECT p1.series, 2 AS i, p2.v AS l, p2.v - p1.v AS bb,
       |    0::BIGINT AS sse
       |  FROM hw_ix p1 JOIN hw_ix p2
       |    ON p1.series = p2.series AND p1.i = 1 AND p2.i = 2
       |  UNION ALL
       |  SELECT r.series, r.i + 1,
       |    $lNext AS l,
       |    ($b * (($lNext) - r.l) + ${100 - b} * r.bb) // 100 AS bb,
       |    r.sse + (x.v - (r.l + r.bb)) * (x.v - (r.l + r.bb))
       |  FROM hw_rec r JOIN hw_ix x
       |    ON x.series = r.series AND x.i = r.i + 1),
       |holt_out AS (
       |  SELECT h.series, n.n_obs::INT AS n_obs, h.l AS level_milli,
       |    h.bb AS trend_milli, h.sse AS sse_milli2
       |  FROM hw_rec h
       |  JOIN (SELECT series, max(i) AS mi, max(n_obs) AS n_obs
       |        FROM hw_ix GROUP BY 1) n
       |    ON n.series = h.series AND h.i = n.mi)""".stripMargin
  }
}
