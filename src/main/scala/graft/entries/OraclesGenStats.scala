package graft

/** GenStats slice of [[SparkEntry.oracleSql]] — the DuckDB twins of
  * [[QueriesGenStats]], split mechanically from the single map. */
private[graft] trait OraclesGenStats { this: SparkEntry.type =>

  private[graft] def oracleSqlGenStats: Map[String, String] = Map(

    "q31_trend_season" ->
      """SELECT t, var_idx,
        |  5000 * var_idx * t AS trend_micro,
        |  (2 * t + 3 * (var_idx - 1)) % 24 AS arg1_24,
        |  (4 * t + 3 * (var_idx - 1)) % 24 AS arg2_24
        |FROM range(0, 200) r(t)
        |CROSS JOIN range(1, 9) v(var_idx)""".stripMargin,

    "q37_regex_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpeish_tokens,
        |  len(list_distinct(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS n_distinct_bpeish,
        |  len(string_split(text, ' ')) AS n_ws_tokens
        |FROM documents""".stripMargin,

    "q36_asof_nearest" ->
      """WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS ts_us, min(event_id) AS click_id
        |      FROM events WHERE event_type = 'click'
        |      GROUP BY user_id, epoch_us(ts)),
        |b AS (SELECT p.user_id, p.event_id, c.click_id, c.ts_us AS cts
        |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us),
        |f AS (SELECT p.user_id, p.event_id, c.click_id, c.ts_us AS cts
        |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us < c.ts_us)
        |SELECT p.user_id, p.event_id,
        |  CASE WHEN f.cts IS NULL OR (b.cts IS NOT NULL AND (p.ts_us - b.cts) <= (f.cts - p.ts_us))
        |       THEN b.click_id ELSE f.click_id END AS click_id,
        |  CASE WHEN f.cts IS NULL OR (b.cts IS NOT NULL AND (p.ts_us - b.cts) <= (f.cts - p.ts_us))
        |       THEN b.cts ELSE f.cts END AS click_ts_us
        |FROM p
        |LEFT JOIN b ON p.event_id = b.event_id
        |LEFT JOIN f ON p.event_id = f.event_id""".stripMargin,

    "q59_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q54_asof_forward" ->
      """SELECT p.user_id, p.event_id, c.click_id, c.ts_us AS click_ts_us
        |FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS ts_us,
        |                       min(event_id) AS click_id
        |                FROM events WHERE event_type = 'click'
        |                GROUP BY user_id, epoch_us(ts)) c
        |ON p.user_id = c.user_id AND p.ts_us <= c.ts_us""".stripMargin,

    "q32_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q33_moving_avg" ->
      """WITH daily AS (
        |  SELECT datediff('day', DATE '1970-01-01', l_shipdate::DATE) AS day,
        |    sum((l_extendedprice::DECIMAL(12,2) * (1 - l_discount::DECIMAL(12,2))
        |         * 10000)::BIGINT)::BIGINT AS rev_cents
        |  FROM lineitem GROUP BY 1)
        |SELECT day, rev_cents,
        |  sum(rev_cents) OVER (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)::BIGINT AS ma7_cents
        |FROM daily""".stripMargin,

    "q34_semi_anti_join" ->
      """SELECT c_custkey, 'has_orders' AS status FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS status FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q35_set_ops" ->
      """WITH vp AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |err AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |SELECT user_id, 'viewed_purchased_no_error' AS cohort
        |FROM (SELECT user_id FROM vp EXCEPT ALL SELECT user_id FROM err)""".stripMargin,

    "q29_lagged_ols" ->
      s"""SELECT
        |  ${slopeMilliSql("X1_0", "X2_0")} AS b_x2_x1_milli,
        |  ${slopeMilliSql("X3_0", "X4_0")} AS b_x4_x3_milli,
        |  ${slopeMilliSql("X2_0", "X3_1")} AS b_x3l1_x2_milli,
        |  ${slopeMilliSql("X4_0", "X1_2")} AS b_x1l2_x4_milli
        |FROM read_parquet('__GEN_DIR__/q29_lagged/*.parquet')""".stripMargin,

    "q53_typed_ols" ->
      s"""SELECT ${slopeMilliSql("X1_0", "X2_0")} AS b_x2_x1_milli
        |FROM read_parquet('__GEN_DIR__/q53_lagged/*.parquet')""".stripMargin,

    "q20_truth_links" -> OracleData.truthLinksSql
  )
}
