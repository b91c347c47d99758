package graft

/** Relational slice of [[SparkEntry.oracleSql]] — the DuckDB twins of
  * [[QueriesRelational]], split mechanically from the single map. */
private[graft] trait OraclesRelational { this: SparkEntry.type =>

  private[graft] def oracleSqlRelational: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::DOUBLE / 100.0 AS sum_base_price,
        |  $RevenueSql AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(sum(floor(l_discount * 100 + 0.5)::BIGINT)::DOUBLE
        |        / (count(*)::DOUBLE * 100.0), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      s"""SELECT r_name, n_name,
        |  $RevenueSql AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q51_brand_revenue" ->
      s"""SELECT p_brand, n_name,
        |  $RevenueSql AS revenue,
        |  count(*) AS n_items,
        |  sum(floor(p_retailprice * 100 + 0.5)::BIGINT)::DOUBLE / 100.0 AS sum_retail
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_type = 'ECONOMY'
        |GROUP BY p_brand, n_name""".stripMargin,

    "q03_lagged_projection" ->
      """SELECT user_id, event_id,
        |  round(value_0, 4) AS value_0, round(value_1, 4) AS value_1,
        |  round(value_2, 4) AS value_2
        |FROM (
        |  SELECT user_id, event_id, value AS value_0,
        |    lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS value_1,
        |    lag(value, 2) OVER (PARTITION BY user_id ORDER BY event_id) AS value_2
        |  FROM events)
        |WHERE value_0 IS NOT NULL AND value_1 IS NOT NULL AND value_2 IS NOT NULL""".stripMargin,

    "q04_asof_join" ->
      """SELECT p.user_id, p.event_id, v.view_id, round(v.view_value, 4) AS view_value
        |FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS ts_us,
        |                       min(event_id) AS view_id,
        |                       min_by(value, event_id) AS view_value
        |                FROM events WHERE event_type = 'view'
        |                GROUP BY user_id, epoch_us(ts)) v
        |ON p.user_id = v.user_id AND p.ts_us >= v.ts_us""".stripMargin,

    "q05_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, round(o_totalprice, 4) AS o_totalprice, rk
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |      FROM orders)
        |WHERE rk <= 3""".stripMargin,

    "q06_summary_stats" -> {
      // closed-form stddev from exact sums — formula text mirrors the Spark
      // side so both engines run the same double ops on the same integers
      val cents = "floor(l_extendedprice * 100 + 0.5)::BIGINT"
      s"""SELECT count(*) AS n,
        |  round(sum(l_quantity) / count(*), 4) AS avg_qty,
        |  round(sqrt((count(*)::DOUBLE * sum(l_quantity * l_quantity)
        |    - sum(l_quantity) * sum(l_quantity))
        |    / (count(*)::DOUBLE * (count(*)::DOUBLE - 1.0))), 4) AS std_qty,
        |  round(min(l_quantity), 4) AS min_qty,
        |  round(max(l_quantity), 4) AS max_qty,
        |  round(sum($cents)::DOUBLE / (count(*)::DOUBLE * 100.0), 4) AS avg_price,
        |  round(sqrt((count(*)::DOUBLE * sum($cents::HUGEINT * $cents::HUGEINT)::DOUBLE
        |    - sum($cents)::DOUBLE * sum($cents)::DOUBLE)
        |    / (count(*)::DOUBLE * (count(*)::DOUBLE - 1.0))) / 100.0, 4) AS std_price
        |FROM lineitem""".stripMargin
    },

    "q07_time_gaps" ->
      """SELECT user_id, count(*) AS n_gaps,
        |  round(sum(gap)::DOUBLE / (count(*)::DOUBLE * 1e6), 4) AS avg_gap_s,
        |  round(max(gap)::DOUBLE / 1e6, 4) AS max_gap_s
        |FROM (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap
        |  FROM events)
        |WHERE gap IS NOT NULL
        |GROUP BY user_id""".stripMargin,

    "q08_exact_dedup" ->
      """SELECT min(doc_id) AS canonical_id, count(*) AS group_size
        |FROM documents GROUP BY text HAVING count(*) > 1""".stripMargin
  )
}
