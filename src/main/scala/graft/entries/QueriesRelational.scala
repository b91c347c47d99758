package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._
import graft.generate.Generate
import graft.ops.{AsOf, ExactStats, Lagged}
import graft.text.{Dedup, TextOps}
import graft.sim.Similarity

/** Relational slice of [[SparkEntry.queries]] — mechanical split of the
  * single registry map; entry bodies are verbatim. */
private[graft] trait QueriesRelational { this: SparkEntry.type =>

  private[graft] def queriesRelational: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- relational core --
    // money sums as exact LONG cents (source doubles carry exactly 2
    // decimals): a round() of an order-dependent double sum drifts across
    // engines as the sum grows — the integer sum is exact in any merge order
    // and its double image unique
    "q01_pricing_summary" -> ((s, d) => {
      lineitem(s, d)
        .where(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          sumCentsDollars(col("l_extendedprice")).as("sum_base_price"),
          revenueDollars.as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          // exact integer sum / count: avg(double) partial sums are merge-
          // order dependent (the r2 q30/q38 failure class)
          round(sum(cents(col("l_discount"))).cast("double") /
            (count(lit(1)).cast("double") * lit(100.0)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    "q02_revenue_by_nation" -> ((s, d) => {
      val li = lineitem(s, d); val o = orders(s, d)
      val c = customer(s, d); val n = nation(s, d); val r = region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(revenueDollars.as("revenue"),
             count(lit(1)).as("n_items"))
    }),

    // part/supplier star join: string-equality filter pushed to the part
    // scan, both dimensions broadcast, DECIMAL revenue
    "q51_brand_revenue" -> ((s, d) => {
      val li = lineitem(s, d)
      val p = part(s, d).where(col("p_type") === "ECONOMY")
      val sup = supplier(s, d); val n = nation(s, d)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy("p_brand", "n_name")
        .agg(revenueDollars.as("revenue"),
             count(lit(1)).as("n_items"),
             // exact cents sum, not round(avg(double)): the avg form hit a
             // HALF_UP boundary on first try (949.35625) — same trap as r1 q09
             sumCentsDollars(col("p_retailprice")).as("sum_retail"))
    }),

    "q03_lagged_projection" -> ((s, d) =>
      Lagged.laggedView(events(s, d).select("user_id", "event_id", "value"),
          Seq("user_id"), "event_id", Seq("value"), 2)
        .select(col("user_id"), col("event_id"),
          round(col("value_0"), 4).as("value_0"),
          round(col("value_1"), 4).as("value_1"),
          round(col("value_2"), 4).as("value_2"))),

    "q04_asof_join" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      // pre-dedup the right side to one view per (user, µs): ns→µs
      // truncation can collide timestamps, and DuckDB's ASOF pick among
      // duplicates is unspecified (same hardening as q54/q36)
      val views = ev.where(col("event_type") === "view")
        .groupBy("user_id", "ts_us")
        .agg(min(col("event_id")).as("view_id"),
             expr("min_by(value, event_id)").as("view_value"))
      AsOf.asofBackward(purchases, views, Seq("user_id"), "ts_us", Seq("view_id", "view_value"))
        .select(col("user_id"), col("event_id"),
          col("asof_view_id").as("view_id"),
          round(col("asof_view_value"), 4).as("view_value"))
    }),

    "q05_topk_per_group" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d).withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"),
                round(col("o_totalprice"), 4).as("o_totalprice"), col("rk"))
    }),

    "q06_summary_stats" -> ((s, d) => {
      // stddev's Welford merge is partition-order dependent; evaluate the
      // closed form from order-insensitive EXACT sums instead:
      //   l_quantity is integer-valued → Σx / Σx² are exact in double;
      //   l_extendedprice carries 2 decimals → exact LONG cents, Σc² in
      //   DECIMAL(38,0) (c² ~1e14 × 6e5 rows overflows LONG).
      val nd = count(lit(1)).cast("double")
      val q = col("l_quantity")
      val sq = sum(q); val sqq = sum(q * q)
      val pc = cents(col("l_extendedprice"))
      val sc = sum(pc.cast("decimal(38,0)")).cast("double")
      val scc = sum(pc.cast("decimal(38,0)") * pc.cast("decimal(38,0)")).cast("double")
      lineitem(s, d).agg(
        count(lit(1)).as("n"),
        round(sum(q) / count(lit(1)), 4).as("avg_qty"),
        round(sqrt((nd * sqq - sq * sq) / (nd * (nd - lit(1.0)))), 4).as("std_qty"),
        round(min(q), 4).as("min_qty"),
        round(max(q), 4).as("max_qty"),
        round(sum(pc.cast("decimal(38,0)")).cast("double") /
            (count(lit(1)).cast("double") * lit(100.0)), 4)
          .as("avg_price"),
        round(sqrt((nd * scc - sc * sc) / (nd * (nd - lit(1.0)))) / lit(100.0), 4)
          .as("std_price"))
    }),

    "q07_time_gaps" -> ((s, d) =>
      Lagged.timeGaps(events(s, d).withColumn("ts_us", expr("ts div 1000"))
          .select("user_id", "event_id", "ts_us"), Seq("user_id"), "ts_us")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
             // gaps are LONG micros: sum exactly, divide once (avg of the
             // per-row double quotient is merge-order dependent)
             round(sum("gap").cast("double") /
               (count(lit(1)).cast("double") * lit(1e6)), 4).as("avg_gap_s"),
             round(max("gap").cast("double") / lit(1e6), 4).as("max_gap_s"))),

    // -- dedup / text analysis --
    // the two-phase variant IS the benched entry: shuffle 8-byte xxhash64
    // first, re-shuffle only duplicate candidates' text — identical result to
    // the direct text-groupBy (which remains as its spec cross-check)
    "q08_exact_dedup" -> ((s, d) =>
      Dedup.exactDuplicateGroupsScalable(documents(s, d), "doc_id", "text"))
  )
}
