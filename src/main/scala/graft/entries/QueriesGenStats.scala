package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._
import graft.generate.Generate
import graft.ops.{AsOf, ExactStats, Lagged}
import graft.text.{Dedup, TextOps}
import graft.sim.Similarity

/** GenStats slice of [[SparkEntry.queries]] — mechanical split of the
  * single registry map; entry bodies are verbatim. */
private[graft] trait QueriesGenStats { this: SparkEntry.type =>

  private[graft] def queriesGenStats: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q29_lagged_ols" -> ((s, d) => {
      // OLS recovery of A1's declared lag coefficients via the lagged view +
      // regr_slope; the lagged projection is dumped so DuckDB regresses the
      // identical row set
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 5000 && c.nVars == 4 && c.maxLag == 2 && c.noiseType == "gaussian").get
      val wide = Generate.wideFast(s, Seq(cfg))
      val lagged = dumpGen(s, "q29_lagged",
        Lagged.laggedView(wide.select(col("configId"), col("t"),
          col("X1"), col("X2"), col("X3"), col("X4")), Seq("configId"), "t",
          Seq("X1", "X2", "X3", "X4"), 2))
      // ExactStats.slopeMilli, not round(regr_slope(...), 3): the regr_*
      // double sums are merge-order dependent (the r2 q30/q38 failure class);
      // milli-units ≡ the old 3dp rounding (400 ≡ 0.400)
      lagged.agg(
        ExactStats.slopeMilli(col("X1_0"), col("X2_0")).as("b_x2_x1_milli"),   // declared 0.4
        ExactStats.slopeMilli(col("X3_0"), col("X4_0")).as("b_x4_x3_milli"),   // declared 0.35
        ExactStats.slopeMilli(col("X2_0"), col("X3_1")).as("b_x3l1_x2_milli"), // declared 0.3
        ExactStats.slopeMilli(col("X4_0"), col("X1_2")).as("b_x1l2_x4_milli")) // declared 0.25
    }),

    // the typed Dataset UDAF surface through the driver contract: single-pass
    // mergeable OLS Aggregator == regr_slope over the same dumped rows
    "q53_typed_ols" -> ((s, d) => {
      import s.implicits._
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 5000 && c.nVars == 4 && c.maxLag == 2 && c.noiseType == "gaussian").get
      val wide = Generate.wideFast(s, Seq(cfg))
      // maxLag=0: the contemporaneous regression needs no lag columns, and
      // lag-1 columns would be dumped but never read by either engine
      val lagged = dumpGen(s, "q53_lagged",
        Lagged.laggedView(wide.select(col("configId"), col("t"), col("X1"), col("X2")),
          Seq("configId"), "t", Seq("X1", "X2"), 0))
      val pairs = lagged.select(col("X2_0").as[Double], col("X1_0").as[Double])
      // the exact-integer variant of the typed Aggregator: same single-pass
      // mergeable shape, but the buffer holds LONG/BigInt sums of micro-
      // quantized pairs, so any merge order finishes identically
      val slope: org.apache.spark.sql.Dataset[Long] =
        pairs.select(graft.ops.OlsAggregator.slopeMilli.toColumn)
      slope.toDF("b_x2_x1_milli")
    }),

    // structural integer contract (trend in exact micro-units, sin/cos args
    // as 24ths of a turn) — trig-double parity across engines is 1-ulp
    // unstable (r1 q31); GenerateSpec ties these integers to the numeric path
    "q31_trend_season" -> ((s, d) =>
      Generate.trendSeasonStructural(s, nVars = 8, n = 200, trendMicroPerVarT = 5000L)),

    "q37_regex_tokens" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
        size(TextOps.regexTokens(col("text"))).as("n_bpeish_tokens"),
        size(array_distinct(TextOps.regexTokens(col("text")))).as("n_distinct_bpeish"),
        size(TextOps.tokensCol(col("text"))).as("n_ws_tokens"))),

    "q36_asof_nearest" -> ((s, d) => {
      // the reference's literal nearest-lag semantics (§2.4-5): nearest in
      // ABSOLUTE time, which may be LATER than the probe
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      // one click per (user, µs) on both engines — DuckDB's ASOF pick among
      // duplicate timestamps is unspecified (same hardening as q54)
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id", "ts_us")
        .agg(min(col("event_id")).as("click_id"))
      AsOf.asofNearest(purchases, clicks, Seq("user_id"), "ts_us", Seq("click_id"))
        .select(col("user_id"), col("event_id"), col("asof_click_id").as("click_id"),
                col("asof_ts").as("click_ts_us"))
    }),

    // co-located fact-fact join: both sides bucketed by the join key at
    // write time → the join itself needs NO Exchange on either side
    // (PlanSpec pins exactly one Exchange: the final groupBy). The 100 TB
    // pattern for repeatedly-joined fact tables — the bucketed write is
    // paid once and amortized over every subsequent join; here it runs
    // in-query (mode overwrite) so the result is always fresh
    "q59_bucketed_join" -> ((s, d) => {
      // a fresh session's in-memory catalog forgets the table while its
      // warehouse directory survives — drop BOTH before the overwrite
      def freshBucketed(df: DataFrame, name: String, key: String): Unit = {
        s.sql(s"DROP TABLE IF EXISTS $name")
        // local-filesystem warehouse assumed (this harness); an object-store
        // warehouse would pass an explicit .option("path", ...) instead
        val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir")).getPath
        val dir = new java.io.File(wh, name)
        if (dir.exists)
          require(scala.reflect.io.Directory(dir).deleteRecursively(),
            s"cannot clear stale table location $dir")
        df.write.mode("overwrite").format("parquet")
          .bucketBy(8, key).sortBy(key).saveAsTable(name)
      }
      freshBucketed(lineitem(s, d).select("l_orderkey", "l_quantity"),
        "graft_li_bucketed", "l_orderkey")
      freshBucketed(orders(s, d).select("o_orderkey", "o_orderpriority"),
        "graft_ord_bucketed", "o_orderkey")
      s.table("graft_li_bucketed")
        .join(s.table("graft_ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))
    }),

    // forward as-of: each purchase joined to the EARLIEST click at-or-after
    // it — the symmetric third of the as-of family (backward q04, nearest
    // q36), mirrored by DuckDB's native forward ASOF (`ON p.ts <= c.ts`)
    "q54_asof_forward" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      // pre-dedup the right side to one click per (user, µs): DuckDB's ASOF
      // pick among duplicate timestamps is unspecified, so the contract
      // makes ties structurally impossible on both sides
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id", "ts_us")
        .agg(min(col("event_id")).as("click_id"))
      AsOf.asofForward(purchases, clicks, Seq("user_id"), "ts_us", Seq("click_id"))
        .select(col("user_id"), col("event_id"), col("asof_click_id").as("click_id"),
                col("asof_ts").as("click_ts_us"))
    }),

    // exact percentile is the oracle contract (sorts per group); the 100 TB
    // production path is approx_percentile (t-digest sketch, one pass, no
    // sort) — OpsSpec pins the pairing's accuracy
    "q32_quantiles" -> ((s, d) =>
      lineitem(s, d).groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
             round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
             round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95_price"))),

    "q33_moving_avg" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // exact integers end-to-end, but as LONG arithmetic: floor(x·100 + 0.5)
      // is an exact integer image of the 2-decimal doubles, and
      // cents·(100 − bp) equals the DECIMAL form's (price·(1−disc)·10000)
      // exactly — same integers, primitive codegen (the r2 DECIMAL multiply
      // over full lineitem regressed q33 2.6s → 6.1s)
      val daily = lineitem(s, d)
        .withColumn("day", datediff(col("l_shipdate"), lit("1970-01-01").cast("date")))
        .withColumn("cents", revenueUnits) // LONG sums safe here: per-DAY groups
        .groupBy("day")
        .agg(sum("cents").as("rev_cents"))
      val w = Window.orderBy(col("day")).rangeBetween(-6, 0)
      daily.withColumn("ma7_cents", sum("rev_cents").over(w))
        .select(col("day"), col("rev_cents"), col("ma7_cents"))
    }),

    "q34_semi_anti_join" -> ((s, d) => {
      val c = customer(s, d); val o = orders(s, d)
      val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_orders").as("status"))
      val noOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_orders").as("status"))
      withOrders.unionByName(noOrders)
    }),

    "q35_set_ops" -> ((s, d) => {
      val ev = events(s, d)
      def users(t: String) = ev.where(col("event_type") === t).select("user_id").distinct()
      users("view").intersect(users("purchase"))
        .exceptAll(users("error"))
        .withColumn("cohort", lit("viewed_purchased_no_error"))
    }),

    // -- generation engine (deterministic derivations, VALUES oracles) --
    "q20_truth_links" -> ((s, d) => {
      Generate.truthLinks(s)
        .toDF()
        .select(col("family"), col("nVars").as("n_vars"), col("maxLag").as("max_lag"),
                col("source"), col("lag"), col("target"), col("func"), col("coef"))
    })
  )
}
