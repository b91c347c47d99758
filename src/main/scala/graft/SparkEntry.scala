package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._
import graft.generate.Generate
import graft.ops.{AsOf, ExactStats, Lagged}
import graft.text.{Dedup, TextOps}
import graft.sim.Similarity

/** Driver contract: one `queries` entry per implemented operator (SURVEY §3),
  * each with an equivalent DuckDB oracle in `oracleSql`. Column names are
  * aligned on both sides; double outputs are rounded identically.
  */
object SparkEntry {

  private def t(sfDir: String, name: String) = s"$sfDir/$name.parquet"

  /** Where generated-data queries (q28/q29/q30/q38) persist their kernel
    * output so the DuckDB oracle aggregates the EXACT same rows — the kernel
    * itself is not SQL-expressible, but its materialization is. Verify sets
    * -Dgraft.gen.dir under its outDir and substitutes the absolute path for
    * `__GEN_DIR__` in oracle_sql.json.
    */
  def genDir: String =
    new java.io.File(sys.props.getOrElse("graft.gen.dir", "target/gen_cache")).getAbsolutePath

  /** Materialize a generated DataFrame to parquet and read it back, so the
    * downstream aggregation (Spark) and the oracle (DuckDB) share one input.
    */
  private def dumpGen(s: SparkSession, name: String, df: DataFrame): DataFrame = {
    val path = s"$genDir/$name"
    df.write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }

  /** Full-grid generation digest shared by q177 and the `_gen` artifact
    * row: every one of the 2,592 sweep configs pinned individually.
    */
  private def sweepDigest(s: SparkSession, dumpName: String): DataFrame = {
    val sweep = Generate.wideFast(s, Grid.all())
      .select(col("configId"), col("family"), col("X1"), col("time"),
        col("maskBits"))
    dumpGen(s, dumpName, sweep)
      .groupBy("configId", "family")
      .agg(count(lit(1)).as("n_rows"),
        // clamp to ±1e6 BEFORE quantizing: a handful of D2/D2C grid cells
        // diverge to ±Inf (faithful to the reference recurrences), and
        // floor(Inf·1e6) has no integer. least/greatest treat Inf (and
        // NaN, which sorts above Inf) identically on both engines, so the
        // clamped sum stays a bitwise cross-engine integer
        ExactStats.sumMicro(greatest(least(col("X1"), lit(1e6)), lit(-1e6)))
          .as("sum_x1c_micro"),
        sum(when(abs(col("X1")) > 1e6, 1L).otherwise(0L)).as("n_clipped"),
        ExactStats.sumMicro(col("time")).as("sum_time_micro"),
        sum("maskBits").as("mask_sum"))
      .withColumnRenamed("configId", "config_id")
  }

  private def lineitem(s: SparkSession, d: String) = s.read.parquet(t(d, "lineitem"))
  private def orders(s: SparkSession, d: String) = s.read.parquet(t(d, "orders"))
  private def customer(s: SparkSession, d: String) = s.read.parquet(t(d, "customer"))
  private def nation(s: SparkSession, d: String) = s.read.parquet(t(d, "nation"))
  private def region(s: SparkSession, d: String) = s.read.parquet(t(d, "region"))
  private def events(s: SparkSession, d: String) = {
    // events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark 4 only
    // reads as a raw long ns under the legacy flag) and, since the round-6
    // testdata regen, as plain TIMESTAMP_NTZ(us). Both arrivals normalize
    // here to the same long-ns contract every consumer assumes
    // (ts div 1000 == DuckDB epoch_us). timestampdiff is timezone-free, so
    // the NTZ path cannot drift with the session zone
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.sources.Events.tsToLongNs(s.read.parquet(t(d, "events")))
  }
  private def part(s: SparkSession, d: String) = s.read.parquet(t(d, "part"))
  private def supplier(s: SparkSession, d: String) = s.read.parquet(t(d, "supplier"))
  private def documents(s: SparkSession, d: String) = s.read.parquet(t(d, "documents"))
  private def embeddings(s: SparkSession, d: String) = s.read.parquet(t(d, "embeddings"))

  /** floor(x·100 + 0.5) as LONG — the exact integer image of a 2-decimal
    * source double (cents / basis points). The shared quantization every
    * money contract uses; change it here and the DuckDB mirrors in lockstep.
    */
  private def cents(c: Column): Column = floor(c * 100 + lit(0.5))

  /** Revenue as exact LONG 1e-4-dollar units:
    * cents · (100 − bp) ≡ price·(1−disc)·10000 of the former DECIMAL form —
    * same integers, but primitive-long per-row codegen with no Decimal
    * allocation.
    */
  private def revenueUnits: Column =
    cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))

  /** Σ revenueUnits rendered in dollars — the shared money contract. The
    * aggregation buffer is DECIMAL(38,0): units reach ~3.6e8/row, so a
    * low-cardinality group over ~1e12 rows would overflow a LONG sum (ANSI
    * error at best); only the SUM widens — per-row work stays long.
    * DuckDB's mirror sums into HUGEINT, identically exact.
    */
  private def revenueDollars: Column =
    sum(revenueUnits.cast("decimal(38,0)")).cast("double") / lit(10000.0)

  /** Overflow-safe Σ cents in dollars (same reasoning as revenueDollars). */
  private def sumCentsDollars(c: Column): Column =
    sum(cents(c).cast("decimal(38,0)")).cast("double") / lit(100.0)

  /** The DuckDB mirror of `revenueDollars`. */
  private val RevenueSql =
    "sum((floor(l_extendedprice * 100 + 0.5) * " +
      "(100 - floor(l_discount * 100 + 0.5)))::BIGINT)::DOUBLE / 10000.0"

  /** The same expression in Spark SQL syntax (q27/q52 run through spark.sql);
    * Spark's FLOOR(double) is already BIGINT, so the per-row product stays
    * in LONG — only the sum widens to DECIMAL(38,0) (see revenueDollars).
    */
  private val SparkRevenueSql =
    """(CAST(sum(CAST(FLOOR(l_extendedprice * 100 + 0.5) *
      |              (100 - FLOOR(l_discount * 100 + 0.5)) AS DECIMAL(38,0)))
      |      AS DOUBLE) / 10000.0)""".stripMargin

  // -- DuckDB mirrors of graft.ops.ExactStats: identical formula text over
  //    HUGEINT sums of the same micro-quantized integers, so both engines
  //    divide the same two exact integers regardless of partition order --

  /** Σ floor(x·1e6) as BIGINT (mirror of ExactStats.sumMicro). */
  private def sumMicroSql(x: String): String =
    s"sum(floor($x * 1e6)::BIGINT)::BIGINT"

  private def olsPartsSql(y: String, x: String): (String, String, String) = {
    val both = s"($y IS NOT NULL AND $x IS NOT NULL)"
    val xm = s"(CASE WHEN $both THEN floor($x * 1e6)::HUGEINT END)"
    val ym = s"(CASE WHEN $both THEN floor($y * 1e6)::HUGEINT END)"
    val n = s"sum(CASE WHEN $both THEN 1 ELSE 0 END)::HUGEINT"
    (n, xm, ym)
  }

  /** Mirror of ExactStats.slopeMilli. */
  private def slopeMilliSql(y: String, x: String): String = {
    val (n, xm, ym) = olsPartsSql(y, x)
    s"floor(($n * sum($xm * $ym) - sum($xm) * sum($ym))::DOUBLE / " +
      s"($n * sum($xm * $xm) - sum($xm) * sum($xm))::DOUBLE * 1000.0 + 0.5)::BIGINT"
  }

  /** Mirror of ExactStats.interceptMilli. */
  private def interceptMilliSql(y: String, x: String): String = {
    val (n, xm, ym) = olsPartsSql(y, x)
    s"floor((sum($ym) * sum($xm * $xm) - sum($xm) * sum($xm * $ym))::DOUBLE / " +
      s"($n * sum($xm * $xm) - sum($xm) * sum($xm))::DOUBLE / 1000.0 + 0.5)::BIGINT"
  }

  /** Flagship: generation kernel fan-out → per-family summary (driver smoke). */
  def entry(spark: SparkSession): DataFrame = {
    val cfgs = Catalog.families.flatMap(f => Grid.forFamily(f).take(2))
    Generate.wide(Generate.series(spark, cfgs))
      .groupBy("family")
      .agg(count(lit(1)).as("rows"), avg("X1").as("mean_x1"))
  }

  // ---------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      Dedup.exactDuplicateGroupsScalable(documents(s, d), "doc_id", "text")),

    // exact-integer contract: sum of distinct-token counts, not a rounded
    // average — round(avg) landed on a HALF_UP boundary at sf0.1 (r1 q09)
    "q09_token_stats" -> ((s, d) =>
      TextOps.tokenStats(documents(s, d))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             sum("n_tokens").as("total_tokens"),
             sum("n_distinct_tokens").as("sum_distinct"))),

    "q10_quality_score" -> ((s, d) =>
      TextOps.qualityScore(documents(s, d))
        .select(col("doc_id"), col("n_tokens"), col("mean_token_len"),
                col("stopword_ratio"), col("type_token_ratio"), col("quality_score"))),

    "q11_langid" -> ((s, d) =>
      TextOps.langId(documents(s, d))
        .groupBy("lang_pred").agg(count(lit(1)).as("n_docs"))),

    "q12_fingerprint" -> ((s, d) =>
      TextOps.fingerprints(documents(s, d)).select("doc_id", "fingerprint")),

    // prefix-filtered AllPairs (exact result) with a REAL stop-shingle cap —
    // the r1 entry passed maxDocFreq=100000, disabling its own skew guard
    "q13_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(documents(s, d), "doc_id", "text", n = 3,
        minJaccard = 0.8, maxDocFreq = 1000L)),

    // -- similarity search --
    "q14_cosine_topk" -> ((s, d) => {
      val emb = embeddings(s, d)
      Similarity.cosineTopK(emb, emb.where(col("vec_id") < 10), "vec_id", "embedding", 5)
    }),

    // IVF ANN: coarse-quantizer cells (first 16 ids as centroids), queries
    // probe 4 cells — candidates meet via one equi-join on cell_id, never
    // Q×N; the oracle mirrors the assignment ranking exactly (raw-double
    // cosine order with cell-id tie-break, identical arithmetic both sides)
    "q49_ivf_topk" -> ((s, d) => {
      val emb = embeddings(s, d)
      Similarity.ivfCosineTopK(emb, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", 5, nCells = 16, nProbe = 4)
    }),

    "q25_sessionize" -> ((s, d) =>
      graft.ops.Sessionize.sessionStats(
        events(s, d).withColumn("ts_us", expr("ts div 1000"))
          .select("user_id", "event_id", "ts_us"),
        "user_id", "ts_us", gapUs = 1800L * 1000000L)
        .select(col("user_id"), col("session_id"), col("n_events"),
                col("start_us"), col("end_us"), col("duration_us"))),

    "q26_media_features" -> ((s, d) => {
      import graft.multimodal.Multimodal
      Multimodal.extractFeatures(Multimodal.mediaFromDocuments(documents(s, d)))
        .toDF()
        .select(col("mediaId").as("media_id"), col("kind"),
                col("nBytes").as("n_bytes"), col("contentHash").as("content_hash"),
                col("width"), col("height"),
                round(col("meanIntensity"), 6).as("mean_intensity"))
    }),

    // REAL image decode: one genuine PNG per document (synthesized from the
    // deterministic position-hashed raster), decoded through the JDK's own
    // ImageIO codec, with exact integer raster features. The oracle predicts
    // every pixel from the same formula WITHOUT a codec — so a wrong decode
    // (dims, layout, values) hash-fails. This de-stubs the one weak
    // component from round 5; decodeStub survives only as a test double
    "q176_image_decode" -> ((s, d) => {
      import graft.multimodal.Multimodal
      Multimodal.imageFeatures(Multimodal.synthImageCorpus(documents(s, d)))
        .toDF()
        .select(col("mediaId").as("media_id"), col("width"), col("height"),
          col("nPixels").as("n_pixels"), col("sumPix").as("sum_pix"),
          col("momentPix").as("moment_pix"), col("meanMilli").as("mean_milli"))
    }),

    // REAL audio decode, the q176 pattern for sound: one genuine WAV per
    // document (JDK javax.sound.sampled codec — unsigned 8-bit PCM), exact
    // integer features incl. midpoint crossings (the order-sensitive signal
    // check); the oracle re-derives every sample codec-free. With q176 this
    // leaves only VIDEO codecs stubbed — nothing ships one in a bare JVM
    "q181_audio_decode" -> ((s, d) => {
      import graft.multimodal.Multimodal
      Multimodal.audioFeatures(Multimodal.synthAudioCorpus(documents(s, d)))
        .toDF()
        .select(col("mediaId").as("media_id"), col("nSamples").as("n_samples"),
          col("sumAmp").as("sum_amp"), col("momentAmp").as("moment_amp"),
          col("nMidCrossings").as("n_mid_crossings"),
          col("meanMilli").as("mean_milli"))
    }),

    // REAL video decode, closing the multimodal family: one genuine RIFF
    // AVI per document (spec-correct avih/strh/strf headers, PNG frames),
    // demuxed by a generic RIFF chunk walker and frame-decoded through the
    // same ImageIO codec as q176. Features are frame-ORDER-sensitive
    // (Σ f·pixel) and alignment-sensitive (Σ|frame_f − frame_{f−1}|); the
    // oracle re-derives every pixel of every frame codec-free
    "q182_video_decode" -> ((s, d) => {
      import graft.multimodal.Multimodal
      Multimodal.videoFeatures(Multimodal.synthVideoCorpus(documents(s, d)))
        .toDF()
        .select(col("mediaId").as("media_id"), col("nFrames").as("n_frames"),
          col("width"), col("height"), col("nPixels").as("n_pixels"),
          col("sumPix").as("sum_pix"), col("frameMoment").as("frame_moment"),
          col("motionAbs").as("motion_abs"), col("meanMilli").as("mean_milli"))
    }),

    // frame sampling over video-ish payloads: 64-byte frames, every 2nd —
    // the chunk/sample plumbing is real raw-buffer logic (only pixel decode
    // is stubbed); oracle slices the same frames with substr
    "q50_media_frames" -> ((s, d) => {
      import graft.multimodal.Multimodal
      Multimodal.frameFeatures(Multimodal.mediaFromDocuments(documents(s, d)),
          frameBytes = 64, everyK = 2)
        .toDF()
        .select(col("mediaId").as("media_id"), col("frameIdx").as("frame_idx"),
                col("nBytes").as("n_bytes"), col("contentHash").as("content_hash"),
                round(col("meanIntensity"), 6).as("mean_intensity"))
    }),

    "q27_rollup_revenue" -> ((s, d) => {
      lineitem(s, d).createOrReplaceTempView("q27_lineitem")
      orders(s, d).createOrReplaceTempView("q27_orders")
      customer(s, d).createOrReplaceTempView("q27_customer")
      nation(s, d).createOrReplaceTempView("q27_nation")
      region(s, d).createOrReplaceTempView("q27_region")
      // BROADCAST hints: without them the SQL path shuffle-joins the three
      // dimension tables that q02 broadcasts (r1 bench: 12.3s vs 2.3s on the
      // identical join tree). Lineitem is pre-aggregated to ORDER grain below
      // the join — Catalyst does not push aggregates through joins itself,
      // and each order maps to exactly one (r_name, n_name), so summing
      // per-order partials is exact. At 100 TB this shrinks the probe side
      // of the orders join ~4× (avg lineitems/order) BEFORE it shuffles, and
      // the ROLLUP's 3× Expand runs over order-grain rows instead of
      // lineitem-grain; the groupBy's hash partitioning on l_orderkey is
      // reused by the join, so lineitem still shuffles exactly once.
      // Per-order money stays in BIGINT (an order has ≤7 items, ≤~1e11
      // units each); only the cross-order sum widens to DECIMAL(38,0), the
      // same overflow contract as revenueDollars.
      s.sql(
        s"""WITH li AS (
          |  SELECT l_orderkey,
          |    sum(CAST(FLOOR(l_extendedprice * 100 + 0.5) *
          |             (100 - FLOOR(l_discount * 100 + 0.5)) AS BIGINT)) AS units,
          |    count(*) AS n
          |  FROM q27_lineitem GROUP BY l_orderkey)
          |SELECT /*+ BROADCAST(q27_customer, q27_nation, q27_region) */
          |  r_name, n_name,
          |  CAST(sum(CAST(units AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS revenue,
          |  sum(n) AS n_items
          |FROM li
          |JOIN q27_orders ON l_orderkey = o_orderkey
          |JOIN q27_customer ON o_custkey = c_custkey
          |JOIN q27_nation ON c_nationkey = n_nationkey
          |JOIN q27_region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)""".stripMargin)
    }),

    // GROUPING SETS (beyond q27's ROLLUP): independent per-region and
    // per-priority totals plus the grand total in ONE pass over the join —
    // at 100 TB this replaces three separate aggregation jobs
    "q52_grouping_sets" -> ((s, d) => {
      val li = lineitem(s, d); val o = orders(s, d)
      val c = customer(s, d); val n = nation(s, d); val r = region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .createOrReplaceTempView("q52_joined")
      s.sql(
        s"""SELECT r_name, o_orderpriority,
          |  $SparkRevenueSql AS revenue,
          |  count(*) AS n_items
          |FROM q52_joined
          |GROUP BY GROUPING SETS ((r_name), (o_orderpriority), ())""".stripMargin)
    }),

    // -- descriptive stats over GENERATED data (R12). DuckDB cannot run the
    //    kernel, but it CAN aggregate the kernel's materialized output: each
    //    query dumps its generated input to __GEN_DIR__ and both engines
    //    aggregate the same parquet (full hash oracle, not rows-only) --
    "q28_generated_missing_stats" -> ((s, d) => {
      val cfgs = Seq("D1", "D1C", "D2", "D2C", "D3", "D3C").map(f =>
        Grid.forFamily(f).find(c => c.nPoints == 3000 && c.nVars == 8 && c.maxLag == 2).get)
      val wide = dumpGen(s, "q28_missing",
        Generate.missingView(Generate.wideFast(s, cfgs)))
      // exact integer sum / exact count, divided identically on both sides
      val aggs = count(lit(1)).as("n_rows") +: (1 to 8).map(i =>
        round(sum(col(s"X$i").isNull.cast("int")).cast("double") / count(lit(1)), 3)
          .as(s"miss_x$i"))
      wide.groupBy("family").agg(aggs.head, aggs.tail: _*)
    }),

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
    }),

    "q21_grid_configs" -> ((s, d) => {
      import s.implicits._
      s.createDataset(Grid.all()).toDF()
        .select(col("family"), col("nPoints").as("n_points"), col("nVars").as("n_vars"),
                col("maxLag").as("max_lag"), col("noiseType").as("noise_type"),
                col("mixRatio").as("mix_ratio"), col("mcarProb").as("mcar_prob"),
                col("blockProb").as("block_prob"))
    }),

    // salient terms per document: the tf·idf ordering as pure integers
    // (tf desc, df asc, token asc) — no cross-engine log parity needed
    "q60_salient_terms" -> ((s, d) =>
      TextOps.topTermsPerDoc(documents(s, d), "doc_id", "text", k = 3)),

    // within-document repetition (Gopher-style duplicate-n-gram filter):
    // pure integer contract — repetitive ⇔ 5·(total−distinct) > total
    "q57_repetition_filter" -> ((s, d) =>
      TextOps.repetitionCounts(documents(s, d), "doc_id", "text", n = 3)
        .withColumn("repetitive",
          ((col("n_shingles") - col("n_distinct_shingles")) * 5 >
            col("n_shingles")).cast("int"))),

    // benchmark decontamination: docs sharing 3-grams with the "benchmark"
    // probe slice (doc_id ≡ 0 mod 50) and how many — exact-overlap check a
    // training pipeline runs before every corpus release
    "q58_contamination" -> ((s, d) => {
      val docs = documents(s, d)
      TextOps.contaminationCounts(
        docs.where(pmod(col("doc_id"), lit(50)) =!= 0),
        docs.where(pmod(col("doc_id"), lit(50)) === 0),
        "doc_id", "text", n = 3)
    }),

    "q15_minhash_signatures" -> ((s, d) =>
      Dedup.minhashSignatures(documents(s, d), "doc_id", "text", n = 3, numHashes = 16)
        .withColumnRenamed("id", "doc_id")),

    // LSH banding via the deterministic polynomial bucket — fully
    // oracle-checked (r1 used Spark's Murmur3 hash(), forcing rows-only)
    "q16_minhash_pairs" -> ((s, d) =>
      Dedup.minhashLshPairs(documents(s, d), "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, minEstJaccard = 0.25)),

    // dedup CLUSTERING: transitive closure of the q16 LSH pairs via
    // large-star/small-star contractions (O(log n) distributed rounds, no
    // driver-side graph); every doc gets its component (= min doc_id in the
    // cluster, singletons label themselves), the cluster size, and the
    // canonical-keeper flag a dedup pipeline filters on
    "q61_dedup_clusters" -> ((s, d) => {
      val docs = documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, minEstJaccard = 0.25)
      val comp = graft.ops.ConnectedComponents.components(pairs, "id_a", "id_b")
      val labeled = docs.select(col("doc_id"))
        .join(comp, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
      val sizes = labeled.groupBy("component").agg(count(lit(1)).as("csize"))
      labeled.join(sizes, Seq("component"))
        .select(col("doc_id"), col("component"), col("csize"),
          when(col("doc_id") === col("component"), 1).otherwise(0).as("keep"))
    }),

    // deterministic stratified sampling, keyed on CONTENT (the q12 rolling-
    // hash fingerprint): reproducible across re-runs/re-partitions and
    // dedup-consistent (byte-identical dups sample identically) — the way a
    // 100 TB corpus pipeline samples, vs df.sample()'s task-order RNG. The
    // xxhash64 production variant is spec-tested (not SQL-mirrorable).
    "q62_stratified_sample" -> ((s, d) =>
      graft.text.Sampling.stratifiedContentSample(documents(s, d), "text", "lang",
        Map("en" -> 200, "zh" -> 100), defaultPermille = 50)
        .select(col("doc_id"), col("lang"), col("sample_bucket"))),

    // concat-and-chunk sequence packing placement (ctx=256, 8 shards): the
    // per-shard prefix sum is the only sequential dependency — shards scale
    // with the data, so no global single-partition window ever exists
    "q63_sequence_packing" -> ((s, d) =>
      graft.text.Packing.packPlacement(documents(s, d), "doc_id", "text",
        ctxLen = 256, nShards = 8)),

    // curation funnel: cumulative survival through langid → length bounds →
    // repetition filter, ONE corpus scan (conditional aggregates), not one
    // scan per stage. Integer-only predicates (q57's scaled-ratio trick).
    "q64_quality_funnel" -> ((s, d) =>
      graft.ops.Funnel.retention(TextOps.langId(documents(s, d)), Seq(
        "lang_en" -> Curation.langEn,
        "len_ok" -> Curation.lenOk,
        "not_repetitive" -> Curation.notRepetitive))),

    // one k-means Lloyd step (k=8 seeded from the corpus): broadcast
    // assignment reduced map-side, centroid update as exact per-dim integer
    // sums — the update shuffle is O(tasks·k·d), independent of corpus size
    "q65_kmeans_step" -> ((s, d) =>
      graft.sim.Clustering.kmeansStepStats(embeddings(s, d), "vec_id",
        "embedding", k = 8)),

    // the curation pipeline END-TO-END, one decision row per document:
    // exact-dup canonicalization (window by text — the only shuffle),
    // language, integer length bounds, repetition, and the deterministic
    // content sample, composed exactly as a user would chain the library's
    // ops before writing a training corpus. One scan, one shuffle, all
    // flags integer.
    "q66_curation_decisions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("text")).orderBy(col("doc_id"))
      TextOps.langId(documents(s, d))
        .withColumn("is_canonical",
          (row_number().over(w) === 1).cast("int"))
        .withColumn("lang_ok", Curation.langEn.cast("int"))
        .withColumn("len_ok", Curation.lenOk.cast("int"))
        .withColumn("not_repetitive", Curation.notRepetitive.cast("int"))
        .withColumn("sampled",
          (pmod(TextOps.fingerprint(col("text")), lit(1000L)) < 700).cast("int"))
        .withColumn("keep", (col("is_canonical") === 1 && col("lang_ok") === 1 &&
          col("len_ok") === 1 && col("not_repetitive") === 1 &&
          col("sampled") === 1).cast("int"))
        .select("doc_id", "is_canonical", "lang_ok", "len_ok",
          "not_repetitive", "sampled", "keep")
    }),

    // temperature (α=0.5) language rebalancing: per-stratum target counts
    // and the permille rate q62's sampler consumes. sqrt is the one
    // non-integer step — IEEE-correctly-rounded in both engines (a general
    // pow(x,α) is not, across libms)
    "q67_mixing_targets" -> ((s, d) =>
      graft.text.Mixing.sqrtTemperatureTargets(documents(s, d), "lang")),

    // PII scrub over a corpus with contacts synthesized IN-QUERY (the word-
    // salad corpus has zero digits/@ — both engines append the identical
    // deterministic contact strings, so matches are real and non-trivial);
    // the redacted text is checked bit-for-bit via its fingerprint
    "q68_pii_scrub" -> ((s, d) => {
      val synth = concat(col("text"),
        when(pmod(col("doc_id"), lit(3L)) === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(4L)) === 0,
          concat(lit(" call 555-"),
            lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
          .otherwise(lit("")))
      TextOps.piiScrub(
        documents(s, d).withColumn("text_pii", synth), "doc_id", "text_pii")
    }),

    // overlapping-window chunking (chunk=64 tokens, stride=48): the chunk
    // table a RAG/embedding index consumes, each chunk identified by the
    // bit-identical rolling-hash fingerprint of its re-joined text
    "q69_doc_chunks" -> ((s, d) =>
      graft.text.Packing.chunkDocs(documents(s, d), "doc_id", "text",
        chunkTokens = 64, strideTokens = 48)),

    "q17_simhash" -> ((s, d) =>
      Dedup.simhash(documents(s, d), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    "q18_stream_window" -> ((s, d) =>
      graft.streaming.StreamAgg.eventsWindowed(s, d, windowSec = 300L,
        queryName = s"graft_stream_${System.nanoTime()}")),

    // the same windowed aggregation through ≥2 micro-batches (median-split
    // source files, maxFilesPerTrigger=1): cross-batch window-state merge;
    // complete mode ⇒ identical final table, so the oracle is q18's
    "q56_stream_window_multibatch" -> ((s, d) =>
      graft.streaming.StreamAgg.eventsWindowedMultiBatch(s, d, windowSec = 300L,
        splitDir = s"$genDir/events_split",
        queryName = s"graft_stream_mb_${System.nanoTime()}")),

    // the bucketed LSH path IS the benched/oracled entry (the r1 entry was
    // the O(N²) crossJoin — a scale-killer); the oracle mirrors the seeded
    // hyperplane buckets exactly, and SimilaritySpec checks planted-pair
    // recall plus LSH ⊆ exact containment
    "q19_embedding_neardups" -> ((s, d) =>
      Similarity.embeddingNearDupsLsh(
        embeddings(s, d).where(col("vec_id") < 1000), "vec_id", "embedding",
        dim = 64, minCosine = 0.2, nBits = 8, seed = 42L)),

    "q22_graph_metrics" -> ((s, d) => {
      val links = Generate.truthLinks(s).toDF()
        .select(col("family"), concat_ws("_", col("nVars"), col("maxLag")).as("graph_id"),
                col("nVars").as("n_vars"), col("maxLag").as("max_lag"),
                col("source"), col("target"), col("lag"))
      def side(fam: String) = links.where(col("family") === fam)
        .select("graph_id", "source", "target", "lag").distinct()
        .withColumnRenamed("graph_id", "graphId")
      val truth = side("A1")
      val pred = side("B2")
      val totals = links.where(col("family") === "A1")
        .select(col("graph_id").as("graphId"),
          (col("n_vars") * col("n_vars") * (col("max_lag") + 1)).as("total")).distinct()
      graft.metrics.Metrics.f1(graft.metrics.Metrics.tprFdr(
          graft.metrics.Metrics.confusion(truth, pred, totals)))
        .select(col("graphId").as("graph_id"), col("tp"), col("fp"), col("fn"), col("tn"),
          round(col("tpr"), 6).as("tpr"), round(col("fdr"), 6).as("fdr"),
          round(col("f1"), 6).as("f1"))
    }),

    "q23_graph_shd" -> ((s, d) => {
      val links = Generate.truthLinks(s).toDF()
        .select(col("family"), concat_ws("_", col("nVars"), col("maxLag")).as("graphId"),
                col("source"), col("target"), col("lag"))
      def side(fam: String) = links.where(col("family") === fam)
        .select("graphId", "source", "target", "lag").distinct()
      val xor = graft.metrics.Metrics.shdXor(side("A1"), side("B2"))
      val structural = graft.metrics.Metrics.shdStructural(side("A1"), side("B2"))
      xor.join(structural, Seq("graphId"))
        .select(col("graphId").as("graph_id"), col("shd"), col("shd_structural"))
    }),

    "q24_graph_tensor" -> ((s, d) => {
      val links = Generate.truthLinks(s).toDF()
        .where(col("family").isin("A1", "A1C"))
        .select(col("family"), col("nVars").as("n_vars"), col("maxLag").as("max_lag"),
                col("source"), col("lag"), col("target"), col("func"), col("coef"))
      Generate.tensorCells(links)
    }),

    "q42_json_extract" -> ((s, d) =>
      events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             sum("k").as("sum_k"),
             round(avg("k"), 4).as("avg_k"),
             max("k").as("max_k"))),

    "q41_ordered_limit" -> ((s, d) =>
      lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)
        .select(col("l_orderkey"), col("l_linenumber"),
                round(col("l_extendedprice"), 4).as("l_extendedprice"))),

    // stateful streaming sessionization under the watermark-FINALITY
    // contract: a session is emitted exactly when the watermark passes
    // end + gap (the no-data microbatch advances it to maxEventTime − 1h and
    // fires the timeouts), so the emitted set is a pure function of the data
    // and the final watermark — the oracle models it exactly, and the same
    // oracle holds for any batch decomposition (q55)
    "q40_stream_sessions" -> ((s, d) =>
      graft.streaming.StreamSession.sessionizeEvents(s, d, gapUs = 1800L * 1000000L,
        queryName = s"graft_sess_${System.nanoTime()}").toDF()
        .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"),
                col("sum_value_micro"))),

    // the session pipeline through ≥2 micro-batches: cross-batch state carry,
    // cross-batch session merge at the split boundary, mid-stream watermark
    // advance — under the finality contract the emitted set is identical to
    // q40's, so both share one oracle
    "q55_stream_sessions_multibatch" -> ((s, d) =>
      graft.streaming.StreamSession.sessionizeEventsMultiBatch(s, d,
        gapUs = 1800L * 1000000L, splitDir = s"$genDir/events_split",
        queryName = s"graft_sess_mb_${System.nanoTime()}").toDF()
        .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"),
                col("sum_value_micro"))),

    "q39_pivot_events" -> ((s, d) =>
      events(s, d).groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("user_id"), col("click"), col("error"),
                col("purchase"), col("signup"), col("view"))),

    // -- skew tooling as first-class queries (results identical to the plain
    //    formulations the oracles state) --
    // exact distinct count under key skew: per-bucket dedup over a disjoint
    // value-space slice, then sum — never one reducer per hot key
    "q47_skew_distinct" -> ((s, d) =>
      graft.ops.Salted.bucketedDistinctCount(
        events(s, d).select("event_type", "user_id"),
        Seq("event_type"), "user_id", buckets = 8)),

    "q48_salted_join" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
      graft.ops.Salted.saltedJoin(ev, purchases, "user_id", saltFactor = 8)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("n_purchases").as("sum_purch"))
    }),

    // the AQE skew-split path, demonstrated end-to-end: a deliberately
    // skewed join key (90% of events collapse onto k=0) through a
    // merge-HINTED shuffle join — at scale the dimension side wouldn't
    // broadcast, and the hot partition is exactly what AQE's
    // OptimizeSkewedJoin splits at runtime (PlanSpec lowers the skew
    // thresholds and asserts the split engages; q48 remains the manual
    // salting alternative). Results are AQE-invariant, so the oracle greens
    // regardless of topology
    "q179_aqe_skew_join" -> ((s, d) => {
      // round-robin spread first: AQE splits a hot reduce partition by MAP
      // ranges, so the hot key's bytes must originate from many mappers — at
      // 100 TB the scan has thousands of splits and this is free; at test
      // scale the single-file scan is one mapper, so the spread stands in
      // for production scan parallelism
      val ev = events(s, d).select(col("user_id"), col("event_type"),
          ExactStats.micro(col("value")).cast("long").as("vm"))
        .withColumn("k", when(pmod(col("user_id"), lit(100)) < 90, lit(0L))
          .otherwise(col("user_id")))
        .repartition(16)
      // dim: one weight row per key, built at USER grain + a literal hot row
      // — deliberately NOT a groupBy(k), so its output partitioning doesn't
      // satisfy the join and EnsureRequirements plants the exchange directly
      // under the join's sort (the shape OptimizeSkewedJoin matches on)
      val dim = ev.where(pmod(col("user_id"), lit(100)) >= 90)
        .groupBy("user_id").agg(count(lit(1)).as("k_weight"))
        .select(col("user_id").as("k"), col("k_weight"))
        .unionByName(s.range(1).select(lit(0L).as("k"), lit(1L).as("k_weight")))
      ev.join(dim.hint("merge"), "k")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("vm").as("sum_vm"),
          sum("k_weight").as("sum_k_weight"))
    }),

    // broader generation coverage: one config per (family, nVars), aggregated
    // from the dumped parquet on both sides
    "q38_generate_shapes" -> ((s, d) => {
      val cfgs = for {
        fam <- Catalog.families
        v <- Seq(4, 6, 8)
      } yield Grid.forFamily(fam).find(c => c.nPoints == 500 && c.nVars == v && c.maxLag == 3).get
      // exact micro sums, not round(avg): avg(double) hash-mismatched in r2
      // when the partition topology changed (driver CPUs vs local)
      dumpGen(s, "q38_wide", Generate.wideFast(s, cfgs.toSeq))
        .groupBy("family", "nVars")
        .agg(count(lit(1)).as("n_rows"),
             ExactStats.sumMicro(col("X1")).as("sum_x1_micro"),
             sum(col("maskBits")).as("mask_sum"))
        .withColumnRenamed("nVars", "n_vars")
    }),

    // -- S5 plot-ready aggregates (the data behind every reference figure:
    //    series lines a1.py:286-295, missing heatmap d3c.py:487-499, sampling
    //    histogram d3c.py:501-510, trend fits c1.py:390-411) --
    "q43_plot_series" -> ((s, d) => {
      val cfg = Grid.forFamily("C1").find(c =>
        c.nPoints == 1000 && c.nVars == 4 && c.maxLag == 2).get
      val wide = dumpGen(s, "q43_wide", Generate.wideFast(s, Seq(cfg)))
      graft.generate.PlotReady.seriesSample(wide, Seq("X1", "X2", "X3", "X4"), 10)
    }),

    "q44_plot_missing_pattern" -> ((s, d) => {
      val cfg = Grid.forFamily("D3C").find(c =>
        c.nPoints == 3000 && c.nVars == 6 && c.maxLag == 2).get
      val miss = dumpGen(s, "q44_missing",
        Generate.missingView(Generate.wideFast(s, Seq(cfg))))
      graft.generate.PlotReady.missingPatternCounts(miss, (1 to 6).map(i => s"X$i"), 50)
    }),

    "q45_plot_sampling_hist" -> ((s, d) => {
      val cfg = Grid.forFamily("D3C").find(c =>
        c.nPoints == 3000 && c.nVars == 6 && c.maxLag == 2).get
      val wide = dumpGen(s, "q45_wide", Generate.wideFast(s, Seq(cfg)))
      graft.generate.PlotReady.samplingIntervalHist(wide, 0.002)
    }),

    "q46_plot_trend_fit" -> ((s, d) => {
      val cfg = Grid.forFamily("C1").find(c =>
        c.nPoints == 1000 && c.nVars == 4 && c.maxLag == 2).get
      val wide = dumpGen(s, "q46_wide", Generate.wideFast(s, Seq(cfg)))
      graft.generate.PlotReady.trendFitExact(wide, Seq("X1", "X2", "X3", "X4"))
    }),

    // the q30/q38 dump contract extended to the WHOLE grid: every one of
    // the 2,592 sweep configs is pinned individually — row count, exact
    // micro sums of X1 and the time axis, and the mask population, per
    // configId. A kernel/ordering/mask/timestamp regression in ANY
    // family×size×lag×noise cell hash-fails this one query. The dump
    // projects just the digest columns so the verify artifact stays small
    "q177_full_sweep_digest" -> ((s, d) => sweepDigest(s, "q177_sweep")),

    // the driver's raw-generation artifact row, flipped green: `_gen` used
    // to be the scratch dump directory itself (a permanently no-oracle
    // row); the scratch now lives outside the verify outDir and this entry
    // pins the SAME per-config digest contract as q177 over its own
    // independently regenerated dump (queries is an unordered Map — no
    // cross-query read dependency is allowed)
    "_gen" -> ((s, d) => sweepDigest(s, "_gen_sweep")),

    // strict-vs-compat divergence census (SURVEY §2.4 "fixed mode"): one
    // 6-var config per family generated in BOTH modes, dumped, and diffed
    // per family — the quirk-affected families (zero-read contemporaneous,
    // cubic drop, min-gap rescale) must diverge, the untouched ones
    // (A1C/D1/D1C) must not; both engines compute the census from the same
    // two dumps, and StrictModeSpec pins the expected pattern bitwise
    "q178_strict_mode_diff" -> ((s, d) => {
      val cfgs = Catalog.families.map(f =>
        Grid.forFamily(f).find(c => c.nPoints == 1000 && c.nVars == 6 &&
          c.maxLag == 2 &&
          (c.noiseType == "gaussian" || c.noiseType == "mixed")).get)
      val compat = dumpGen(s, "q178_compat", Generate.wideFast(s, cfgs))
      val strict = dumpGen(s, "q178_strict",
        Generate.wideFast(s, cfgs, strict = true))
      val valueDiff = (1 to 6).map(i =>
        !(col(s"c.X$i") <=> col(s"s.X$i"))).reduce(_ || _)
      compat.as("c")
        .join(strict.as("s"),
          // family is a join key: forFamily numbers each family's grid from
          // zero, so configIds alone collide across the 18 families
          col("c.family") === col("s.family") &&
            col("c.configId") === col("s.configId") && col("c.t") === col("s.t"))
        .groupBy(col("c.family").as("family"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(valueDiff, 1L).otherwise(0L)).as("n_value_diff"),
          sum(when(!(col("c.time") <=> col("s.time")), 1L).otherwise(0L))
            .as("n_time_diff"))
    }),

    "q30_generate_families" -> ((s, d) => {
      val cfgs = Catalog.families.map(f =>
        Grid.forFamily(f).find(c => c.nPoints == 1000 && c.nVars == 6 && c.maxLag == 2).get)
      // exact micro sums, not round(avg): avg(double) hash-mismatched in r2
      // when the partition topology changed (driver CPUs vs local)
      dumpGen(s, "q30_wide", Generate.wideFast(s, cfgs))
        .groupBy("family")
        .agg(count(lit(1)).as("n_rows"),
             ExactStats.sumMicro(col("X1")).as("sum_x1_micro"),
             ExactStats.sumMicro(col("X6")).as("sum_x6_micro"))
    }),

    // 10-min resample of the events table per event_type: dense global grid,
    // last-observation-carried-forward, with a staleness column — the
    // metrics-store regularization op. The ffill's sequential dependency is
    // per SERIES (the semantics), so parallelism = series count.
    "q70_resample_ffill" -> ((s, d) =>
      graft.ops.Resample.resampleFfill(
        events(s, d).withColumn("ts_us", expr("ts div 1000")),
        Seq("event_type"), "ts_us", "value", "event_id",
        bucketUs = 600L * 1000000L)),

    // linear interpolation of an IRREGULAR generated series (B2, the
    // prefix-rescaled timestamps of b2.py:87-99) onto a regular 0.5-unit
    // grid — two as-of joins + exact integer arithmetic (InterpShift keeps
    // trunc ≡ floor across engines). Sample rows are dumped so DuckDB
    // interpolates the identical irregular input.
    "q71_interpolate_grid" -> ((s, d) => {
      val cfg = Grid.forFamily("B2").find(c =>
        c.nPoints == 1000 && c.nVars == 4 && c.maxLag == 2 && c.mixRatio == 0.5).get
      val samples = dumpGen(s, "q71_samples",
        Generate.wideFast(s, Seq(cfg)).select(col("configId"),
          ExactStats.micro(col("t")).cast("long").as("t_us"),
          ExactStats.micro(col("X1")).cast("long").as("v_micro")))
      val grid = samples.select(col("configId")).distinct()
        .select(col("configId"),
          explode(expr("sequence(0L, 100000000L, 500000L)")).as("grid_us"))
      graft.ops.Resample.interpolateToGrid(samples, grid,
        Seq("configId"), "t_us", "v_micro")
    }),

    // HyperLogLog distinct-token estimate per source, pure-integer register
    // contract (verifiable in SQL, unlike approx_count_distinct's binary
    // sketch) — the shuffle carries ≤ |sources|·64 register rows no matter
    // the corpus size. n_exact is the validation column.
    "q72_hll_distinct" -> ((s, d) =>
      graft.ops.Sketch.hllWithExact(
        documents(s, d).select(col("source"),
          explode(TextOps.tokensCol(col("text"))).as("tok"))
          .select(col("source"), TextOps.fingerprint(col("tok")).as("h")),
        Seq("source"), "h")),

    // span-level dedup (Lee et al. 2022 detection, fixed 64-token windows):
    // a shared boilerplate prefix is synthesized in-query on doc_id % 5 = 0
    // (the word-salad corpus has no natural cross-doc spans — q68's
    // synthesize-then-detect pattern), then every duplicated chunk is found
    // via one fingerprint groupBy, never a pairwise comparison
    "q73_chunk_dedup" -> ((s, d) => {
      val boosted = documents(s, d).withColumn("text_b",
        when(pmod(col("doc_id"), lit(5L)) === 0,
          concat(lit(Boilerplate + " "), col("text")))
          .otherwise(col("text")))
      graft.text.Packing.chunkDupStats(
        graft.text.Packing.chunkDocs(boosted, "doc_id", "text_b",
          chunkTokens = 64, strideTokens = 48))
    }),

    // stream-stream interval join through ≥2 micro-batches: purchases
    // attributed to same-user clicks ≤10 min earlier; append-mode inner
    // join ⇒ the drained sink equals the batch interval join (the oracle)
    "q74_stream_interval_join" -> ((s, d) =>
      graft.streaming.StreamJoin.clickPurchaseAttribution(s, d,
        splitDir = s"$genDir/events_split", windowSec = 600L,
        queryName = s"graft_stream_join_${System.nanoTime()}")),

    // CUBE over (returnflag, linestatus): all four grains in ONE scan —
    // completes the rollup (q27) / grouping-sets (q52) / cube family
    "q75_revenue_cube" -> ((s, d) => {
      lineitem(s, d).createOrReplaceTempView("q75_lineitem")
      s.sql(
        s"""SELECT l_returnflag, l_linestatus,
          |  $SparkRevenueSql AS revenue,
          |  count(*) AS n_items
          |FROM q75_lineitem
          |GROUP BY l_returnflag, l_linestatus WITH CUBE""".stripMargin)
    }),

    // mergeable equi-width-histogram quantile sketch over price cents
    // ($10 bins): the per-bin counts are the sketch (map-side combined,
    // shuffle ≤ #bins regardless of row count); the estimate is the lower
    // edge of the first bin whose cumulative count crosses q·n — integers
    // end to end, vs q32's exact per-group sort
    "q76_hist_quantiles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      lineitem(s, d)
        .withColumn("_cents", cents(col("l_extendedprice"))) // the shared contract
        .select(expr("_cents div 1000").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("total", sum(col("cnt")).over(wAll))
        .agg(max(col("total")).as("n_rows"),
          min(when(col("cum") * 100 >= col("total") * 50, col("bin") * 1000))
            .as("p50_cents"),
          min(when(col("cum") * 100 >= col("total") * 90, col("bin") * 1000))
            .as("p90_cents"),
          min(when(col("cum") * 100 >= col("total") * 99, col("bin") * 1000))
            .as("p99_cents"))
    }),

    // per-type 3σ outliers, pure integer contract ((n·x−S)² > 9(n·Q−S²)) —
    // the uniform value column has NO 3σ tail (max dev ≈ 1.73σ), so spikes
    // are synthesized in-query on event_id % 997 (q68's pattern): the
    // detector's hits are real and the oracle checks the exact flag set
    "q77_anomaly_3sigma" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("event_type"),
        (ExactStats.micro(col("value")) * // the shared micro quantization
          when(pmod(col("event_id"), lit(997L)) === 0, 10L).otherwise(1L))
          .cast("long").as("v_micro"))
      graft.ops.Anomaly.threeSigmaOutliers(ev, Seq("event_type"), "event_id",
        "v_micro")
    }),

    // count-min heavy hitters: the sketch is ≤ 3×1024 cells from one
    // map-side-combined groupBy at ANY corpus size; the 20 exact top tokens
    // are the probes, so the oracle shows est ≥ exact cell by cell
    "q78_cms_heavy_hitters" -> ((s, d) => {
      val tok = documents(s, d)
        .select(explode(TextOps.tokensCol(col("text"))).as("tok"))
        .select(col("tok"), TextOps.fingerprint(col("tok")).as("h"))
      val exactTop = tok.groupBy("tok", "h").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok").asc).limit(20)
      graft.ops.Sketch.cmsEstimate(graft.ops.Sketch.cmsCells(tok, "h"),
        exactTop, "h")
        .select(col("tok"), col("exact_cnt"), col("cms_est"))
    }),

    // the first BPE merge decision: global adjacent-pair counts, top 50 —
    // one groupBy over the native single-pass shingle expression
    "q79_bpe_pair_counts" -> ((s, d) =>
      documents(s, d)
        .select(explode(TextOps.shinglesAll(col("text"), 2)).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc).limit(50)),

    // streaming dedup + stream-static enrichment under the driver contract:
    // every event arrives twice (self-union of split streams — the
    // at-least-once retry shape), watermark-bounded dedup state drops the
    // copies, survivors broadcast-join a static per-user profile
    "q80_stream_dedup_enrich" -> ((s, d) =>
      graft.streaming.StreamDedup.dedupEnrichEvents(s, d,
        splitDir = s"$genDir/events_split",
        queryName = s"graft_stream_dedup_${System.nanoTime()}")),

    // Bloom pre-filter: were all a part's shipments "early" (< 1995-03-01)?
    // build = early-shipped partkeys (~half the parts — genuine partial
    // membership; user/partkey sets in this data are otherwise saturated),
    // probe = every partkey. The filter is ≤ 8192 bit rows no matter the
    // build size, broadcast to the probe; the output exposes the one-sided
    // contract (every member passes; false positives sit next to exact
    // membership)
    "q81_bloom_prefilter" -> ((s, d) => {
      val li = lineitem(s, d)
      val early = li.where(col("l_shipdate") < lit("1995-03-01"))
        .select(col("l_partkey"))
      val probe = graft.ops.Bloom.bloomProbe(li.select(col("l_partkey")),
        graft.ops.Bloom.bloomBits(early, "l_partkey"), "l_partkey")
      probe.join(early.distinct().withColumn("true_member", lit(1)),
          Seq("l_partkey"), "left")
        .select(col("l_partkey"), col("bloom_pass"),
          coalesce(col("true_member"), lit(0)).as("true_member"))
    }),

    // class-confusability: pairwise integer dot products of per-label
    // centroid sums — the corpus collapses to |labels|·64 rows in one
    // map-side groupBy; the pairwise stage is a broadcast self-join of that
    // tiny table, never a vector-level cross product
    "q82_label_affinity" -> ((s, d) =>
      graft.sim.Clustering.labelAffinity(embeddings(s, d), "label", "embedding")),

    // MERGE INTO / SCD-1: a first-half-of-month profile snapshot upserted
    // with second-half purchase records — union + ONE max(struct) aggregate
    // (no window sort, no join), updates beating base on order ties
    "q83_profile_upsert" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"), col("event_id"),
        ExactStats.micro(col("value")).cast("long").as("v_micro"))
      graft.ops.Upsert.latestWins(
        ev.where(col("ts_us") < UpsertMidUs),
        ev.where(col("ts_us") >= UpsertMidUs && col("event_type") === "purchase"),
        keyCols = Seq("user_id"), ordCols = Seq("ts_us", "event_id"),
        payloadCols = Seq("v_micro"))
    }),

    // z-order layout report: Morton-interleave (partkey, suppkey) low bits,
    // bucket by the top z bits, report each bucket's min/max envelope on
    // BOTH dimensions — the file-skipping statistics a z-sorted 100 TB
    // table would expose. One derived-integer groupBy, no row shuffle
    "q84_zorder_layout" -> ((s, d) =>
      graft.ops.ZOrder.layoutStats(
        lineitem(s, d).select(pmod(col("l_partkey"), lit(1024)).as("px"),
          pmod(col("l_suppkey"), lit(1024)).as("sx")),
        "px", "sx", bits = 10, bucketShift = 12)),

    // deterministic weighted bottom-k sample (hash A-Res): priority =
    // (fp mod 1e6)·1000 div n_tokens — longer docs win proportionally more
    // often, yet the draw is a pure content function; TakeOrderedAndProject
    // moves only k rows per partition
    "q85_weighted_sample" -> ((s, d) =>
      graft.text.Sampling.weightedPrioritySample(documents(s, d), "doc_id",
        "text", size(TextOps.tokensCol(col("text"))), k = 100)),

    // weighted PageRank over the nation→nation supply graph: the heavy
    // stage is the fact-side edge derivation (orders⋈lineitem shuffle, dims
    // broadcast); 3 integer-exact iterations then run on the 25-node
    // contracted graph with broadcast rank state — fact rows never
    // re-shuffle. (customer is broadcast at bench scale; at a real SF it
    // becomes one more shuffle join on the derivation side only.)
    "q86_nation_pagerank" -> ((s, d) =>
      graft.ops.PageRank.rankMicro(nationTradeEdges(s, d), iterations = 3)
        .select(col("node").as("nation"), col("rank_micro"))),

    // mid-frequency inverted-index slice: df-filter FIRST via semi-join, so
    // head terms never enter a collect_list — bounded per-group state at
    // any corpus size
    "q87_inverted_index" -> ((s, d) =>
      graft.text.Index.invertedIndex(documents(s, d), "doc_id", "text",
        minDf = 5, maxDf = 400, postingCap = 20)),

    // full pairwise covariance sufficient statistics in ONE map-side-
    // combinable pass: the corpus is read once, the shuffle carries a single
    // sufficient-statistics row, and all 6 pairs are arithmetic on it
    "q88_cov_matrix" -> ((s, d) =>
      graft.ops.CovMatrix.pairSums(lineitem(s, d), Seq(
        "qty" -> floor(col("l_quantity") + lit(0.5)),
        "price_d" -> expr("floor(l_extendedprice * 100 + 0.5) div 100"),
        "disc_pm" -> floor(col("l_discount") * 1000 + lit(0.5)),
        "tax_pm" -> floor(col("l_tax") * 1000 + lit(0.5))))),

    // CUSUM level-shift profile per user: one scalar aggregate for the
    // global mean, one shuffle by user; prefix sum + peak ranking + all
    // per-key aggregates inside that single window partition
    "q89_cusum_changepoint" -> ((s, d) => {
      // clamp at the query boundary: cusumPeaks' μ = sum div count is exact
      // cross-engine only for v ≥ 0 (div truncates, // floors) — the clamp
      // makes the precondition a contract instead of a data assumption
      val ev = events(s, d).select(col("user_id"),
        expr("ts div 1000").as("ts_us"), col("event_id"),
        greatest(ExactStats.micro(col("value")).cast("long"), lit(0L))
          .as("v_micro"))
      graft.ops.Anomaly.cusumPeaks(ev, "user_id", "ts_us", "event_id", "v_micro")
    }),

    // character-class Gini impurity: a pure-integer quality signal (no
    // entropy ln() whose last ulp differs across libm builds)
    "q90_char_classes" -> ((s, d) =>
      TextOps.charClassProfile(documents(s, d), "doc_id", "text")),

    // Heaps-law vocabulary growth: bucket by id arithmetic (never a global
    // row_number), two map-side-combinable aggregates, cumulative window
    // over exactly `buckets` rows
    "q91_vocab_growth" -> ((s, d) =>
      graft.text.Index.vocabGrowth(documents(s, d), "doc_id", "text",
        buckets = 10)),

    // asymmetric shingle containment (the quote/boilerplate pattern Jaccard
    // cannot see): inverted-index candidates under a df cap — the skew
    // bound, since the Jaccard prefix filter doesn't apply one-sided
    "q92_containment_pairs" -> ((s, d) =>
      graft.text.Dedup.containmentPairs(documents(s, d), "doc_id", "text",
        n = 3, minContainMilli = 800L, maxDocFreq = 100L)),

    // leakage-safe train/test split: near-dup components (the q61 graph)
    // hash to ONE side as a unit, so no duplicate cluster ever straddles
    // the train/eval boundary — the contamination bug a per-doc split has
    "q93_cluster_split" -> ((s, d) => {
      val docs = documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, minEstJaccard = 0.25)
      val comp = graft.ops.ConnectedComponents.components(pairs, "id_a", "id_b")
      val labeled = docs.select(col("doc_id"))
        .join(comp, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
      graft.text.Sampling.clusterSafeSplit(labeled, "component",
        trainPermille = 900)
    }),

    // greedy per-language token-budget fill: ONE shuffle by stratum; rank,
    // prefix sum and kept/total aggregates all inside that partition
    "q94_token_budget" -> ((s, d) =>
      graft.text.Mixing.tokenBudgetFill(documents(s, d), "lang", "doc_id",
        size(TextOps.tokensCol(col("text"))), budgetTokens = 2000L)),

    // event-sequence conversion (first view → later purchase): window min +
    // per-user fold in a single user-partitioned shuffle, exact micro lag
    "q95_funnel_conversion" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
      graft.ops.Funnel.conversionStats(ev, "user_id", "event_type", "ts_us",
        fromType = "view", toType = "purchase")
    }),

    // triangle/wedge census of the SAME near-dup pair graph q61 clusters:
    // high closure ⇒ tight duplicate cliques, low ⇒ borderline chains a
    // transitive closure would over-merge
    "q96_pair_triangles" -> ((s, d) =>
      graft.ops.Triangles.census(
        Dedup.minhashLshPairs(documents(s, d), "doc_id", "text",
          n = 3, numHashes = 16, bands = 4, minEstJaccard = 0.25),
        "id_a", "id_b")),

    // keep-BEST dedup (vs q08's keep-first): one survivor per content
    // group by (quality, id) max(struct) — 8-byte fingerprint shuffle key,
    // no window sort, no text movement
    "q97_dedup_keep_best" -> ((s, d) =>
      Dedup.keepBestDedup(documents(s, d), "doc_id", "text",
        size(TextOps.tokensCol(col("text"))))),

    // per-stratum bottom-k: equal representation however skewed the strata
    // — the global bottom-k (q85) would let a dominant language crowd out
    // the rest; rank runs inside the one stratum shuffle
    "q98_stratified_sample_topk" -> ((s, d) =>
      graft.text.Sampling.stratifiedPrioritySample(documents(s, d), "doc_id",
        "text", "lang", size(TextOps.tokensCol(col("text"))), kPerStratum = 20)),

    // robust center/spread per event type: exact integer lower-median + MAD
    // over (group, value) count histograms — the shuffle carries distinct
    // values, never rows; medians re-enter as a |groups|-row broadcast
    "q99_median_mad" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"),
        ExactStats.micro(col("value")).cast("long").as("v_micro"))
      graft.ops.Robust.medianMadOutliers(ev, "event_type", "v_micro", k = 5)
    }),

    // the capstone: a user's WHOLE curation pipeline in one query —
    // keep-best dedup → language/length/repetition gates → near-dup
    // components → leakage-safe split → per-split corpus accounting. Every
    // stage is the already-oracled operator (q97, q64/q66 gates, q61
    // components, q93 split) composed end-to-end; the only new code is the
    // composition itself
    "q100_curation_pipeline" -> ((s, d) => {
      val docs = documents(s, d)
      val best = Dedup.keepBestDedup(docs, "doc_id", "text",
        size(TextOps.tokensCol(col("text")))).select(col("doc_id"))
      val filtered = TextOps.langId(docs)
        .join(best, Seq("doc_id"), "left_semi")
        .where(Curation.langEn && Curation.lenOk && Curation.notRepetitive)
        .select(col("doc_id"),
          size(TextOps.tokensCol(col("text"))).cast("long").as("n_tokens"))
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, minEstJaccard = 0.25)
      val comp = graft.ops.ConnectedComponents.components(pairs, "id_a", "id_b")
      val labeled = filtered.join(comp, filtered("doc_id") === comp("id"), "left")
        .select(filtered("doc_id"), col("n_tokens"),
          coalesce(col("component"), filtered("doc_id")).as("component"))
      graft.text.Sampling.clusterSafeSplit(labeled, "component", 900)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
          countDistinct("component").as("n_components"))
    }),

    // the ranking-function family over one total order (v, id): rank and
    // dense_rank are tie-stable; ntile/percent_rank/cume_dist are made
    // deterministic by the id tie-break and emitted as exact ppm integers
    // instead of their double forms. Top-100 via the rank (not LIMIT) so
    // the output exercises the rank itself
    "q101_rank_suite" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"), col("event_id"),
        ExactStats.micro(col("value")).cast("long").as("v_micro"))
      val wVal = Window.partitionBy("event_type").orderBy(col("v_micro"))
      val wTotal = Window.partitionBy("event_type")
        .orderBy(col("v_micro"), col("event_id"))
      val wKey = Window.partitionBy("event_type")
      // ranks widened to LONG before the ppm products: (rnk−1)·10⁶ crosses
      // 2^31 already at ~2150 rows per group
      ev.withColumn("rnk", rank().over(wVal).cast("long"))
        .withColumn("drnk", dense_rank().over(wVal).cast("long"))
        .withColumn("tile4", ntile(4).over(wTotal))
        .withColumn("rn", row_number().over(wTotal).cast("long"))
        .withColumn("n", count(lit(1)).over(wKey))
        .where(col("rn") <= 100)
        .select(col("event_type"), col("event_id"), col("v_micro"),
          col("rnk"), col("drnk"), col("tile4"),
          expr("((rnk - 1) * 1000000) div greatest(n - 1, 1L)").as("pr_ppm"),
          expr("(rn * 1000000) div n").as("cd_ppm"))
    }),

    // percent-of-total (ratio-to-report): each nation's share of its
    // region's revenue in exact ppm — ONE aggregate to nation grain, the
    // region total as a window over the 25-row aggregate, never a second
    // scan of lineitem
    "q111_revenue_share" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_orderkey"), revenueUnits.as("rev"))
      val ord = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val cust = customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val nat = nation(s, d).select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))
      val reg = region(s, d).select(col("r_regionkey"), col("r_name"))
      val perNation = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        // DECIMAL(38,0) sum (the revenueDollars overflow discipline),
        // narrowed to LONG at this data's magnitudes
        .agg(sum(col("rev").cast("decimal(38,0)")).cast("long").as("rev_units"))
      perNation
        .withColumn("region_units",
          sum("rev_units").over(Window.partitionBy("r_name")))
        // units·1e6 crosses 2^63 — the ppm product must widen BEFORE div
        .withColumn("share_ppm", expr(
          "(cast(rev_units as decimal(38,0)) * 1000000) div region_units"))
        .select("r_name", "n_name", "rev_units", "share_ppm")
    }),

    // period-over-period: monthly revenue with previous-month delta via
    // lag over the aggregated series (window runs on |months| rows)
    "q112_monthly_delta" -> ((s, d) => {
      val li = lineitem(s, d).select(
        substring(col("l_shipdate").cast("string"), 1, 7).as("month"),
        revenueUnits.as("rev"))
      val monthly = li.groupBy("month")
        .agg(sum(col("rev").cast("decimal(38,0)")).cast("long").as("rev_units"))
      val w = Window.orderBy("month")
      monthly
        .withColumn("prev_units", lag("rev_units", 1).over(w))
        .withColumn("delta_units", col("rev_units") - col("prev_units"))
        .select("month", "rev_units", "prev_units", "delta_units")
    }),

    // sliding windows ACROSS micro-batches: windows overlapping the
    // median split accumulate state from both batches; complete mode ⇒
    // identical final table, so the oracle is q103's
    "q109_stream_sliding_multibatch" -> ((s, d) =>
      graft.streaming.StreamAgg.eventsSlidingWindowedMultiBatch(s, d,
        widthSec = 300L, slideSec = 60L,
        splitDir = s"$genDir/events_split",
        queryName = s"graft_stream_sliding_mb_${System.nanoTime()}")),

    // winsorized robust mean per event type: clip values at the histogram
    // p01/p99 bin edges (the q102 contract), then ONE exact integer mean
    // of the clipped micro values — outlier-insensitive without dropping
    // rows; clip bounds re-enter as a |groups|-row broadcast
    "q110_winsorized_mean" -> ((s, d) => {
      val binW = 10000000L
      val ev = events(s, d).select(col("event_type"),
        ExactStats.micro(col("value")).cast("long").as("v_micro"))
      val bins = ev.groupBy(col("event_type"),
          expr(s"v_micro div $binW").as("bin"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wKey = Window.partitionBy("event_type")
      val bounds = bins.withColumn("cum", sum("cnt").over(w))
        .withColumn("total", sum("cnt").over(wKey))
        .groupBy("event_type")
        .agg(min(when(col("cum") * 100 >= col("total"), col("bin") * binW))
            .as("lo_micro"),
          min(when(col("cum") * 100 >= col("total") * 99,
            (col("bin") + 1) * binW - 1)).as("hi_micro"))
      ev.join(broadcast(bounds), "event_type")
        .select(col("event_type"),
          greatest(least(col("v_micro"), col("hi_micro")), col("lo_micro"))
            .as("clipped"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("clipped").as("sum_clipped_micro"),
          expr("sum(clipped) div count(1)").as("winsorized_mean_micro"))
    }),

    // referential-integrity audit: orphan counts for every FK edge of the
    // star schema via left-anti joins (never a driver-side count loop);
    // two orphan keys are synthesized in-query so the checks demonstrably
    // detect, not just report zero (the q68/q77 synthesize-then-detect
    // pattern)
    "q107_integrity_audit" -> ((s, d) => {
      import s.implicits._
      def keys(df: DataFrame, c: String) = df.select(col(c).cast("long").as("k"))
      def pkeys(df: DataFrame, c: String) = df.select(col(c).cast("long").as("pk"))
      def check(name: String, child: DataFrame, parent: DataFrame) =
        child.join(parent, col("k") === col("pk"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("check_name"), col("n_violations"))
      val liOrd = keys(lineitem(s, d), "l_orderkey")
        .unionByName(Seq(-1L, -2L).toDF("k")) // planted orphans
      check("lineitem_orders", liOrd, pkeys(orders(s, d), "o_orderkey"))
        .unionByName(check("lineitem_part",
          keys(lineitem(s, d), "l_partkey"), pkeys(part(s, d), "p_partkey")))
        .unionByName(check("lineitem_supplier",
          keys(lineitem(s, d), "l_suppkey"), pkeys(supplier(s, d), "s_suppkey")))
        .unionByName(check("orders_customer",
          keys(orders(s, d), "o_custkey"), pkeys(customer(s, d), "c_custkey")))
        .unionByName(check("customer_nation",
          keys(customer(s, d), "c_nationkey"), pkeys(nation(s, d), "n_nationkey")))
    }),

    // one-pass column profile (the data-quality report a 100 TB ingest
    // emits per batch): row count, null count, exact distinct per column —
    // ONE aggregate over ONE scan, exploded into per-column rows
    "q108_column_profile" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"),
        col("event_id"), ExactStats.micro(col("value")).cast("long").as("v_micro"),
        expr("ts div 1000").as("ts_us"))
      val cols = Seq("user_id", "event_type", "event_id", "v_micro", "ts_us")
      val aggs = count(lit(1)).as("n_rows") +:
        cols.flatMap(c => Seq(count(col(c)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c")))
      val row = ev.agg(aggs.head, aggs.tail: _*)
      val recs = cols.map(c => struct(lit(c).as("col_name"),
        col("n_rows").as("n_rows"),
        (col("n_rows") - col(s"nn_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct")))
      row.select(explode(array(recs: _*)).as("r")).select(col("r.*"))
    }),

    // incremental view maintenance: a "materialized" first-half daily
    // rollup merged with a late-arriving delta batch by SUMMING PARTIAL
    // AGGREGATES — the base is never rescanned, and the oracle (one direct
    // full-scan aggregation) proves merged partials ≡ recompute. The
    // pattern a 100 TB daily-ingest rollup lives on
    "q106_incremental_rollup" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"),
        expr("ts div 1000").as("ts_us"),
        ExactStats.micro(col("value")).cast("long").as("v_micro"))
      def rollup(part: DataFrame) = part
        .groupBy(expr(s"ts_us div ${86400L * 1000000L}").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sum("v_micro").as("sum_micro"))
      val base = rollup(ev.where(col("ts_us") < UpsertMidUs))
      val delta = rollup(ev.where(col("ts_us") >= UpsertMidUs))
      base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(sum("n").as("n"), sum("sum_micro").as("sum_micro"))
    }),

    // as-of with a staleness bound: attach the latest prior view only if it
    // is at most 10 minutes old — matches beyond the tolerance revert to
    // null. Same single-shuffle union+carry plan as q04; the bound is one
    // comparison on the carried struct
    "q105_asof_tolerance" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      val views = ev.where(col("event_type") === "view")
        .groupBy("user_id", "ts_us")
        .agg(min(col("event_id")).as("view_id"))
      AsOf.asofBackwardTolerance(purchases, views, Seq("user_id"), "ts_us",
        Seq("view_id"), toleranceUs = 600000000L)
    }),

    // the BUILT-IN session_window operator in batch mode (the custom
    // flatMapGroupsWithState streaming sessionization is q40/q55; this is
    // the declarative batch form Catalyst plans natively): sessions close
    // when the gap to the next event reaches 30 min; end = last ts + gap
    "q104_session_window" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("event_time"),
        ExactStats.micro(col("value")).cast("long").as("v_micro"))
      ev.groupBy(col("user_id"),
          session_window(col("event_time"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sum("v_micro").as("sum_v_micro"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          unix_micros(col("w.end")).as("session_end_us"),
          col("n_events"), col("sum_v_micro"))
    }),

    // sliding event-time windows (width 300s, slide 60s — every event in 5
    // overlapping windows), as a real streaming query; the oracle replays
    // the assignment as event × offset-range
    "q103_stream_sliding" -> ((s, d) =>
      graft.streaming.StreamAgg.eventsSlidingWindowed(s, d,
        widthSec = 300L, slideSec = 60L,
        queryName = s"graft_stream_sliding_${System.nanoTime()}")),

    // per-group histogram quantiles: the q76 equi-width-bin contract
    // PARTITIONED by event type — bins aggregate map-side (|groups|·|bins|
    // rows of shuffle), the quantile selection is a tiny per-group window
    "q102_group_quantiles" -> ((s, d) => {
      val binW = 10000000L // 10-unit bins in micro
      val ev = events(s, d).select(col("event_type"),
        ExactStats.micro(col("value")).cast("long").as("v_micro"))
      val bins = ev.groupBy(col("event_type"),
          expr(s"v_micro div $binW").as("bin"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wKey = Window.partitionBy("event_type")
      bins.withColumn("cum", sum("cnt").over(w))
        .withColumn("total", sum("cnt").over(wKey))
        .groupBy("event_type")
        .agg(max("total").as("n_rows"),
          min(when(col("cum") * 100 >= col("total") * 50,
            col("bin") * binW)).as("p50_micro"),
          min(when(col("cum") * 100 >= col("total") * 90,
            col("bin") * binW)).as("p90_micro"),
          min(when(col("cum") * 100 >= col("total") * 99,
            col("bin") * binW)).as("p99_micro"))
    }),

    // retention cohorts: customers keyed by first-order month, activity
    // counted by months-since-cohort — ONE window (min over the custkey
    // partition, same shuffle the groupBy would need anyway) then one
    // aggregate to (cohort, offset) grain; month index year·12+month keeps
    // the calendar arithmetic integer on both engines
    "q113_retention_cohorts" -> ((s, d) => {
      val o = orders(s, d).select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("midx"))
      val w = Window.partitionBy("o_custkey")
      o.withColumn("cohort_idx", min("midx").over(w))
        .groupBy(col("cohort_idx"),
          (col("midx") - col("cohort_idx")).as("month_offset"))
        .agg(countDistinct(col("o_custkey")).as("active_customers"),
          count(lit(1)).as("n_orders"))
    }),

    // RFM segmentation without a global-window ntile (a single-partition
    // sort over |customers| rows would serialize at scale): quartile edges
    // come from the q102 cumulative-histogram contract over a MELTED
    // (metric, bin) aggregate — one shuffle for all three metrics — and
    // re-enter as a one-row broadcast; tiles are integer bin comparisons
    "q114_rfm_segments" -> ((s, d) => {
      val perCust = orders(s, d)
        .groupBy(col("o_custkey"))
        // o_orderdate is TIMESTAMP_NTZ; the session zone is pinned UTC, so
        // the cast is the identity mapping and matches DuckDB's epoch_us
        .agg(max(expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
            .as("last_day"),
          count(lit(1)).as("freq"),
          sum(cents(col("o_totalprice")).cast("decimal(38,0)"))
            .cast("long").as("mon_cents"))
      val anchor = perCust.agg(max("last_day").as("anchor_day"))
      // recency bin width 1 day, frequency width 1, monetary width $1000
      val m = perCust.crossJoin(broadcast(anchor))
        .select(col("o_custkey"), col("freq"), col("mon_cents"),
          (col("anchor_day") - col("last_day")).as("rec_days"))
        .withColumn("r_bin", col("rec_days"))
        .withColumn("f_bin", col("freq"))
        .withColumn("m_bin", expr("mon_cents div 100000"))
      val melted = m.select(explode(array(
        struct(lit("r").as("metric"), col("r_bin").as("bin")),
        struct(lit("f").as("metric"), col("f_bin").as("bin")),
        struct(lit("m").as("metric"), col("m_bin").as("bin")))).as("x"))
        .select(col("x.metric"), col("x.bin"))
      val bins = melted.groupBy("metric", "bin").agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy("metric").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy("metric")
      val edges = bins.withColumn("cum", sum("cnt").over(wCum))
        .withColumn("total", sum("cnt").over(wTot))
        .groupBy("metric")
        .agg(min(when(col("cum") * 4 >= col("total"), col("bin"))).as("e1"),
          min(when(col("cum") * 4 >= col("total") * 2, col("bin"))).as("e2"),
          min(when(col("cum") * 4 >= col("total") * 3, col("bin"))).as("e3"))
      // 3 rows → one broadcast row of 9 edge columns
      val edgeRow = edges.groupBy()
        .agg(min(when(col("metric") === "r", col("e1"))).as("r1"),
          min(when(col("metric") === "r", col("e2"))).as("r2"),
          min(when(col("metric") === "r", col("e3"))).as("r3"),
          min(when(col("metric") === "f", col("e1"))).as("f1"),
          min(when(col("metric") === "f", col("e2"))).as("f2"),
          min(when(col("metric") === "f", col("e3"))).as("f3"),
          min(when(col("metric") === "m", col("e1"))).as("m1"),
          min(when(col("metric") === "m", col("e2"))).as("m2"),
          min(when(col("metric") === "m", col("e3"))).as("m3"))
      def tile(bin: Column, e1: Column, e2: Column, e3: Column): Column =
        lit(1L) + (bin > e1).cast("long") + (bin > e2).cast("long") +
          (bin > e3).cast("long")
      m.crossJoin(broadcast(edgeRow))
        // recency tile 4 = MOST recent (low rec_days) per RFM convention
        .select(col("o_custkey"), col("freq"), col("mon_cents"),
          (lit(5L) - tile(col("r_bin"), col("r1"), col("r2"), col("r3")))
            .as("r_tile"),
          tile(col("f_bin"), col("f1"), col("f2"), col("f3")).as("f_tile"),
          tile(col("m_bin"), col("m1"), col("m2"), col("m3")).as("m_tile"))
        .groupBy("r_tile", "f_tile", "m_tile")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("mon_cents")).as("monetary_cents_total"))
    }),

    // gaps-and-islands: maximal runs of consecutive active months per
    // customer via the classic midx − row_number island key, aggregated to
    // a streak-length census; both window and aggregate shuffle on custkey
    "q115_order_streaks" -> ((s, d) => {
      val om = orders(s, d).select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("midx")).distinct()
      val w = Window.partitionBy("o_custkey").orderBy("midx")
      om.withColumn("island", col("midx") - row_number().over(w).cast("long"))
        .groupBy("o_custkey", "island")
        .agg(count(lit(1)).as("streak_len"))
        .groupBy("streak_len")
        .agg(count(lit(1)).as("n_streaks"),
          countDistinct(col("o_custkey")).as("n_customers"))
    }),

    // first-order Markov chain over per-user event sequences: transition
    // counts from one lead() window (ordered by ts, event_id — ties are
    // pinned), probabilities in exact ppm against the from-state total.
    // cnt·1e6 stays in LONG to ~9e12 transitions per from-state
    "q116_markov_transitions" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), col("ts"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      ev.withColumn("to_type", lead("event_type", 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("total", sum("cnt").over(Window.partitionBy("from_type")))
        .select(col("from_type"), col("to_type"), col("cnt"),
          expr("(cnt * 1000000) div total").as("p_ppm"))
    }),

    // run-length encoding census: maximal runs of the same event type per
    // user (the storage/compression question "how repetitive is this
    // stream?") via the lag-break + prefix-sum run id; both the run
    // aggregate and the census shuffle on small grains only
    "q117_state_runs" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), col("ts"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      ev.withColumn("prev", lag("event_type", 1).over(w))
        .withColumn("brk", when(col("prev").isNull ||
          col("prev") =!= col("event_type"), 1L).otherwise(0L))
        .withColumn("run_id", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "run_id", "event_type")
        .agg(count(lit(1)).as("run_len"))
        .groupBy("event_type", "run_len")
        .agg(count(lit(1)).as("n_runs"))
    }),

    // time-weighted average: each value holds until the next event, so the
    // mean weights by the holding interval — Σ(v·gap) div Σ(gap) per user.
    // The per-row product v_micro·gap_us crosses 2^63 (1e8·1e14), so it
    // widens to DECIMAL(38,0) BEFORE the multiply (HUGEINT in the mirror);
    // values are non-negative, so floor-div ≡ integer div on both engines
    "q118_time_weighted_avg" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts_us"),
        ExactStats.micro(col("value")).cast("long").as("vm"))
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      ev.withColumn("next_us", lead("ts_us", 1).over(w))
        .where(col("next_us").isNotNull)
        .select(col("user_id"), col("vm"),
          (col("next_us") - col("ts_us")).as("gap_us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum("gap_us").as("span_us"),
          expr("sum(cast(vm as decimal(38,0)) * gap_us) div sum(gap_us)")
            .as("twa_micro"))
        .where(col("span_us") > 0)
    }),

    // similarity self-join with prefix blocking, computed on the DISTINCT
    // NAME GRAIN: the quadratic Levenshtein join runs over unique names
    // (weighted by multiplicity), not rows — row-grain blocks here are
    // ~2500² pairs each (34 s at sf0.1); the distinct grain is ~60² total.
    // Row-pair counts reconstruct exactly: c1·c2 across different names,
    // C(c,2) within an identical name. First-token blocking still shards
    // the distinct-grain join at scale
    "q119_name_edit_pairs" -> ((s, d) => {
      val names = part(s, d).groupBy(col("p_name"))
        .agg(count(lit(1)).as("c"))
        .withColumn("t1", expr("split_part(p_name, ' ', 1)"))
      val a = names.select(col("p_name").as("n1"), col("c").as("c1"), col("t1"))
      val b = names.select(col("p_name").as("n2"), col("c").as("c2"), col("t1"))
      val diff = a.join(b, Seq("t1"))
        .where(col("n1") < col("n2"))
        .select(levenshtein(col("n1"), col("n2")).cast("long").as("dist"),
          (col("c1") * col("c2")).as("npairs"))
      val same = names.select(lit(0L).as("dist"),
        expr("c * (c - 1) div 2").as("npairs"))
      diff.unionByName(same)
        .where(col("dist") <= 8 && col("npairs") > 0)
        .groupBy("dist")
        .agg(sum("npairs").as("n_pairs"))
    }),

    // market-basket co-occurrence: brand pairs appearing in one order, with
    // support in exact ppm of all orders. The per-order brand set is ≤ the
    // line count (≤7), so the self-join blowup is linear in orders, not
    // quadratic in lineitem; part joins by key (a 2-column projection —
    // dimension-sized, but NOT assumed broadcastable at 100 TB)
    "q120_basket_brand_pairs" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      val pr = part(s, d).select(col("p_partkey"), col("p_brand"))
      val ob = li.join(pr, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand")).distinct()
      val total = ob.select(countDistinct("l_orderkey").as("total_orders"))
      val pairs = ob.select(col("l_orderkey"), col("p_brand").as("brand_a"))
        .join(ob.select(col("l_orderkey"), col("p_brand").as("brand_b")),
          "l_orderkey")
        .where(col("brand_a") < col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(count(lit(1)).as("n_orders"))
      pairs.crossJoin(broadcast(total))
        .select(col("brand_a"), col("brand_b"), col("n_orders"),
          expr("(n_orders * 1000000) div total_orders").as("support_ppm"))
    }),

    // out-of-vocabulary rate against a corpus-derived top-1000 vocabulary
    // (df DESC, token ASC — the deterministic top-k both engines agree on);
    // the vocab re-enters as a broadcast, per-doc rates quantize to exact
    // ppm, and the output is a decile census per language — constant-size
    // regardless of corpus scale
    "q121_oov_rate" -> ((s, d) => {
      val tok = documents(s, d).select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("token"))
      val dfTok = tok.select("doc_id", "token").distinct()
        .groupBy("token").agg(count(lit(1)).as("df"))
      val vocab = dfTok.orderBy(col("df").desc, col("token")).limit(1000)
        .select(col("token"), lit(1L).as("in_vocab"))
      val perDoc = tok.join(broadcast(vocab), Seq("token"), "left")
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      perDoc.groupBy(col("lang"),
          expr("((n_oov * 1000000) div n_tokens) div 100000").as("oov_decile"))
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
    }),

    // recency-weighted rolling feature: a truncated EWMA over each user's
    // last 16 events with exact power-of-two weights (newest 2^15 … oldest
    // 2^0) — Σ(v·w) div Σ(w) on integers, no float decay chain whose
    // rounding would drift between engines. row_number caps per-user work
    // at 16 rows no matter the history length
    "q122_ewma_last16" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts_us"),
        ExactStats.micro(col("value")).cast("long").as("vm"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us").desc, col("event_id").desc)
      ev.withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 16)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_used"),
          max(when(col("rn") === 1, col("vm"))).as("last_micro"),
          expr("sum(vm * shiftleft(1L, cast(16 - rn as int))) div " +
            "sum(shiftleft(1L, cast(16 - rn as int)))").as("ewma_micro"))
    }),

    // interval-to-grid explode: 30-minute-gap sessions (the q104
    // session_window contract) unrolled onto the hour grid they overlap via
    // sequence() — the bounded-explode pattern that turns interval overlap
    // into an equi-keyed aggregate; census by hour of day stays 24 rows at
    // any scale
    "q123_session_hour_grid" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("event_time"))
      val sess = ev.groupBy(col("user_id"),
          session_window(col("event_time"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"))
      sess.select(col("user_id"), explode(sequence(
          expr("start_us div 3600000000"),
          expr("(end_us - 1) div 3600000000"))).as("hour_idx"))
        .groupBy(expr("hour_idx % 24").as("hour_of_day"))
        .agg(count(lit(1)).as("n_session_hours"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // weekday × hour seasonality profile: day-of-week from pure epoch-day
    // arithmetic ((days+4) mod 7, 0=Sunday — no engine-specific dow
    // convention), exact integer means; single map-side-combining aggregate
    "q124_weekday_profile" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"),
        expr("ts div 1000").as("ts_us"),
        ExactStats.micro(col("value")).cast("long").as("vm"))
      ev.groupBy(col("event_type"),
          expr("((ts_us div 86400000000) + 4) % 7").as("dow"),
          expr("(ts_us div 3600000000) % 24").as("hod"))
        .agg(count(lit(1)).as("n"), sum("vm").as("sum_micro"),
          expr("sum(vm) div count(1)").as("mean_micro"))
    }),

    // SCD2 version history + point-in-time lookup: per-user state = the
    // event type, versions = maximal runs of one state (the q117 run id),
    // validity [run start, next run start); the "as of T" state is read
    // with one predicate on the interval — no second scan, no sort beyond
    // the user-partition window the runs already need
    "q125_scd2_versions" -> ((s, d) => {
      val tMid = UpsertMidUs
      val ev = events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), expr("ts div 1000").as("ts_us"))
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val runs = ev.withColumn("prev", lag("event_type", 1).over(w))
        .withColumn("brk", when(col("prev").isNull ||
          col("prev") =!= col("event_type"), 1L).otherwise(0L))
        .withColumn("run_id", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "run_id", "event_type")
        .agg(min("ts_us").as("valid_from"))
      val wRun = Window.partitionBy("user_id").orderBy("run_id")
      runs.withColumn("valid_to", lead("valid_from", 1).over(wRun))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_versions"),
          max(when(col("valid_from") <= tMid &&
            (col("valid_to").isNull || col("valid_to") > tMid),
            col("event_type"))).as("state_at_t"),
          max(when(col("valid_from") <= tMid &&
            (col("valid_to").isNull || col("valid_to") > tMid),
            col("valid_from"))).as("t_version_start_us"))
    }),

    // sequence mining: the top-10 three-step event-type paths across all
    // user histories — two leads over one window, one aggregate, then a
    // deterministic ordered limit (count DESC, path ASC); candidate paths
    // are at most |types|³ so the agg output is tiny at any scale
    "q126_path_trigrams" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), col("ts"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      ev.withColumn("t2", lead("event_type", 1).over(w))
        .withColumn("t3", lead("event_type", 2).over(w))
        .where(col("t2").isNotNull && col("t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("path"))
        .limit(10)
    }),

    // token co-occurrence lift (PMI without the log): for top-100-df token
    // pairs, lift = P(ab)/(P(a)P(b)) = cnt·N/(df_a·df_b) in exact milli
    // units — the vocab bounds the self-join to ≤ C(100,2) pairs per doc
    // partition, and cnt·N·1000 widens to DECIMAL(38,0) before the product
    "q127_token_lift" -> ((s, d) => {
      val docs = documents(s, d)
      val tok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token")).distinct()
      val dfTok = tok.groupBy("token").agg(count(lit(1)).as("df"))
      val vocab = dfTok.orderBy(col("df").desc, col("token")).limit(100)
      val tv = tok.join(broadcast(vocab), Seq("token"))
      val n = docs.select(countDistinct("doc_id").as("n_docs"))
      val pairs = tv.select(col("doc_id"), col("token").as("token_a"),
          col("df").as("df_a"))
        .join(tv.select(col("doc_id"), col("token").as("token_b"),
          col("df").as("df_b")), "doc_id")
        .where(col("token_a") < col("token_b"))
        .groupBy("token_a", "df_a", "token_b", "df_b")
        .agg(count(lit(1)).as("cnt"))
      pairs.crossJoin(broadcast(n))
        .select(col("token_a"), col("token_b"), col("cnt"),
          expr("cast((cast(cnt as decimal(38,0)) * n_docs * 1000) div " +
            "(df_a * df_b) as bigint)").as("lift_milli"))
    }),

    // int8 vector quantization with exact reconstruction-error audit: per
    // dimension, min/max in micro units define the 0..255 code range;
    // codes, reconstruction, and |error| are all integer arithmetic on
    // non-negative offsets. Two passes over the exploded elements (bounds,
    // then errors with the 64-row bounds broadcast back) — both map-side
    // combinable, so the 64× explode never shuffles at element grain
    "q128_vector_quantize" -> ((s, d) => {
      val el = embeddings(s, d).select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          ExactStats.micro(col("x").cast("double")).cast("long").as("xm"))
      val bounds = el.groupBy("dim")
        .agg(min("xm").as("minm"), max("xm").as("maxm"))
      el.join(broadcast(bounds), "dim")
        .withColumn("q",
          expr("((xm - minm) * 255) div greatest(maxm - minm, 1L)"))
        .withColumn("recon",
          expr("minm + (q * (maxm - minm)) div 255"))
        .withColumn("err", abs(col("xm") - col("recon")))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"), min("minm").as("min_micro"),
          max("maxm").as("max_micro"),
          sum("err").as("sum_abs_err_micro"),
          max("err").as("max_abs_err_micro"),
          expr("sum(err) div count(1)").as("mean_abs_err_micro"))
    }),

    // compaction planning (the small-files problem at ingest): per
    // ship-month partition, rows → estimated bytes (fixed 120 B/row
    // contract) → file count at a 128 MiB target → rows per file, all in
    // ceil-division integer arithmetic over one aggregate
    "q129_compaction_plan" -> ((s, d) => {
      val target = 134217728L // 128 MiB
      lineitem(s, d)
        .groupBy(substring(col("l_shipdate").cast("string"), 1, 7).as("month"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("est_bytes", col("n_rows") * 120L)
        .withColumn("target_files",
          expr(s"(est_bytes + ${target - 1}) div $target"))
        .withColumn("rows_per_file",
          expr("(n_rows + target_files - 1) div target_files"))
    }),

    // band (range) join via bucketing: views within ±10 min of each
    // purchase for the same user — views replicate to their 3 neighbor
    // buckets (bucket width = tolerance, so any in-band pair shares
    // exactly one bucket key), the join stays equi-keyed on
    // (user, bucket), and the band predicate filters inside the join.
    // Zero-match purchases survive via the left join
    "q130_band_join_views" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), expr("ts div 1000").as("ts_us"))
      val tolUs = 600000000L
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_us").as("p_us"),
          expr(s"ts_us div $tolUs").as("bucket"))
      val v = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts_us").as("v_us"),
          expr(s"ts_us div $tolUs").as("b0"))
        .select(col("user_id"), col("v_us"),
          explode(array(col("b0") - 1, col("b0"), col("b0") + 1))
            .as("bucket"))
      p.join(v, p("user_id") === v("user_id") && p("bucket") === v("bucket")
          && abs(col("v_us") - col("p_us")) <= tolUs, "left")
        .groupBy(col("purchase_id"), p("user_id").as("user_id"), col("p_us"))
        .agg(count(col("v_us")).as("n_views_near"))
    }),

    // association/contingency analysis: market segment × order priority
    // with expected counts under independence and exact milli lift
    // obs·T/(r·c) — marginals are windows over the ≤ |seg|·|prio| cell
    // aggregate, never a second fact scan; obs·T·1000 widens to
    // DECIMAL(38,0) before the product
    "q131_segment_priority_lift" -> ((s, d) => {
      val o = orders(s, d).select(col("o_custkey"), col("o_orderpriority"))
      val c = customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      val cells = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("obs"))
      cells
        .withColumn("r_tot",
          sum("obs").over(Window.partitionBy("c_mktsegment")))
        .withColumn("c_tot",
          sum("obs").over(Window.partitionBy("o_orderpriority")))
        .withColumn("t_tot", sum("obs").over(Window.partitionBy()))
        .select(col("c_mktsegment"), col("o_orderpriority"), col("obs"),
          expr("cast((cast(r_tot as decimal(38,0)) * c_tot * 1000) div t_tot" +
            " as bigint)").as("expected_milli"),
          expr("cast((cast(obs as decimal(38,0)) * t_tot * 1000) div " +
            "(r_tot * c_tot) as bigint)").as("lift_milli"))
    }),

    // calendar-dimension build + coverage audit: the full day grid between
    // the first and last order (one global min/max, sequence explode —
    // calendar-bounded, never fact-bounded), day-of-week by epoch
    // arithmetic, per-day order counts left-joined so zero-order gap days
    // survive with is_gap = 1
    "q132_calendar_coverage" -> ((s, d) => {
      val o = orders(s, d).select(
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"))
      val span = o.agg(min("day").as("d0"), max("day").as("d1"))
      val grid = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val perDay = o.groupBy("day").agg(count(lit(1)).as("n_orders"))
      grid.join(perDay, Seq("day"), "left")
        .select(col("day"), expr("(day + 4) % 7").as("dow"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          when(col("n_orders").isNull, 1L).otherwise(0L).as("is_gap"))
    }),

    // indexed (rebased) series: monthly revenue as basis points of the
    // first month — first_value over the |months|-row aggregate; the bp
    // product widens to DECIMAL(38,0) (rev_units·1e4 crosses 2^63 at
    // ~100 TB revenue magnitudes)
    "q133_revenue_index" -> ((s, d) => {
      val monthly = lineitem(s, d)
        .groupBy(substring(col("l_shipdate").cast("string"), 1, 7).as("month"))
        .agg(sum(revenueUnits.cast("decimal(38,0)")).cast("long")
          .as("rev_units"))
      val w = Window.orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly
        .withColumn("base_units", first("rev_units").over(w))
        .select(col("month"), col("rev_units"),
          expr("cast((cast(rev_units as decimal(38,0)) * 10000) div " +
            "base_units as bigint)").as("index_bp"))
    }),

    // skyline (Pareto frontier) query: parts where no other part is both
    // bigger and cheaper — the frontier test runs on the |sizes|-row
    // min-price aggregate (a strict-larger cumulative min), and only
    // frontier (size, price) keys re-enter as a broadcast to pick the rows;
    // the fact table is never sorted globally
    "q134_pareto_frontier" -> ((s, d) => {
      val p = part(s, d).select(col("p_partkey"),
        col("p_size").cast("long").as("size"),
        cents(col("p_retailprice")).as("price_cents"))
      val bySize = p.groupBy("size").agg(min("price_cents").as("size_min"))
      val w = Window.orderBy(col("size").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val frontierSizes = bySize
        .withColumn("larger_min", min("size_min").over(w))
        .where(col("larger_min").isNull ||
          col("size_min") < col("larger_min"))
        .select(col("size"), col("size_min"))
      p.join(broadcast(frontierSizes), Seq("size"))
        .where(col("price_cents") === col("size_min"))
        .select(col("p_partkey"), col("size"), col("price_cents"))
    }),

    // dedup against a historical corpus: incoming docs (odd ids) are novel
    // iff their content fingerprint never appears in history (even ids) —
    // a fingerprint left-anti join, then a per-language novelty census in
    // exact ppm. The 8-byte fingerprint is all that shuffles, never text
    "q135_novelty_vs_history" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("lang"),
        TextOps.fingerprint(col("text")).as("fp"))
      val history = docs.where(col("doc_id") % 2 === 0).select("fp").distinct()
      val incoming = docs.where(col("doc_id") % 2 === 1)
      val novel = incoming.join(history, Seq("fp"), "left_anti")
        .groupBy("lang").agg(count(lit(1)).as("n_novel"))
      incoming.groupBy("lang").agg(count(lit(1)).as("n_incoming"))
        .join(novel, Seq("lang"), "left")
        .select(col("lang"), col("n_incoming"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          expr("(coalesce(n_novel, 0L) * 1000000) div n_incoming")
            .as("novelty_ppm"))
    }),

    // market concentration (Herfindahl index): per nation, Σ share_ppm² of
    // supplier revenue, rendered in ppm — shares are exact integer ppm per
    // supplier (window over the supplier-grain aggregate), squares stay in
    // LONG (share ≤ 1e6 ⇒ square ≤ 1e12)
    "q136_supplier_hhi" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_suppkey"), revenueUnits.as("rev"))
      val sup = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      val nat = nation(s, d).select(col("n_nationkey"), col("n_name"))
      val perSup = li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("s_suppkey"))
        .agg(sum(col("rev").cast("decimal(38,0)")).cast("long").as("rev_units"))
      perSup
        .withColumn("nation_units",
          sum("rev_units").over(Window.partitionBy("n_name")))
        .withColumn("share_ppm", expr(
          "(cast(rev_units as decimal(38,0)) * 1000000) div nation_units"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_suppliers"),
          expr("sum(share_ppm * share_ppm) div 1000000").as("hhi_ppm"))
    }),

    // watermark late-drop, observable: append-mode tumbling windows over a
    // 3-batch late-replay source — live head (even ids), in-watermark
    // top-up (odd ids after the fixed split), then a late replay of sealed
    // history (odd ids before it) arriving after its windows were evicted.
    // The oracle replays the measured drop rule (drop on arrival iff
    // window end ≤ the watermark set by the prior batch) and the final
    // emission rule as integer watermark arithmetic
    "q137_stream_late_drop" -> ((s, d) =>
      graft.streaming.StreamAgg.eventsWindowedLateDrop(s, d,
        windowSec = 300L, splitDir = s"$genDir/events_late_split",
        splitUs = UpsertMidUs,
        queryName = s"graft_stream_late_${System.nanoTime()}")),

    // WEIGHTED median: the q102 histogram-quantile contract with a weight
    // column (line quantity) — cumulative WEIGHT, not row count, crosses
    // the 50% threshold; shuffle carries (flag, bin) weight sums only
    "q138_weighted_median" -> ((s, d) => {
      val binW = 10000000L
      val li = lineitem(s, d).select(col("l_returnflag"),
        expr("floor(l_quantity + 0.5)").as("wgt"),
        revenueUnits.as("rev"))
      val bins = li.groupBy(col("l_returnflag"),
          expr(s"rev div $binW").as("bin"))
        .agg(sum("wgt").as("w"))
      val wCum = Window.partitionBy("l_returnflag").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy("l_returnflag")
      bins.withColumn("cum", sum("w").over(wCum))
        .withColumn("total", sum("w").over(wTot))
        .groupBy("l_returnflag")
        .agg(max("total").as("total_weight"),
          min(when(col("cum") * 2 >= col("total"), col("bin") * binW))
            .as("wmedian_units_lo"))
    }),

    // session-duration histogram: the q104 session_window sessions bucketed
    // by 5-minute duration bands — one census row per band, composing the
    // built-in session operator with integer bucketing
    "q139_session_duration_hist" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("event_time"))
      val sess = ev.groupBy(col("user_id"),
          session_window(col("event_time"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("n_events"),
          (unix_micros(col("w.end")) - unix_micros(col("w.start")))
            .as("dur_us"))
      sess.groupBy(expr("dur_us div 300000000").as("dur_bucket_5m"))
        .agg(count(lit(1)).as("n_sessions"),
          sum("n_events").as("sum_events"),
          max("dur_us").as("max_dur_us"))
    }),

    // Benford first-digit audit (fraud/quality signal on money columns):
    // the leading digit comes from the decimal STRING of the cents value —
    // pure integer+string ops, no log10 whose last ulp differs across
    // libm builds. Expected Benford shares ship as exact ppm literals;
    // observed share in ppm from one aggregate
    "q140_benford_audit" -> ((s, d) => {
      val benford = Seq(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
        4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L,
        9 -> 45757L)
      val expected = benford.map { case (dd, ppm) =>
        struct(lit(dd.toLong).as("digit"), lit(ppm).as("benford_ppm"))
      }
      val digits = orders(s, d).select(
        substring(cents(col("o_totalprice")).cast("string"), 1, 1)
          .cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
        .withColumn("total", sum("n").over(Window.partitionBy()))
        .select(col("digit"), col("n"),
          expr("(n * 1000000) div total").as("observed_ppm"))
      val exp = (s.range(1).select(
        explode(array(expected: _*)).as("e"))).select(col("e.*"))
      digits.join(broadcast(exp), Seq("digit"))
        .select(col("digit"), col("n"), col("observed_ppm"),
          col("benford_ppm"),
          (col("observed_ppm") - col("benford_ppm")).as("deviation_ppm"))
    }),

    // multi-touch attribution: each purchase's 1e6 ppm of credit splits
    // equally across its in-band views (the q130 bucketed band join), and
    // credit rolls up by the VIEW's hour of day — floor division leaves
    // ≤ (n_views−1) ppm unassigned per purchase, a documented remainder
    "q141_attribution_credit" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), expr("ts div 1000").as("ts_us"))
      val tolUs = 600000000L
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_us").as("p_us"), expr(s"ts_us div $tolUs").as("bucket"))
      val v = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts_us").as("v_us"),
          expr(s"ts_us div $tolUs").as("b0"))
        .select(col("user_id"), col("v_us"),
          explode(array(col("b0") - 1, col("b0"), col("b0") + 1))
            .as("bucket"))
      val pairs = p.join(v, Seq("user_id", "bucket"))
        .where(abs(col("v_us") - col("p_us")) <= tolUs)
        .select(col("purchase_id"), col("v_us"))
      pairs
        .withColumn("n_views",
          count(lit(1)).over(Window.partitionBy("purchase_id")))
        .select(expr("(v_us div 3600000000) % 24").as("view_hod"),
          expr("1000000 div n_views").as("credit_ppm"))
        .groupBy("view_hod")
        .agg(count(lit(1)).as("n_touches"),
          sum("credit_ppm").as("credit_ppm_total"))
    }),

    // trailing 7-DAY revenue via a RANGE frame on the sparse day series —
    // range frames measure VALUE distance (calendar days), not row
    // distance, so missing days shorten the window (n_days_in_window
    // exposes it); the window runs on the |days|-row aggregate
    "q142_rolling_7day_revenue" -> ((s, d) => {
      val daily = lineitem(s, d)
        .groupBy(expr(
          "unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
          .as("day"))
        .agg(sum(revenueUnits.cast("decimal(38,0)")).cast("long")
          .as("rev_units"))
      val w = Window.orderBy("day").rangeBetween(-6, 0)
      daily
        .withColumn("rev_7d_units", sum("rev_units").over(w))
        .withColumn("n_days_in_window", count(lit(1)).over(w))
    }),

    // hierarchy rollup with an EXACT DISTINCT aggregate: active customers
    // per (region, nation) and the rolled-up totals — distinct-under-
    // rollup is the Expand + two-shuffle stressor plain sums never hit;
    // totals coalesce to 'ALL' markers identically on both engines
    "q143_distinct_rollup" -> ((s, d) => {
      val o = orders(s, d).select(col("o_custkey"))
      val cust = customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val nat = nation(s, d).select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))
      val reg = region(s, d).select(col("r_regionkey"), col("r_name"))
      o.join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(countDistinct(col("o_custkey")).as("n_active_customers"),
          count(lit(1)).as("n_orders"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_active_customers"), col("n_orders"))
    }),

    // fulfillment lag: ship − order date in whole days, histogrammed per
    // priority — a fact-to-fact equi-join on the order key (co-partitioned
    // by the same key both sides shuffle on), then a tiny census
    "q144_fulfillment_lag" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_orderkey"), expr(
        "unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
        .as("ship_day"))
      val o = orders(s, d).select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("order_day"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"),
          (col("ship_day") - col("order_day")).as("lag_days"))
        .agg(count(lit(1)).as("n_lines"))
    }),

    // revenue concentration (Lorenz curve) from a value histogram — "the
    // top X% of orders carry Y% of revenue" as exact cumulative ppm per
    // $1000 bin; no global row sort, the curve lives on the |bins|-row
    // aggregate. cum_v·1e6 widens to DECIMAL(38,0) before the product
    "q145_lorenz_curve" -> ((s, d) => {
      val ov = orders(s, d).select(cents(col("o_totalprice")).as("v"))
      val bins = ov.groupBy(expr("v div 100000").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(38,0)")).cast("long").as("sv"))
      val wC = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wT = Window.partitionBy()
      bins
        .withColumn("cum_n", sum("n").over(wC))
        .withColumn("cum_v", sum("sv").over(wC))
        .withColumn("tot_n", sum("n").over(wT))
        .withColumn("tot_v", sum("sv").over(wT))
        .select(expr("bin * 100000").as("bin_lo_cents"), col("n"),
          expr("(cum_n * 1000000) div tot_n").as("cum_orders_ppm"),
          expr("cast((cast(cum_v as decimal(38,0)) * 1000000) div tot_v " +
            "as bigint)").as("cum_revenue_ppm"))
    }),

    // approximation-quality audit: LSH candidate pairs (q16's banding)
    // scored against the exact high-Jaccard truth set (q13's prefix-
    // filtered pairs) — recall and candidate precision in exact ppm, one
    // row out. The composition reuses both oracled pair generators, so
    // the audit cannot drift from what it audits
    "q146_lsh_recall_audit" -> ((s, d) => {
      val docs = documents(s, d)
      val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        minJaccard = 0.8, maxDocFreq = 1000L).select("id_a", "id_b")
      val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, minEstJaccard = 0.25)
        .select("id_a", "id_b")
      val hit = truth.join(lsh, Seq("id_a", "id_b"), "left_semi")
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(broadcast(lsh.agg(count(lit(1)).as("n_lsh"))))
        .crossJoin(broadcast(hit.agg(count(lit(1)).as("n_hit"))))
        .select(col("n_truth"), col("n_lsh"), col("n_hit"),
          expr("(n_hit * 1000000) div n_truth").as("recall_ppm"),
          expr("(n_hit * 1000000) div n_lsh").as("candidate_precision_ppm"))
    }),

    // the vector-side twin of q146: IVF ANN top-5 lists (q49's cell-probe
    // path) scored against exact brute-force cosine top-5 (q14) — set
    // recall in exact ppm, one row out, reusing both oracled rankers
    "q147_ann_recall_audit" -> ((s, d) => {
      val emb = embeddings(s, d)
      val qs = emb.where(col("vec_id") < 10)
      val exact = Similarity.cosineTopK(emb, qs, "vec_id", "embedding", 5)
        .select("query_id", "cand_id")
      val approx = Similarity.ivfCosineTopK(emb, qs, "vec_id", "embedding", 5,
        nCells = 16, nProbe = 4).select("query_id", "cand_id")
      val hit = exact.join(approx, Seq("query_id", "cand_id"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(broadcast(approx.agg(count(lit(1)).as("n_approx"))))
        .crossJoin(broadcast(hit.agg(count(lit(1)).as("n_hit"))))
        .select(col("n_exact"), col("n_approx"), col("n_hit"),
          expr("(n_hit * 1000000) div n_exact").as("recall_ppm"))
    }),

    // cohort lifetime-value curve: q113's retention matrix extended with
    // revenue and cumulative revenue per cohort over month offsets, plus
    // retention in exact ppm of the cohort's size (= its offset-0 actives,
    // which every member hits by definition of the cohort month). All
    // windows run on the (cohort, offset) aggregate, never raw orders
    "q148_cohort_ltv" -> ((s, d) => {
      val o = orders(s, d).select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("midx"),
        cents(col("o_totalprice")).as("v"))
      val w = Window.partitionBy("o_custkey")
      val cells = o.withColumn("cohort_idx", min("midx").over(w))
        .groupBy(col("cohort_idx"),
          (col("midx") - col("cohort_idx")).as("month_offset"))
        .agg(countDistinct(col("o_custkey")).as("active_customers"),
          sum(col("v").cast("decimal(38,0)")).cast("long").as("rev_cents"))
      val wCum = Window.partitionBy("cohort_idx").orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wCoh = Window.partitionBy("cohort_idx")
      cells
        .withColumn("cum_rev_cents", sum("rev_cents").over(wCum))
        .withColumn("cohort_size",
          max(when(col("month_offset") === 0, col("active_customers")))
            .over(wCoh))
        .select(col("cohort_idx"), col("month_offset"),
          col("active_customers"),
          expr("(active_customers * 1000000) div cohort_size")
            .as("retention_ppm"),
          col("rev_cents"), col("cum_rev_cents"))
    }),

    // TEMPORAL (point-in-time) join: each purchase joins the SCD2 state
    // version (q125's intervals) valid JUST BEFORE it (ts−1) — "which
    // state do users purchase from" (its own run would match trivially at
    // ts). The interval predicate rides the user_id equi-join (versions
    // per user are run-bounded, so the per-key fanout stays small);
    // census by prior state, first-ever-event purchases labeled 'none'
    "q149_temporal_state_join" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), expr("ts div 1000").as("ts_us"))
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val runs = ev.withColumn("prev", lag("event_type", 1).over(w))
        .withColumn("brk", when(col("prev").isNull ||
          col("prev") =!= col("event_type"), 1L).otherwise(0L))
        .withColumn("run_id", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "run_id", "event_type")
        .agg(min("ts_us").as("valid_from"))
      val wRun = Window.partitionBy("user_id").orderBy("run_id")
      val versions = runs
        .withColumn("valid_to", lead("valid_from", 1).over(wRun))
        .select(col("user_id").as("v_user"), col("event_type").as("state"),
          col("valid_from"), col("valid_to"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      purchases.join(versions,
          col("user_id") === col("v_user") &&
          col("valid_from") <= col("ts_us") - 1 &&
          (col("valid_to").isNull || col("valid_to") > col("ts_us") - 1),
          "left")
        .groupBy(coalesce(col("state"), lit("none")).as("state_before"))
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // classical autocorrelation: the hourly event-count series per type,
    // lagged against itself at k = 1..6 hours. Pairing is an equi-join on
    // (type, hour+k) over the HOURLY AGGREGATE (hours with no events pair
    // as absent, not zero — gap semantics documented in the contract), so
    // raw-event volume never enters the join. The correlation block is the
    // exact-integer pairCorr contract below
    "q150_acf" -> ((s, d) => {
      val ser = events(s, d)
        .groupBy(col("event_type"),
          expr("(ts div 1000) div 3600000000").as("h"))
        .agg(count(lit(1)).as("cnt"))
      val lags = s.range(1, 7).select(col("id").as("lag_h"))
      val a = ser.select(col("event_type"), col("h"), col("cnt").as("x"))
        .crossJoin(broadcast(lags))
      val b = ser.select(col("event_type").as("et2"), col("h").as("h2"),
        col("cnt").as("y"))
      val pairs = a.join(b, col("event_type") === col("et2") &&
        col("h2") === col("h") + col("lag_h"))
      pairCorr(pairs, Seq("event_type", "lag_h"))
    }),

    // cross-correlation lag scan: do purchases track clicks, and at what
    // hourly offset? x = click count at hour h, y = purchase count at
    // h + lag for lag in -6..+6; only hours where both series have mass
    // pair up (inner join on the hour key). The 13-row output is the full
    // scan — the peak-r² row is the discovered lead/lag
    "q151_cross_correlation" -> ((s, d) => {
      val hourly = events(s, d)
        .groupBy(col("event_type"),
          expr("(ts div 1000) div 3600000000").as("h"))
        .agg(count(lit(1)).as("cnt"))
      val clicks = hourly.where(col("event_type") === "click")
        .select(col("h"), col("cnt").as("x"))
      val purch = hourly.where(col("event_type") === "purchase")
        .select(col("h").as("h2"), col("cnt").as("y"))
      val lags = s.range(-6, 7).select(col("id").as("lag_h"))
      val pairs = clicks.crossJoin(broadcast(lags))
        .join(purch, col("h2") === col("h") + col("lag_h"))
      pairCorr(pairs, Seq("lag_h"))
    }),

    // seasonal decomposition of the daily order-count series: trend = the
    // centered 7-day moving average (exact: 7-day window sum ×1000 div 7,
    // edges with a short window dropped), seasonal index per weekday = the
    // mean detrended deviation. The day grid is generated dense (gap days
    // count 0) so the moving window is calendar-true; every window runs on
    // the ~2.4k-row day aggregate, never on raw orders
    "q152_seasonal_decomposition" -> ((s, d) => {
      val days = orders(s, d)
        .groupBy(expr(
          "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("d"))
        .agg(count(lit(1)).as("cnt"))
      val grid = days.agg(min("d").as("d0"), max("d").as("d1"))
        .select(explode(expr("sequence(d0, d1)")).as("d"))
      val dense = grid.join(days, Seq("d"), "left")
        .select(col("d"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      val w = Window.orderBy("d").rowsBetween(-3, 3)
      dense
        .withColumn("win_n", count(lit(1)).over(w))
        .withColumn("s7", sum("cnt").over(w))
        .where(col("win_n") === 7)
        .withColumn("trend_milli", expr("(s7 * 1000) div 7"))
        .withColumn("dev_milli", expr("cnt * 1000 - trend_milli"))
        .groupBy(expr("(d + 4) % 7").as("dow"))
        .agg(count(lit(1)).as("n_days"), sum("cnt").as("sum_cnt"),
          sum("dev_milli").as("sum_dev_milli"))
        .select(col("dow"), col("n_days"),
          expr("(sum_cnt * 1000) div n_days").as("mean_cnt_milli"),
          col("sum_dev_milli"),
          expr("cast(floor(cast(sum_dev_milli as double) " +
            "/ cast(n_days as double) + 0.5) as bigint)")
            .as("seasonal_milli"))
    }),

    // Theil–Sen robust trend: per-nation monthly revenue slope as the
    // lower median of ALL pairwise (Δrev/Δmonth) slopes — outlier months
    // move the estimate far less than OLS. The pairwise self-join is
    // quadratic in MONTHS PER NATION (calendar-bounded, ~84 here), not in
    // rows: it grows O(years²) however large the fact table gets. Median =
    // the (n+1) div 2-th order statistic, exact on integer milli slopes
    "q153_theil_sen_trend" -> ((s, d) => {
      val cust = customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val nat = nation(s, d).select(col("n_nationkey"), col("n_name"))
      val monthly = orders(s, d).select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("m"),
          cents(col("o_totalprice")).as("v"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("m"))
        .agg(sum(col("v").cast("decimal(38,0)")).cast("long")
          .as("rev_cents"))
      val bSide = monthly.select(col("n_name").as("nn2"), col("m").as("m2"),
        col("rev_cents").as("rc2"))
      // the b-side is the (nation × month) aggregate — calendar-bounded
      // (~2k rows however big the fact table is), so broadcast beats SMJ
      val pairs = monthly.join(broadcast(bSide),
          col("n_name") === col("nn2") && col("m2") > col("m"))
        .select(col("n_name"),
          expr("cast(floor(1000.0 * cast(rc2 - rev_cents as double) " +
            "/ cast(m2 - m as double) + 0.5) as bigint)").as("slope_milli"))
      val wN = Window.partitionBy("n_name")
      val wO = Window.partitionBy("n_name").orderBy(col("slope_milli"))
      pairs.withColumn("rn", row_number().over(wO))
        .withColumn("n_pairs", count(lit(1)).over(wN))
        .where(col("rn") === expr("(n_pairs + 1) div 2"))
        .select(col("n_name"), col("n_pairs"),
          col("slope_milli").as("ts_slope_milli"))
    }),

    // train/serve distribution drift: events.value histogram of the first
    // half of the time range vs the second, 20 equal-width bins over the
    // global micro range. Shares are exact integer ppm of each half's
    // total; total-variation distance = Σ|Δshare| div 2 rides every row
    // as a constant. One scan builds both halves' counts (conditional
    // sums); the only "global" state is the 4-value bounds broadcast and
    // a ≤20-row window
    "q154_distribution_drift" -> ((s, d) => {
      val ev = events(s, d).select(expr("ts div 1000").as("ts_us"),
        expr("cast(floor(value * 1e6) as long)").as("vm"))
      val bounds = ev.agg(min("ts_us").as("t0"), max("ts_us").as("t1"),
        min("vm").as("v0"), max("vm").as("v1"))
      val binned = ev.crossJoin(broadcast(bounds))
        .select(
          when(col("ts_us") < expr("(t0 + t1) div 2"), lit(1L))
            .otherwise(lit(2L)).as("half"),
          least(lit(19L), expr("((vm - v0) * 20) div (v1 - v0 + 1)"))
            .as("bin"))
      val cells = binned.groupBy("bin")
        .agg(sum(when(col("half") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("half") === 2, 1L).otherwise(0L)).as("n2"))
      val wAll = Window.partitionBy()
      cells
        .withColumn("t1c", sum("n1").over(wAll))
        .withColumn("t2c", sum("n2").over(wAll))
        .withColumn("share1_ppm", expr("(n1 * 1000000) div t1c"))
        .withColumn("share2_ppm", expr("(n2 * 1000000) div t2c"))
        .withColumn("abs_diff_ppm",
          abs(col("share1_ppm") - col("share2_ppm")))
        .withColumn("sum_abs", sum("abs_diff_ppm").over(wAll))
        .select(col("bin"), col("n1"), col("n2"), col("share1_ppm"),
          col("share2_ppm"), col("abs_diff_ppm"),
          expr("sum_abs div 2").as("tvd_ppm"))
    }),

    // reciprocal-rank fusion: the standard way to merge two retrieval
    // rankings without score calibration. Fuses the exact cosine top-20
    // (q14's ranker) with the raw dot-product (max-inner-product) top-20;
    // RRF credit 1e6 div (60 + rank) is pure integer, candidates missing
    // from one list get 0 from it. Top-5 per query by (credit, id) —
    // deterministic end to end
    "q155_rrf_fusion" -> ((s, d) => {
      val emb = embeddings(s, d)
      val qs = emb.where(col("vec_id") < 10)
      val a = Similarity.cosineTopK(emb, qs, "vec_id", "embedding", 20)
        .select(col("query_id"), col("cand_id"), col("rank").as("rank_cos"))
      val b = Similarity.dotTopK(emb, qs, "vec_id", "embedding", 20)
        .select(col("query_id"), col("cand_id"), col("rank").as("rank_dot"))
      val fused = a.join(b, Seq("query_id", "cand_id"), "full_outer")
        .withColumn("rrf_micro",
          expr("coalesce(1000000 div (60 + rank_cos), 0) + " +
            "coalesce(1000000 div (60 + rank_dot), 0)"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("rrf_micro").desc, col("cand_id"))
      fused.withColumn("fused_rank", row_number().over(w))
        .where(col("fused_rank") <= 5)
        .select(col("query_id"), col("cand_id"), col("rank_cos"),
          col("rank_dot"), col("rrf_micro"), col("fused_rank"))
    }),

    // A/B experiment readout: deterministic arm assignment (user_id
    // parity), conversion = user ever purchased. Rates in exact ppm; the
    // 2×2 chi-square statistic N·(ad−bc)²/(row·col margins) is computed
    // from the four exact counts (DECIMAL/HUGEINT cross-products, final
    // ratio in doubles over identical integers — partition-order-proof).
    // One scan → per-user flag → a single 4-counter row
    "q156_ab_test" -> ((s, d) => {
      val users = events(s, d).select(col("user_id"), col("event_type"))
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      val arms = users.groupBy().agg(
        sum(when(expr("user_id % 2") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(expr("user_id % 2") === 0, col("conv")).otherwise(0L))
          .as("conv_a"),
        sum(when(expr("user_id % 2") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(expr("user_id % 2") === 1, col("conv")).otherwise(0L))
          .as("conv_b"))
      arms
        .withColumn("det", expr(
          "cast(conv_a as decimal(38,0)) * (n_b - conv_b) " +
            "- cast(n_a - conv_a as decimal(38,0)) * conv_b"))
        .withColumn("mrg1", expr("cast(n_a as decimal(38,0)) * n_b"))
        .withColumn("mrg2", expr(
          "cast(conv_a + conv_b as decimal(38,0)) " +
            "* ((n_a - conv_a) + (n_b - conv_b))"))
        .select(col("n_a"), col("conv_a"),
          expr("(conv_a * 1000000) div n_a").as("rate_a_ppm"),
          col("n_b"), col("conv_b"),
          expr("(conv_b * 1000000) div n_b").as("rate_b_ppm"),
          expr("(conv_a * 1000000) div n_a - (conv_b * 1000000) div n_b")
            .as("diff_ppm"),
          expr("cast(case when mrg1 = 0 or mrg2 = 0 then null else " +
            "floor(cast(n_a + n_b as double) * cast(det as double) " +
            "* cast(det as double) " +
            "/ (cast(mrg1 as double) * cast(mrg2 as double)) * 1000 + 0.5) " +
            "end as bigint)").as("chi2_milli"))
    }),

    // tokenizer-sizing curve: what share of all token OCCURRENCES does a
    // top-k vocabulary cover, for k in {100, 300, 1000, 3000}? Rank =
    // (count DESC, token) — fully deterministic. The global sort is a
    // distributed top-3000 (TakeOrderedAndProject), so only 3000 rows ever
    // see the single-partition cumulative window however large the vocab
    "q157_vocab_coverage" -> ((s, d) => {
      import s.implicits._
      val toks = documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val totals = toks.agg(sum("cnt").as("total_cnt"),
        count(lit(1)).as("n_vocab"))
      val top = toks.orderBy(col("cnt").desc, col("tok")).limit(3000)
      val wR = Window.orderBy(col("cnt").desc, col("tok"))
      val ranked = top
        .withColumn("rank", row_number().over(wR).cast("long"))
        .withColumn("cum_cnt", sum("cnt").over(
          wR.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(totals))
      val ks = Seq(100L, 300L, 1000L, 3000L).toDF("k")
      ranked.join(broadcast(ks),
          col("rank") === least(col("k"), col("n_vocab")))
        .select(col("k"), col("rank").as("vocab_size"),
          col("cum_cnt").as("covered_tokens"),
          col("total_cnt").as("total_tokens"),
          expr("(cum_cnt * 1000000) div total_cnt").as("coverage_ppm"))
    }),

    // classifier agreement: Cohen's kappa between the n-gram language-ID
    // prediction (q11's classifier) and the labeled lang column. Kappa is
    // rational in the confusion counts — (agree·N − Σ row_c·col_c) /
    // (N² − Σ row_c·col_c) — so the whole statistic reduces to exact
    // DECIMAL/HUGEINT integers; the corpus collapses to a ≤25-cell
    // confusion matrix in one pass
    "q158_kappa_agreement" -> ((s, d) => {
      val cells = TextOps.langId(documents(s, d))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
      val rows = cells.groupBy(col("lang").as("cls")).agg(sum("n").as("rn"))
      val cols = cells.groupBy(col("lang_pred").as("cls"))
        .agg(sum("n").as("cn"))
      val sAgg = rows.join(cols, Seq("cls"), "full_outer")
        .select(coalesce(col("rn"), lit(0L)).as("rn"),
          coalesce(col("cn"), lit(0L)).as("cn"))
        .agg(sum(expr("cast(rn as decimal(38,0)) * cn")).as("s"))
      val tot = cells.agg(sum("n").as("n_docs"),
        sum(when(col("lang") === col("lang_pred"), col("n")).otherwise(0L))
          .as("n_agree"))
      tot.crossJoin(broadcast(sAgg))
        .withColumn("num", expr(
          "cast(n_agree as decimal(38,0)) * n_docs - s"))
        .withColumn("den", expr(
          "cast(n_docs as decimal(38,0)) * n_docs - s"))
        .select(col("n_docs"), col("n_agree"),
          expr("(n_agree * 1000000) div n_docs").as("po_ppm"),
          expr("cast(floor(cast(s as double) / (cast(n_docs as double) " +
            "* cast(n_docs as double)) * 1e6 + 0.5) as bigint)")
            .as("pe_ppm"),
          expr("cast(case when den = 0 then null else " +
            "floor(cast(num as double) / cast(den as double) * 1000 + 0.5) " +
            "end as bigint)").as("kappa_milli"))
    }),

    // targeting gain curve (cumulative gains): rank users by click count
    // and ask what share of all purchases the top slice captures. The
    // curve lives on the DISTINCT SCORE grain (clicks-per-user is a small
    // integer domain), so the cumulative windows see a handful of rows
    // however many users exist — the scale-safe alternative to a global
    // per-user ntile
    "q159_gain_curve" -> ((s, d) => {
      val perUser = events(s, d).groupBy("user_id").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("score"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purch"))
      val byScore = perUser.groupBy("score")
        .agg(count(lit(1)).as("n_users"), sum("purch").as("n_purch"))
      val wCum = Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      byScore
        .withColumn("cum_users", sum("n_users").over(wCum))
        .withColumn("cum_purch", sum("n_purch").over(wCum))
        .withColumn("tu", sum("n_users").over(wAll))
        .withColumn("tp", sum("n_purch").over(wAll))
        .select(col("score"), col("n_users"), col("n_purch"),
          col("cum_users"), col("cum_purch"),
          expr("(cum_users * 1000000) div tu").as("user_share_ppm"),
          expr("cast(case when tp = 0 then null else " +
            "(cum_purch * 1000000) div tp end as bigint)")
            .as("capture_ppm"))
    }),

    // exact ROC-AUC: does the English-stopword count classify lang='en'?
    // AUC = Mann-Whitney U with tie mid-ranks, which on the DISTINCT-SCORE
    // grain is U·2 = Σ_s n_pos(s)·(2·negatives_below(s) + n_neg(s)) — an
    // exact integer (ties contribute the ½ mid-rank as the un-halved
    // n_neg term). No per-row ranking, no global sort: the curve collapses
    // to the score histogram first
    "q160_exact_auc" -> ((s, d) => {
      val stops = array(Seq("the", "a", "of", "and", "to", "in", "is",
        "on", "for", "with").map(lit): _*)
      val scored = documents(s, d).select(
        (col("lang") === "en").cast("long").as("pos"),
        size(filter(split(col("text"), " "),
          t => array_contains(stops, t))).cast("long").as("score"))
      val cells = scored.groupBy("score").agg(
        sum("pos").as("n_pos"), sum(expr("1 - pos")).as("n_neg"))
      val wBelow = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      cells
        .withColumn("cum_neg_below",
          coalesce(sum("n_neg").over(wBelow), lit(0L)))
        .agg(sum("n_pos").as("np"), sum("n_neg").as("nn"),
          sum(expr("cast(n_pos as decimal(38,0)) " +
            "* (2 * cast(cum_neg_below as decimal(38,0)) + n_neg)"))
            .as("u2"))
        .select(col("np").as("n_pos"), col("nn").as("n_neg"),
          expr("cast(case when np = 0 or nn = 0 then null else " +
            "floor(cast(u2 as double) " +
            "/ (2.0 * cast(np as double) * cast(nn as double)) " +
            "* 1e6 + 0.5) end as bigint)").as("auc_ppm"))
    }),

    // k-anonymity risk census: quasi-identifier = (nation, market
    // segment, $1000 balance band); for k ∈ {2,5,10}, how many customers
    // sit in groups smaller than k? The audit runs on the GROUP-SIZE
    // HISTOGRAM (a handful of rows), so the k-sweep never rescans the
    // table — the standard re-identification risk readout before a
    // data release
    "q161_k_anonymity" -> ((s, d) => {
      import s.implicits._
      val qi = customer(s, d).select(col("c_nationkey"),
        col("c_mktsegment"),
        expr("cast(floor(c_acctbal / 1000.0) as long)").as("bal_band"))
      val sizes = qi.groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("gsz"))
      val hist = sizes.groupBy("gsz").agg(count(lit(1)).as("n_groups"))
      val tot = hist.agg(sum(expr("gsz * n_groups")).as("n_rows"),
        sum("n_groups").as("n_groups_tot"))
      val ks = Seq(2L, 5L, 10L).toDF("k")
      ks.crossJoin(broadcast(hist)).crossJoin(broadcast(tot))
        .groupBy("k", "n_groups_tot", "n_rows")
        .agg(sum(when(col("gsz") < col("k"), col("n_groups"))
            .otherwise(0L)).as("small_groups"),
          sum(when(col("gsz") < col("k"), expr("gsz * n_groups"))
            .otherwise(0L)).as("small_rows"))
        .select(col("k"), col("n_groups_tot"), col("n_rows"),
          col("small_groups"), col("small_rows"),
          expr("(small_rows * 1000000) div n_rows").as("risk_ppm"))
    }),

    // Poisson bootstrap: the one-pass resampling estimator used at scales
    // where true resampling is impossible — replicate b includes each
    // order with multiplicity ~ Poisson(1), derived DETERMINISTICALLY
    // from an LCG hash of (orderkey, b) against the fixed cumulative-
    // Poisson thresholds (integer ppm of 10000), so both engines draw the
    // exact same resamples. One scan fans out to B=20 replicate totals
    // with map-side combine; the spread of the 20 means IS the CI
    "q162_poisson_bootstrap" -> ((s, d) => {
      val reps = orders(s, d)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("v"))
        .crossJoin(broadcast(s.range(1, 21).select(col("id").as("b"))))
        .withColumn("h", expr(
          "((o_orderkey % 2147483647) * 48271 + b * 16807) % 2147483647"))
        .withColumn("u", expr("h % 10000"))
        // cumulative Poisson(1)·10000: P(0)=.3679, P(≤1)=.7358, P(≤2)=.9197,
        // P(≤3)=.9810, P(≤4)=.9963; the 37/10000 tail collapses to m=5
        .withColumn("mult", expr("case when u < 3679 then 0 " +
          "when u < 7358 then 1 when u < 9197 then 2 " +
          "when u < 9810 then 3 when u < 9963 then 4 else 5 end"))
      reps.groupBy("b")
        .agg(sum("mult").as("n_eff"),
          sum(expr("cast(mult as decimal(38,0)) * v")).cast("long")
            .as("total_cents"))
        .select(col("b"), col("n_eff"), col("total_cents"),
          expr("cast(case when n_eff = 0 then null else " +
            "floor(cast(total_cents as double) / cast(n_eff as double) " +
            "* 10.0 + 0.5) end as bigint)").as("mean_milli"))
    }),

    // streaming UPDATE-mode emission log: tumbling counts over the 2-batch
    // id-parity split with no watermark — the memory sink appends each
    // batch's updated groups, so the result IS the emission history:
    // (window, type) touched by batch i carries its cumulative aggregate
    // over batches ≤ i. The oracle replays that rule relationally from
    // the batch-membership predicate (event_id parity)
    "q163_stream_update_mode" -> ((s, d) =>
      graft.streaming.StreamAgg.eventsWindowedUpdateMode(s, d,
        windowSec = 300L, splitDir = s"$genDir/events_parity_split",
        queryName = s"graft_stream_upd_${System.nanoTime()}")),

    // SemDeDup-style semantic dedup: one broadcast k-means assignment step
    // (q65's deterministic id<k seeding) buckets the embedding space, then
    // near-duplicates are pruned WITHIN clusters only — Σ|cluster|² pairs,
    // never N² (the learned-bucket version of the LSH/IVF bound). Priority
    // keeps the vectors least similar to their centroid; the dropped-set
    // id checksum makes membership bitwise-checkable
    "q184_semdedup" -> ((s, d) =>
      graft.sim.Clustering.semDedup(embeddings(s, d), "vec_id", "embedding",
        k = 8, tau = 0.35)),

    // q184's scale-parameterized form: k derived from the corpus count
    // (ceil(n/32) — cluster size, and with it the Σ|cluster|² pair bound,
    // stays fixed as N grows), centroids refined by one Lloyd iterate over
    // the exact integer sums, and the dropper side capped at the 8
    // least-central vectors per cluster (pairs ≤ 8·|cluster|, linear in
    // cluster size). The oracle replays the count→k derivation, the mean
    // update, the re-assignment, and the capped prune verbatim
    "q229_semdedup_auto" -> ((s, d) =>
      graft.sim.Clustering.semDedupAuto(embeddings(s, d), "vec_id",
        "embedding", targetClusterSize = 32L, tau = 0.35,
        maxDroppersPerCluster = 8)),

    // deterministic training reshard: shard + intra-shard position are pure
    // functions of the content fingerprint (no rand(), no global sort — one
    // hash exchange + per-shard sort, with nShards scaling with the corpus).
    // The census pins the full placement: per-shard sizes prove balance,
    // min/max fp the bucketing, and ord_check — Σ pos·(fp mod 1000), an
    // order-weighted checksum — pins the intra-shard ORDER itself, so any
    // reordering regression flips the hash. pos·(fp mod 1000) ≤ 10³·rows
    // per shard keeps the DECIMAL(38,0) sum exact at any corpus size
    "q230_shard_shuffle" -> ((s, d) =>
      graft.text.Shard.shardPlacement(documents(s, d), "doc_id", "text",
          nShards = 8)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          min("fp").as("min_fp"), max("fp").as("max_fp"),
          sum((col("pos") * pmod(col("fp"), lit(1000L)))
            .cast("decimal(38,0)")).cast("long").as("ord_check"))),

    // model-based quality filtering: a fixed integer linear classifier over
    // four corpus-quality features (the fastText-quality-model pattern as
    // one codegen'd projection — sign(margin) is the decision, so no
    // sigmoid/float). Census by (lang, keep) with the margin moments, so
    // the oracle pins every per-document margin through the sums
    "q231_quality_classifier" -> ((s, d) =>
      TextOps.linearQualityMargin(documents(s, d))
        .groupBy("lang", "keep")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("margin").cast("decimal(38,0)")).cast("long")
            .as("sum_margin"),
          min("margin").as("min_margin"), max("margin").as("max_margin"))),

    // KMV corpus-overlap sketch: per-source bottom-k=128 distinct shingle
    // fingerprints (ONE mergeable aggregate — the shuffle carries ≤
    // sources·k longs at any corpus size), then source-pair union /
    // intersection estimates computed entirely ON THE SKETCHES (Beyer et
    // al. 2007): est_union from the union's k-th value, est_inter from
    // shared-hash counts below it. Exact distincts ride alongside as the
    // audit (affordable at test scale; the sketch path is the 100 TB one).
    // Pairs limited to the 4 lexicographically-first sources (6 pairs) to
    // keep the contract readable; every estimate is integer floor-division
    "q232_kmv_overlap" -> ((s, d) => {
      val k = 128
      val srcs = Seq("src0", "src1", "src10", "src11")
      val sh = documents(s, d)
        .where(col("source").isin(srcs.map(x => x: Any): _*))
        .select(col("source"), explode(TextOps.shingles(col("text"), 3))
          .as("g"))
        .select(col("source"), TextOps.fingerprint(col("g")).as("h"))
      // the sketch is referenced by four downstream branches (est, union,
      // and both intersection probes) — localCheckpoint materializes the
      // sources·k rows ONCE, so the corpus scan + aggregate runs once, not
      // once per branch (the difference between 1 and 6 corpus scans at
      // 100 TB; everything after this line is sketch-sized)
      val sk = graft.ops.Sketch.kmvSketch(sh, Seq("source"), "h", k)
        .localCheckpoint()
      val est = graft.ops.Sketch.kmvEstimate(sk, Seq("source"), k)
      // source pairs (a < b) over the tiny sketch: union = distinct hash
      // merge re-truncated to bottom-k, intersection = shared below kth_u
      val pairs = est.as("ea").crossJoin(est.as("eb"))
        .where(col("ea.source") < col("eb.source"))
        .select(col("ea.source").as("sa"), col("eb.source").as("sb"),
          col("ea.kmv_est").as("est_a"), col("eb.kmv_est").as("est_b"))
      val skA = sk.select(col("source"), col("h"))
      val uni = pairs.join(skA, skA("source") === col("sa") ||
          skA("source") === col("sb"))
        .select(col("sa"), col("sb"), col("h")).distinct()
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("sa", "sb")
            .orderBy("h")))
        .where(col("r") <= k)
      val uStats = uni.groupBy("sa", "sb")
        .agg(count(lit(1)).as("n_u"), max("h").as("kth_u"))
        .withColumn("est_union", when(col("n_u") < k, col("n_u"))
          .otherwise(expr(s"(${k - 1}L * ${graft.ops.Sketch.KmvM}) div (kth_u + 1)")))
      val inBoth = uni.join(skA.select(col("source").as("sa"), col("h")),
          Seq("sa", "h"))
        .join(skA.select(col("source").as("sb"), col("h")), Seq("sb", "h"))
        .groupBy("sa", "sb").agg(count(lit(1)).as("n_shared"))
      pairs.join(uStats, Seq("sa", "sb"))
        .join(inBoth, Seq("sa", "sb"), "left")
        .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
        // denominator = the union sketch's actual size: when the union has
        // fewer than k values the sketch IS the exact union and n_shared
        // the exact intersection — dividing by the constant k there would
        // undercount precisely where the sketch could be exact
        .withColumn("est_inter",
          expr(s"(n_shared * est_union) div least($k, n_u)"))
        .select("sa", "sb", "est_a", "est_b", "est_union", "n_shared",
          "est_inter")
    }),

    // synchronous label propagation (community detection) over the q192
    // spatial near-neighbor graph: 3 FIXED rounds, each ONE vote aggregate
    // (neighbor labels counted, winner = max count with min-label
    // tie-break as a partially-aggregable min-of-struct) + one left join
    // back, lineage snapped per round — the Pregel shape at one shuffle
    // per round, no driver-side graph. The census (community size →
    // count, label checksum) pins every final label through the sums
    "q233_label_propagation" -> ((s, d) => {
      val pts = customer(s, d).select(col("c_custkey").as("id"),
          expr("(c_custkey * 48271) % 100000").as("x"),
          expr("(c_custkey * 69621) % 100000").as("y"))
        .withColumn("cx", expr("x div 2000"))
        .withColumn("cy", expr("y div 2000"))
      val offs = for { dx <- Seq(-1, 0, 1); dy <- Seq(-1, 0, 1) }
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
      val probe = pts.withColumn("o", explode(array(offs: _*)))
        .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
          (col("cx") + col("o.dx")).as("jcx"),
          (col("cy") + col("o.dy")).as("jcy"))
      val home = pts.select(col("id").as("b_id"), col("x").as("bx"),
        col("y").as("b_y"), col("cx").as("jcx"), col("cy").as("jcy"))
      val und = probe.join(home, Seq("jcx", "jcy"))
        .where(col("a_id") < col("b_id"))
        .where(expr("(ax - bx) * (ax - bx) + (ay - b_y) * (ay - b_y)") <=
          lit(4000000L))
        .select(col("a_id"), col("b_id"))
      val edges = und.select(col("a_id").as("u"), col("b_id").as("v"))
        .union(und.select(col("b_id").as("u"), col("a_id").as("v")))
      val lbl = graft.ops.LabelProp.propagate(edges,
        pts.select(col("id").as("node"), col("id").as("lbl")), rounds = 3)
      lbl.groupBy("lbl").agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("comm_size"))
        .agg(count(lit(1)).as("n_comms"),
          sum(col("lbl").cast("decimal(38,0)")).cast("long").as("label_sum"))
    }),

    // native WITH RECURSIVE (new in Spark 4): bounded-depth walk census
    // over the nation supply graph, written ONCE in ANSI SQL and executed
    // verbatim by BOTH engines — the Spark side registers the base tables
    // as temp views and runs the very string the oracle runs, so the
    // contract pins Spark's recursive-CTE semantics (seed + UNION ALL
    // step, depth-bounded) against an independent implementation.
    // Complements q164, whose Spark side is the iterative-DataFrame BFS
    "q235_recursive_cte" -> ((s, d) => {
      lineitem(s, d).createOrReplaceTempView("lineitem_r")
      orders(s, d).createOrReplaceTempView("orders_r")
      supplier(s, d).createOrReplaceTempView("supplier_r")
      customer(s, d).createOrReplaceTempView("customer_r")
      s.sql(RecursiveReachSql("lineitem_r", "orders_r", "supplier_r",
        "customer_r"))
    }),

    // SQL scalar UDF (CREATE FUNCTION ... RETURN, new in Spark 4): the
    // catalog-function surface — a price-tier function defined IN SQL,
    // inlined by the analyzer into the plan (stays codegen'd; unlike a
    // Scala UDF it is no black box to the optimizer). The oracle inlines
    // the identical CASE, so the function body is hash-checked
    "q236_sql_udf" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders_u")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_price_tier(
        cents BIGINT) RETURNS STRING RETURN
        CASE WHEN cents < 5000000 THEN 'low'
             WHEN cents < 15000000 THEN 'mid'
             WHEN cents < 30000000 THEN 'high' ELSE 'jumbo' END""")
      s.sql("""SELECT graft_price_tier(
          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS tier,
        count(*) AS n_orders,
        CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(38,0)))
          AS BIGINT) AS sum_cents
        FROM orders_u GROUP BY 1""")
    }),

    // deterministic negative sampling for contrastive training: per query
    // vector, 4 pseudo-random negatives drawn by a pairwise hash —
    // label-aware (same-class candidates excluded, the supervised-
    // contrastive rule) and reproducible across re-runs/partitionings
    // (the df.sample() problem again — a training pair list must be
    // replayable). Scale shape: the per-pair hash filter keeps ~5% of
    // candidates before the k-bounded bottom-k aggregate ranks them; the
    // pair stage is a broadcast nested loop over the tiny query set —
    // cheap integer hashing per pair, no dot products, no shuffle of the
    // corpus
    "q237_negative_sampling" -> ((s, d) => {
      val emb = embeddings(s, d)
      val q = broadcast(emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("label").as("ql")))
      val c = emb.select(col("vec_id").as("cand_id"), col("label").as("cl"))
      val scored = c.crossJoin(q)
        .where(col("query_id") =!= col("cand_id") && col("ql") =!= col("cl"))
        .withColumn("h",
          expr("(query_id * 131071 + cand_id * 48271) % 2147483647"))
        .where(col("h") * 20 < lit(2147483647L))
        .withColumn("neg_h", -col("h").cast("double"))
      graft.sim.TopK.rankTopK(scored, "neg_h", 4)
        .select(col("query_id"), col("cand_id").as("neg_id"),
          (-col("neg_h")).cast("long").as("h"), col("rank"))
    }),

    // audio near-dup fingerprinting, completing the multimodal dedup pair
    // with q239: planted gain-shifted WAV variants are REALLY decoded,
    // then fingerprinted by the sign pattern of Walsh-Hadamard
    // coefficients 1..32 over the first 64 samples — the ±1 integer-exact
    // stand-in for a spectral fingerprint, DC term excluded so a uniform
    // gain shift (which moves only W_0) leaves the code (near-)unchanged.
    // Within-group hamming census; every coefficient re-derived codec-
    // free by the oracle
    "q242_audio_fingerprint" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val h = Multimodal.audioWhtFingerprint(
          Multimodal.synthVariantAudioCorpus(
            documents(s, d).where(col("doc_id") < 200))).toDF()
        .withColumn("base", expr("mediaId div 4"))
      val a = h.select(col("base").as("base_a"), col("mediaId").as("id_a"),
        col("fp").as("fp_a"))
      val b = h.select(col("base").as("base_b"), col("mediaId").as("id_b"),
        col("fp").as("fp_b"))
      // ALL-pairs hamming census over a deliberately bounded 200-track
      // subset — the declared exact audit beside the scale path (dedup by
      // fingerprint equality is ONE groupBy, as q245 runs it): n_within
      // proves every planted gain-variant pair sits at hamming 0 (exact
      // invariance — the corpus leaves clamping headroom), while cross-
      // base pairs spread far away
      a.crossJoin(b).where(col("id_a") < col("id_b"))
        .withColumn("hamming",
          bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
        .groupBy("hamming")
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("base_a") === col("base_b")).cast("long")).as("n_within"))
    }),

    // curriculum reshard: the q230 content-keyed layout with a DIFFICULTY
    // dimension — documents are staged easy→hard by token-count band,
    // sharded within each stage, and deterministically ordered within
    // each (stage, shard); a trainer consumes stage 0's shards first.
    // Parallelism is stages×shards (scales with the corpus via nShards),
    // never a global sort; the census order-checksum pins every in-shard
    // position exactly as q230 does
    "q243_curriculum_order" -> ((s, d) => {
      val staged = documents(s, d)
        .withColumn("fp", TextOps.fingerprint(col("text")))
        .withColumn("stage",
          least(expr("size(split(text, ' ')) div 25"), lit(3L)))
        .withColumn("shard", pmod(col("fp"), lit(8L)))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("stage", "shard").orderBy(col("fp"), col("doc_id"))
      staged.withColumn("pos", row_number().over(w).cast("long"))
        .groupBy("stage", "shard")
        .agg(count(lit(1)).as("n_docs"),
          sum((col("pos") * pmod(col("fp"), lit(1000L)))
            .cast("decimal(38,0)")).cast("long").as("ord_check"))
    }),

    // largest-remainder (Hare) apportionment of a fixed sample budget
    // across strata — the integer-exact answer to "allocate 100 eval
    // slots proportionally over languages": floor quotas, then the
    // leftover slots go to the largest fractional remainders with a
    // deterministic tie-break. Survey-sampling's standard method, one
    // 5-row aggregate; proportionality and the Σ=budget invariant are
    // pinned by the oracle
    "q244_quota_apportionment" -> ((s, d) => {
      val b = 100L
      val per = documents(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
      val tot = per.agg(sum("n_docs").as("n_total"))
      val q = per.crossJoin(broadcast(tot))
        .withColumn("quota", expr(s"($b * n_docs) div n_total"))
        .withColumn("rem", expr(s"($b * n_docs) % n_total"))
      val short = q.agg((lit(b) - sum("quota")).as("n_extra"))
      q.crossJoin(broadcast(short))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("rem").desc, col("lang"))).cast("long"))
        .withColumn("extra", (col("rk") <= col("n_extra")).cast("long"))
        .select(col("lang"), col("n_docs"), col("quota"), col("extra"),
          (col("quota") + col("extra")).as("alloc"))
    }),

    // winnowing fingerprint selection (Schleimer et al. 2003 — the MOSS
    // algorithm): from each document's positional shingle hashes, keep
    // the minimum of every w=4-length window, rightmost-min tie-break —
    // guaranteeing any shared run of ≥ w+2 tokens yields a shared
    // SELECTED fingerprint while storing only ~2/(w+1) of all hashes.
    // The (h, pos-desc) window min rides ONE encoded integer key
    // (h·2^32 + 2^32−1−pos — full-width position field, exact for any
    // document length), making the selection a plain frame-bounded min
    // both engines evaluate identically. Per-doc
    // density census + a selected-hash checksum pin every selection
    "q246_winnowing" -> ((s, d) =>
      TextOps.winnowedFingerprints(documents(s, d), "doc_id", "text", w = 4)
        .groupBy("doc_id", "n_shingles")
        .agg(count(lit(1)).as("n_selected"),
          sum(expr("(sh * 31 + spos) % 2147483647")).as("sel_checksum"))),

    // canonicalization-gain dedup: exact dedup finds nothing when the
    // same content differs by case/punctuation (the copy-paste-with-
    // house-style duplicate class), so the curation pipeline dedups on a
    // CANONICAL form — lowercase, punctuation stripped, whitespace
    // collapsed (POSIX-safe regexes, identical in Java regex and RE2).
    // Planted variants: odd doc ids < 100 become an uppercased,
    // punctuation-injected copy of their even neighbor. The census
    // measures the gain: canonical groups vs raw groups per language
    "q251_canonical_dedup_gain" -> ((s, d) => {
      val docs = documents(s, d)
      val donor = docs.where(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 1).as("doc_id"),
          concat(upper(col("text")), lit(" !!!")).as("vtext"))
      val mixed = docs.join(donor, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          when(col("doc_id") < 100 && col("vtext").isNotNull, col("vtext"))
            .otherwise(col("text")).as("text"))
      val canon = mixed.withColumn("ctext",
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          "  +", " ")))
      // GLOBAL census: a variant and its donor usually sit in different
      // language strata, so a per-lang distinct count would hide most of
      // the planted collapses (measured: 12 of ~50)
      canon.agg(count(lit(1)).as("n_docs"),
          count_distinct(col("text")).as("raw_groups"),
          count_distinct(col("ctext")).as("canon_groups"))
        .withColumn("gained", col("raw_groups") - col("canon_groups"))
    }),

    // vocabulary-size sweep: the OOV cost curve a tokenizer designer
    // reads before fixing a vocab budget — 3-gram occurrences covered by
    // the top-{500, 1000, 2000, 4000} frequency vocabulary, as
    // exact ppm, in ONE pass: the ranked vocabulary is a bounded
    // TakeOrdered (4000 rows, broadcast back), and the four thresholds
    // are conditional sums over one token scan
    "q252_vocab_size_sweep" -> ((s, d) => {
      // unit = 3-token grams (the corpus has only 31 distinct word
      // tokens — a WORD vocabulary saturates at any size; the 16k
      // distinct 3-grams give the sweep a real coverage curve)
      val tok = documents(s, d)
        .select(explode(TextOps.shinglesAll(col("text"), 3)).as("tok"))
      val vocab = tok.groupBy("tok").agg(count(lit(1)).as("occ"))
      val ranked = vocab
        .orderBy(col("occ").desc, col("tok")).limit(4000)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("occ").desc, col("tok"))).cast("long"))
        .select(col("tok"), col("rk"))
      val scored = tok.join(broadcast(ranked), Seq("tok"), "left")
        .withColumn("rk", coalesce(col("rk"), lit(Long.MaxValue)))
      val sizes = Seq(500L, 1000L, 2000L, 4000L)
      val census = scored.agg(count(lit(1)).as("n_occ"),
        sizes.map(sz =>
          sum((col("rk") > sz).cast("long")).as(s"oov_$sz")): _*)
      census.select(explode(array(sizes.map(sz =>
          struct(lit(sz).as("vocab_size"), col("n_occ"),
            col(s"oov_$sz").as("n_oov"))): _*)).as("r"))
        .select(col("r.vocab_size"), col("r.n_occ"), col("r.n_oov"),
          expr("(r.n_oov * 1000000) div r.n_occ").as("oov_ppm"))
    }),

    // MOSS similarity detection — q246's selections put to work: two
    // documents are compared ONLY through their winnowed fingerprints
    // (the guarantee: any shared ≥6-token run surfaces a shared selected
    // hash), candidates meet in one equi-join on the selected hash value
    // — never all-pairs, and the join input is already winnowed to
    // ~2/(w+1) density. Per-pair match score = shared selections relative
    // to the smaller side's selection count (exact permille). Planted
    // overlaps: doc pairs (2i, 2i+1) with doc_id < 80 share a 12-token
    // prefix splice, so detection has known ground truth in the census
    "q248_moss_similarity" -> ((s, d) => {
      // splice a shared prefix into paired docs: both members of a pair
      // carry the SAME first-12-token run taken from the even member
      val docs = documents(s, d).where(col("doc_id") < 80)
      val donor = docs.where(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 1).as("doc_id"),
          expr("concat_ws(' ', slice(split(text, ' '), 1, 12))").as("pfx"))
      val spliced = docs.join(donor, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("pfx").isNotNull, concat_ws(" ", col("pfx"), col("text")))
            .otherwise(col("text")).as("text"))
      // compare on the DISTINCT-hash grain throughout (a hash selected at
      // several positions of one doc is still one fingerprint)
      val sel = TextOps.winnowedFingerprints(spliced, "doc_id", "text", w = 4)
        .select("doc_id", "sh").distinct()
        .localCheckpoint() // feeds counts AND the pair join — one pass
      val cnt = sel.groupBy("doc_id").agg(count(lit(1)).as("n_sel"))
      val a = sel.select(col("doc_id").as("id_a"), col("sh"))
      val b = sel.select(col("doc_id").as("id_b"), col("sh"))
      val shared = a.join(b, Seq("sh"))
        .where(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      shared
        .join(cnt.select(col("doc_id").as("id_a"), col("n_sel").as("na")),
          Seq("id_a"))
        .join(cnt.select(col("doc_id").as("id_b"), col("n_sel").as("nb")),
          Seq("id_b"))
        .withColumn("score_pm",
          expr("(n_shared * 1000) div least(na, nb)"))
        .where(col("n_shared") >= 2)
        .withColumn("planted",
          (col("id_b") - col("id_a") === 1 && col("id_a") % 2 === 0)
            .cast("long"))
        .groupBy("planted")
        .agg(count(lit(1)).as("n_pairs"), sum("n_shared").as("sum_shared"),
          max("score_pm").as("max_score_pm"), min("score_pm").as("min_score_pm"))
    }),

    // trending top-k churn ("what's new on the leaderboard"): monthly
    // top-5 brands by exact-cents revenue, joined month-over-month to
    // score entry churn — new entrants and absolute rank movement among
    // stayers. The per-month rank partitions by month (bounded window),
    // the churn join is an equi-join on (month+1, clerk) over the tiny
    // top-k table — leaderboard-sized, never fact-sized
    "q249_trending_topk" -> ((s, d) => {
      val rev = lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .select(expr("(year(o_orderdate) - 1992) * 12" +
            " + month(o_orderdate) - 1").cast("long").as("midx"),
          col("p_brand"),
          cents(col("l_extendedprice")).cast("long").as("c"))
        .groupBy("midx", "p_brand").agg(sum("c").as("rev_cents"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("midx")
        .orderBy(col("rev_cents").desc, col("p_brand"))
      val top = rev.withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 5)
        .localCheckpoint() // two branches below — rank once
      val prev = top.select((col("midx") + 1).as("midx"),
        col("p_brand"), col("rk").as("prev_rk"))
      top.join(prev, Seq("midx", "p_brand"), "left")
        .groupBy("midx")
        .agg(count(lit(1)).as("n_top"),
          sum(col("prev_rk").isNull.cast("long")).as("n_new"),
          sum(coalesce(abs(col("rk") - col("prev_rk")), lit(0L)))
            .as("sum_abs_delta"),
          sum("rev_cents").as("top_rev_cents"))
    }),

    // DYNAMIC-gap session windows: the built-in session_window operator
    // with a per-event gap EXPRESSION (clicks close after 10 min, other
    // events keep the session alive 30 min) — the Spark surface q104's
    // fixed gap cannot express. Merge semantics are strict-overlap over
    // per-event intervals [t, t+gap(t)), which with heterogeneous gaps
    // needs a RUNNING-MAX end (a short click window can sit wholly
    // inside an earlier view's long window) — exactly how the oracle
    // replays it relationally
    "q247_dynamic_session_gap" -> ((s, d) => {
      val e = events(s, d)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("event_time", timestamp_micros(col("ts_us")))
      e.groupBy(col("user_id"),
          session_window(col("event_time"),
            when(col("event_type") === "click", "10 minutes")
              .otherwise("30 minutes")).as("sw"))
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * lit(1e6))).as("sum_value_micro"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"),
          col("n_events"), col("sum_value_micro"))
    }),

    // cross-modal dedup capstone (the q100 composition pattern for media):
    // the same documents carry an image, an audio track, and text; each
    // modality's fingerprint — q239's aHash, q242's WHT code, q12's text
    // hash — elects a min-id survivor per EXACT fingerprint group, and
    // the census over (dropped_by_image, dropped_by_audio, dropped_by_
    // text) cells measures cross-modal agreement, including the cells
    // where clamping split one modality's group but not another's. The
    // oracle is composed from the SAME shared CTE fragments q239/q242
    // use, so the capstone cannot drift from its parts
    "q245_crossmodal_dedup" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val docs = documents(s, d)
      val img = Multimodal.imageAHash(
          Multimodal.synthVariantImageCorpus(docs)).toDF()
        .withColumn("surv", min("mediaId").over(
          org.apache.spark.sql.expressions.Window.partitionBy("lo", "hi")))
        .select(col("mediaId").as("doc_id"),
          (col("mediaId") =!= col("surv")).cast("long").as("d_img"))
      val aud = Multimodal.audioWhtFingerprint(
          Multimodal.synthVariantAudioCorpus(docs)).toDF()
        .withColumn("surv", min("mediaId").over(
          org.apache.spark.sql.expressions.Window.partitionBy("fp")))
        .select(col("mediaId").as("doc_id"),
          (col("mediaId") =!= col("surv")).cast("long").as("d_aud"))
      val txt = TextOps.fingerprints(docs)
        .withColumn("surv", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("fingerprint")))
        .select(col("doc_id"),
          (col("doc_id") =!= col("surv")).cast("long").as("d_txt"))
      img.join(aud, Seq("doc_id")).join(txt, Seq("doc_id"))
        .groupBy("d_img", "d_aud", "d_txt")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // the FULL IVF-PQ pipeline with residual quantization — coarse
    // routing (q49's half), PQ codebooks trained on and encoding the
    // residual x − c(cell) (q234's half, on residuals), nProbe=4 probed
    // cells, per-(cell, subspace) ADC tables over the query's own
    // residual. The billion-vector index architecture end to end, with
    // every distance an order-free integer micro and the probed-cell
    // restriction carried BY the (cell, sub, code) equi-join itself
    "q250_ivfpq_residual" -> ((s, d) => {
      val emb = embeddings(s, d)
      Similarity.ivfPqAdcTopK(emb, emb.where(col("vec_id") < 10), "vec_id",
        "embedding", k = 5)
    }),

    // greedy k-center coreset (farthest-point diversity selection, the
    // data-selection staple for picking a maximally-spread training
    // subset): k−1 rounds of broadcast-chosen-set min-distance + a 1-row
    // argmax, distances in the order-free integer-micro contract. The
    // emitted per-round selection distances are the coreset's covering-
    // radius profile; the oracle unrolls the identical rounds
    "q241_kcenter_coreset" -> ((s, d) =>
      graft.sim.Clustering.kCenterGreedy(embeddings(s, d), "vec_id",
        "embedding", k = 8)),

    // sketch-in-stream: the q72 HLL register contract maintained BY a
    // streaming aggregation across ≥2 micro-batches (median-split source)
    // — running distinct-user counts per event type with groups·64 state
    // rows however long the stream runs; register state merges across
    // batches by the sketch's own max. Complete mode ⇒ final registers
    // equal the batch build, so the relational oracle (registers →
    // fixed-point estimate, exact count alongside) covers the streaming
    // run bit for bit
    "q240_stream_hll" -> ((s, d) => {
      val reg = graft.streaming.StreamAgg.eventsHllRegisters(s, d,
        s"$genDir/events_split_hll", s"graft_stream_hll_${System.nanoTime()}")
      val est = graft.ops.Sketch.hllEstimate(reg, Seq("event_type"))
      val exact = events(s, d).groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("n_exact"))
      est.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_buckets_hit"), col("z_scaled"),
          col("est_milli"), col("n_exact"))
    }),

    // perceptual image dedup: REAL codec path end to end — planted
    // brightness-variant PNGs (4 exposures per base image) are ImageIO-
    // decoded, thumbnailed 8×8 by the real nearest-neighbor resize, and
    // average-hashed (bit j ⟺ 64·p_j > Σp, the division-free aHash rule,
    // packed as two 32-bit halves so XOR/popcount hamming never touches
    // the sign bit). The within-group hamming census proves the exposure
    // variants collapse to (near-)identical codes — the image analogue of
    // the q15-q17 text near-dup family. The oracle re-derives every pixel
    // of every thumbnail codec-free from the raster formula
    "q239_image_phash_dedup" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val h = Multimodal.imageAHash(
          Multimodal.synthVariantImageCorpus(documents(s, d))).toDF()
        .withColumn("base", expr("mediaId div 4"))
      val a = h.select(col("base"), col("mediaId").as("id_a"),
        col("lo").as("lo_a"), col("hi").as("hi_a"))
      val b = h.select(col("base"), col("mediaId").as("id_b"),
        col("lo").as("lo_b"), col("hi").as("hi_b"))
      a.join(b, Seq("base")).where(col("id_a") < col("id_b"))
        .withColumn("hamming",
          (bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
            bit_count(col("hi_a").bitwiseXOR(col("hi_b")))).cast("long"))
        .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
    }),

    // Hilbert-curve clustering keys vs Z-order, judged by the statistics a
    // file-skipping reader actually uses: bucket rows by each curve's
    // index (100 cells per bucket — deliberately NOT a power of 4: at
    // power-of-4 bucket sizes both curves tile into identical aligned
    // quadrants and the comparison is vacuous) and compare the per-bucket
    // bounding-box areas — Hilbert's no-jump property yields ~2.5x tighter
    // envelopes than Morton's quadrant seams, i.e. better pruning for 2-D
    // range predicates. The index is a native O(order) codegen'd
    // expression (the rotation recurrence would blow up 3^order as a flat
    // expression); the oracle unrolls the identical recurrence one CTE per
    // level, so every per-cell index value is pinned through the census
    "q238_hilbert_layout" -> ((s, d) => {
      val pts = customer(s, d).select(col("c_custkey").as("id"),
          expr("(c_custkey * 48271) % 100000").as("x"),
          expr("(c_custkey * 69621) % 100000").as("y"))
        .withColumn("gx", expr("(x * 256) div 100000"))
        .withColumn("gy", expr("(y * 256) div 100000"))
      val keyed = pts
        .withColumn("hd", graft.ops.Hilbert.hValue(col("gx"), col("gy"), 8))
        .withColumn("zd", graft.ops.ZOrder.zValue(col("gx"), col("gy"), 8))
      def census(bucket: Column, layout: String) =
        keyed.groupBy(bucket.as("bucket"))
          .agg(count(lit(1)).as("n"), min("gx").as("x0"), max("gx").as("x1"),
            min("gy").as("y0"), max("gy").as("y1"))
          .agg(count(lit(1)).as("n_buckets"), sum("n").as("n_points"),
            sum(expr("(x1 - x0 + 1) * (y1 - y0 + 1)")).as("sum_bbox_area"),
            max(expr("(x1 - x0 + 1) * (y1 - y0 + 1)")).as("max_bbox_area"))
          .select(lit(layout).as("layout"), col("n_buckets"),
            col("n_points"), col("sum_bbox_area"), col("max_bbox_area"))
      census(expr("hd div 100"), "hilbert")
        .unionAll(census(expr("zd div 100"), "zorder"))
    }),

    // product-quantization ANN with asymmetric-distance scoring (the PQ
    // half of the billion-scale IVF-PQ pairing; q49 is the IVF half):
    // codes + broadcast ADC tables + a k-bounded top-k aggregate — no Q×N
    // stage anywhere. Distances are half-up micro-rounded per subspace, so
    // the ADC sum is an order-free integer and bitwise across engines
    "q234_pq_adc_topk" -> ((s, d) => {
      val emb = embeddings(s, d)
      Similarity.pqAdcTopK(emb, emb.where(col("vec_id") < 10), "vec_id",
        "embedding", k = 5)
    }),

    // Unicode-normalized dedup keys: the precomposed (U+00E9) and
    // combining-mark (e + U+0301) encodings of the same visible text are
    // synthesized deterministically by doc parity, then collapsed by a
    // native codegen'd java.text.Normalizer expression (Spark ships no
    // normalize builtin) — NFC for canonical counts, NFD + \p{Mn} strip
    // for the accent-free key. DuckDB's utf8proc (nfc_normalize /
    // strip_accents) must land on byte-identical keys — a cross-library
    // Unicode-conformance check, not just a self-test
    "q185_unicode_dedup_keys" -> ((s, d) => {
      import graft.text.{Fingerprint, NormalizeUnicode}
      val dec = documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 120).as("b"))
        .withColumn("decorated",
          when(col("doc_id") % 2 === 0,
              regexp_replace(col("b"), "e", "\u00e9"))   // precomposed
            .otherwise(
              regexp_replace(col("b"), "e", "e\u0301"))) // combining mark
      dec.select(col("doc_id"),
          length(col("decorated")).cast("long").as("n_cp_raw"),
          length(NormalizeUnicode(col("decorated"), "NFC")).cast("long")
            .as("n_cp_nfc"),
          regexp_replace(NormalizeUnicode(col("decorated"), "NFD"),
            "\\p{Mn}", "").as("stripped"))
        .select(col("doc_id"), col("n_cp_raw"), col("n_cp_nfc"),
          length(col("stripped")).cast("long").as("n_cp_stripped"),
          Fingerprint(col("stripped")).as("key_fp"),
          count(lit(1)).over(Window.partitionBy(col("stripped")))
            .as("n_sharing_key"))
    }),

    // l-diversity, the q161 companion: k-anonymity bounds group SIZE but a
    // uniform group still leaks its sensitive value — here each
    // (nationkey, balance-band) QI group is scored by how many DISTINCT
    // market segments it contains, swept over l ∈ {2,3,5} on the l-histogram
    // grain (never the raw rows, same scale shape as q161)
    "q186_l_diversity" -> ((s, d) => {
      import s.implicits._
      val qi = customer(s, d).select(col("c_nationkey"),
        expr("cast(floor(c_acctbal / 1000.0) as long)").as("bal_band"),
        col("c_mktsegment"))
      val groups = qi.groupBy("c_nationkey", "bal_band")
        .agg(count(lit(1)).as("gsz"),
          count_distinct(col("c_mktsegment")).as("l"))
      val hist = groups.groupBy("l")
        .agg(count(lit(1)).as("n_groups"), sum("gsz").as("n_rows_l"))
      val tot = hist.agg(sum("n_rows_l").as("n_rows"),
        sum("n_groups").as("n_groups_tot"))
      Seq(2L, 3L, 5L).toDF("l_req")
        .crossJoin(broadcast(hist)).crossJoin(broadcast(tot))
        .groupBy("l_req", "n_groups_tot", "n_rows")
        .agg(sum(when(col("l") < col("l_req"), col("n_groups"))
            .otherwise(0L)).as("weak_groups"),
          sum(when(col("l") < col("l_req"), col("n_rows_l"))
            .otherwise(0L)).as("weak_rows"))
        .select(col("l_req"), col("n_groups_tot"), col("n_rows"),
          col("weak_groups"), col("weak_rows"),
          expr("(weak_rows * 1000000) div n_rows").as("risk_ppm"))
    }),

    // HLL registers are MERGEABLE — the property that makes sketches worth
    // shipping at 100 TB: per-source registers roll up to the global
    // estimate by a per-bucket max (associative, partial-aggregatable),
    // with no second pass over the data. Output pins the merged estimate
    // against the exact global distinct AND the per-source exact sum,
    // whose gap is the cross-source overlap a naive rollup double-counts
    "q187_hll_rollup" -> ((s, d) => {
      import graft.ops.Sketch
      val toks = documents(s, d).select(col("source"),
          explode(TextOps.tokensCol(col("text"))).as("tok"))
        .select(col("source"), TextOps.fingerprint(col("tok")).as("h"))
      val merged = Sketch.hllEstimate(
        Sketch.hllRegisters(toks, Seq("source"), "h")
          .groupBy("bucket").agg(max("max_rho").as("max_rho")),
        Seq.empty)
      val glob = toks.agg(
        count_distinct(col("h")).as("n_exact_global"),
        count_distinct(col("source")).as("n_sources"))
      val perSrc = toks.groupBy("source")
        .agg(count_distinct(col("h")).as("ne"))
        .agg(sum("ne").as("sum_source_exact"))
      merged.crossJoin(broadcast(glob)).crossJoin(broadcast(perSrc))
        .select(col("n_sources"), col("n_buckets_hit"), col("z_scaled"),
          col("est_milli"), col("n_exact_global"), col("sum_source_exact"))
    }),

    // unigram surprisal scoring with a pure-integer log: surprisal of a
    // token ≈ log2(N/cnt), taken at bit-length granularity (length of the
    // binary representation — exact, engine-independent, no floating log).
    // The quality-filter signal: word-salad docs score high, boilerplate
    // low. One token-count aggregate (vocab-sized) broadcast back over one
    // exploded scan
    "q188_token_surprisal" -> ((s, d) => {
      val toks = documents(s, d).select(col("doc_id"),
        explode(TextOps.tokensCol(col("text"))).as("tok"))
      val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(sum("cnt").as("n_total"))
      toks.join(broadcast(counts), "tok").crossJoin(broadcast(tot))
        .select(col("doc_id"),
          (length(bin(col("n_total"))) - length(bin(col("cnt"))))
            .cast("long").as("sbits"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum("sbits").as("surprisal_bits"))
        .select(col("doc_id"), col("n_tokens"), col("surprisal_bits"),
          expr("(surprisal_bits * 1000) div n_tokens")
            .as("mean_surprisal_milli"))
    }),

    // BM25 sparse retrieval (k1=1.2, b=0.75), the lexical baseline of every
    // retrieval/RAG stack, in a pure-integer contract (bit-length idf — the
    // q188 device — and milli-scaled length norm, so the score is exact on
    // both engines). Every 50th doc probes the corpus through ONE token
    // equi-join (the inverted index); ranking is the k-bounded mergeable
    // aggregate, no per-query window sort
    "q189_bm25_topk" -> ((s, d) =>
      graft.text.Index.bm25TopK(documents(s, d), "doc_id", "text",
        probeFilter = col("doc_id") % 50 === 0, k = 5)),

    // q189 under the stopword-cap POLICY: tokens with df > 76% of the
    // corpus are pruned from the posting table before the query join.
    // Their integer idf is 1 bit (bitlen(n div df) for df > n/2), so this
    // trades a near-zero score term for dropping the corpus-sized posting
    // lists from the join entirely — the volume knob for hostile
    // vocabularies, layered on the always-on salting that is the skew
    // guarantee. 760‰ (not 500‰) because the shipped synthetic vocabulary
    // is head-heavy (31 tokens, median df 78%): a N/2 cap would empty the
    // ranking, which tests nothing
    "q227_bm25_stopword_cap" -> ((s, d) =>
      graft.text.Index.bm25TopK(documents(s, d), "doc_id", "text",
        probeFilter = col("doc_id") % 50 === 0, k = 5,
        maxDfPermille = 760)),

    // pushdown-safe ts-range scan: the [2024-01-10, 2024-01-20) window
    // filtered on the RAW ts column via Events.tsRangeNs (inverse-mapped
    // bounds), NOT on the normalized long-ns ts — the predicate lands in
    // the parquet scan's PushedFilters and prunes row groups by min/max
    // stats (PlanSpec-asserted). At 100 TB a month-partitioned events
    // table, this is the difference between scanning 10 days and 100%
    "q228_events_ts_pushdown" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      graft.sources.Events.tsRangeNs(s.read.parquet(t(d, "events")),
          loNs = 1704844800000000000L, hiNs = 1705708800000000000L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          // sum OFFSETS from the window start, not raw epoch_us: a raw
          // sum overflows LONG past ~5k rows in this window (it did, at
          // sf0.1); offsets are ≤ 8.64e11 µs each, safe to ~1e7 rows —
          // beyond that, the ExactStats DECIMAL(38,0) pattern applies
          sum(expr("(ts div 1000) - 1704844800000000")).as("sum_off_us"),
          min(expr("ts div 1000")).as("min_ts_us"),
          max(expr("ts div 1000")).as("max_ts_us"),
          sum(floor(col("value") * lit(1e6)).cast("long")).as("sum_v_micro"))
    }),

    // hybrid retrieval, the RAG-stack capstone: the SAME probe set ranked
    // by dense cosine ANN (q14's ranker) AND lexical BM25 (q189), fused
    // with reciprocal-rank fusion (q155's integer contract). Three
    // already-oracled fragments composed exactly as a retrieval service
    // chains them; the full-outer join keeps hits that only one modality
    // surfaces — the reason hybrid beats either alone
    "q190_hybrid_retrieval" -> ((s, d) => {
      val dense = Similarity.cosineTopK(embeddings(s, d),
          embeddings(s, d).where(col("vec_id") % 50 === 0),
          "vec_id", "embedding", 20)
        .select(col("query_id"), col("cand_id"), col("rank").as("rank_dense"))
      val lex = graft.text.Index.bm25TopK(documents(s, d), "doc_id", "text",
          probeFilter = col("doc_id") % 50 === 0, k = 20)
        .select(col("query_id"), col("cand_id"), col("rank").as("rank_lex"))
      val fused = dense.join(lex, Seq("query_id", "cand_id"), "full_outer")
        .withColumn("rrf_micro",
          expr("coalesce(1000000 div (60 + rank_dense), 0) + " +
            "coalesce(1000000 div (60 + rank_lex), 0)"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("rrf_micro").desc, col("cand_id"))
      fused.withColumn("fused_rank", row_number().over(w))
        .where(col("fused_rank") <= 5)
        .select(col("query_id"), col("cand_id"), col("rank_dense"),
          col("rank_lex"), col("rrf_micro"), col("fused_rank"))
    }),

    // Spark 4's transformWithState operator API (successor to
    // flatMapGroupsWithState): per-event-type running (count, sum, max) in
    // an explicit RocksDB-backed ValueState, over the same 2-batch parity
    // split as q163 — the processor emits each touched key's cumulative
    // stats per micro-batch, so the update-mode sink is the emission log
    // and the oracle replays it from the batch-membership predicate
    "q183_transform_with_state" -> ((s, d) =>
      graft.streaming.StatefulOps.eventsRunningStatsTws(s, d,
        splitDir = s"$genDir/events_parity_split",
        queryName = s"graft_stream_tws_${System.nanoTime()}")),

    // iterative BFS (the recursive-CTE workload Spark expresses as a
    // driver loop): shortest hop count over the SPARSE shipment graph
    // (each nation keeps its top-2 outgoing edges by weight, dst
    // tie-break), starting from the nation with the highest total
    // outgoing weight — a data-derived root that exists at every scale
    // (small SFs leave most nations supplier-less). The loop runs on the
    // nation-grain aggregate — ≤|nations| rows per level however big the
    // fact tables are — with per-level localCheckpoint to cut lineage;
    // the oracle is a real WITH RECURSIVE whose min(hop) provably equals
    // BFS first-visit depth
    "q164_bfs_hops" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val cust = customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val supp = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      val edges = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("s_nationkey").as("src_key"),
          col("c_nationkey").as("dst_key"))
        .agg(count(lit(1)).as("w"))
      val top2 = edges.withColumn("rn", row_number().over(
          Window.partitionBy("src_key")
            .orderBy(col("w").desc, col("dst_key"))))
        .where(col("rn") <= 2).select("src_key", "dst_key")
        .localCheckpoint()
      var dist = edges.groupBy("src_key").agg(sum("w").as("tw"))
        .orderBy(col("tw").desc, col("src_key")).limit(1)
        .select(col("src_key").as("node"), lit(0L).as("hop"))
        .localCheckpoint()
      var frontier = dist
      for (h <- 1 to 6) {
        val nxt = frontier
          .join(broadcast(top2), frontier("node") === top2("src_key"))
          .select(col("dst_key").as("node")).distinct()
          .join(dist, Seq("node"), "left_anti")
          .withColumn("hop", lit(h.toLong))
          .localCheckpoint()
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt
      }
      dist.join(broadcast(nation(s, d)
          .select(col("n_nationkey").as("node"), col("n_name"))), Seq("node"))
        .select(col("node"), col("n_name"), col("hop"))
    }),

    // stream-stream LEFT OUTER interval join: q74's attribution join plus
    // the rows an inner join can never show — clicks that led to nothing.
    // Null-match emission happens at watermark eviction, so the final
    // table = inner matches ∪ never-matched clicks whose click_ts+window
    // lies below the end-of-stream watermark (see
    // StreamJoin.clickPurchaseAttributionOuter for the measured rule)
    "q165_stream_outer_join" -> ((s, d) =>
      graft.streaming.StreamJoin.clickPurchaseAttributionOuter(s, d,
        splitDir = s"$genDir/events_split", windowSec = 600L,
        queryName = s"graft_stream_oj_${System.nanoTime()}"))
,
    // snapshot diff / reconciliation (the "what changed between loads"
    // audit): the restated snapshot is derived deterministically from
    // orders (keys ≡0 mod 97 dropped, ≡3 mod 7 repriced +$5, ≡5 mod 101
    // re-added under offset keys), then FULL OUTER on the key classifies
    // every row added/removed/changed/same in one shuffle join — the
    // scale shape of a data-diff tool; census carries exact cent totals
    // from both sides
    "q166_snapshot_diff" -> ((s, d) => {
      val o = orders(s, d).select(col("o_orderkey"),
        cents(col("o_totalprice")).cast("long").as("v"),
        col("o_orderpriority").as("p"))
      val newSnap = o.where(expr("o_orderkey % 97 != 0"))
        .select(col("o_orderkey"),
          when(expr("o_orderkey % 7 = 3"), col("v") + 500)
            .otherwise(col("v")).as("v"), col("p"))
        .unionByName(o.where(expr("o_orderkey % 101 = 5"))
          .select((col("o_orderkey") + lit(1000000000000000L))
            .as("o_orderkey"), col("v"), col("p")))
      val diff = o.select(col("o_orderkey"), col("v").as("v_old"),
          col("p").as("p_old"))
        .join(newSnap.select(col("o_orderkey"), col("v").as("v_new"),
          col("p").as("p_new")), Seq("o_orderkey"), "full_outer")
      diff.select(
          when(col("v_old").isNull, "added")
            .when(col("v_new").isNull, "removed")
            .when(col("v_old") =!= col("v_new") ||
              col("p_old") =!= col("p_new"), "changed")
            .otherwise("same").as("status"),
          coalesce(col("v_old"), lit(0L)).as("vo"),
          coalesce(col("v_new"), lit(0L)).as("vn"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("vo").cast("decimal(38,0)")).cast("long")
            .as("cents_old"),
          sum(col("vn").cast("decimal(38,0)")).cast("long")
            .as("cents_new"))
    }),

    // the TPC-H Q21 shape (public spec) adapted to this schema: on
    // multi-supplier orders, find the supplier who ALONE shipped late
    // (>90 days after the order date). The correlated EXISTS / NOT EXISTS
    // pair is reformulated as ONE per-order aggregate — distinct
    // suppliers and distinct LATE suppliers — then the blame predicate
    // (nsupp > 1, nlate = 1) rides the late rows; top-20 suppliers by
    // (waits DESC, suppkey). One pass over lineitem, no correlated rescans
    "q167_blame_supplier" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
        expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
          .as("ship_d"))
      val ord = orders(s, d).select(col("o_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("ord_d"))
      val l = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late", (col("ship_d") > col("ord_d") + 90).cast("int"))
      val perOrder = l.groupBy("l_orderkey")
        .agg(countDistinct(col("l_suppkey")).as("nsupp"),
          countDistinct(when(col("late") === 1, col("l_suppkey")))
            .as("nlate"))
      val blame = l.where(col("late") === 1)
        .join(perOrder.where(col("nsupp") > 1 && col("nlate") === 1),
          Seq("l_orderkey"))
        .select("l_orderkey", "l_suppkey").distinct()
      val supp = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      val nat = nation(s, d).select(col("n_nationkey"), col("n_name"))
      val waits = blame.groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      waits.withColumn("rnk", row_number().over(
          Window.orderBy(col("numwait").desc, col("l_suppkey"))))
        .where(col("rnk") <= 20)
        .select(col("l_suppkey").as("s_suppkey"), col("n_name"),
          col("numwait"), col("rnk").cast("long").as("rnk"))
    }),

    // streaming SCD2 (point-in-time) enrichment: q149's interval lookup
    // as a stream-static join — purchases stream against the broadcast
    // version table with the ts−1 validity predicate; stateless, append
    // mode, so the sink equals the batch join the oracle computes
    "q169_stream_scd2_enrich" -> ((s, d) =>
      graft.streaming.StreamEnrich.enrichPurchasesScd2(s, d,
        splitDir = s"$genDir/events_split",
        queryName = s"graft_stream_scd2_${System.nanoTime()}")),

    // forecast backtest: the two standard naive baselines — seasonal
    // (value 7 days ago) and last-value (yesterday) — scored against the
    // actual daily order count over the dense calendar grid (gap days
    // = 0, so lags are calendar-true). Exact integer MAE/bias per model
    // ×1000; the winner per the data decides which baseline a real
    // forecaster must beat. All lags on the day-grain aggregate
    "q171_forecast_backtest" -> ((s, d) => {
      val days = orders(s, d)
        .groupBy(expr(
          "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("dd"))
        .agg(count(lit(1)).as("cnt"))
      val grid = days.agg(min("dd").as("d0"), max("dd").as("d1"))
        .select(explode(expr("sequence(d0, d1)")).as("dd"))
      val dense = grid.join(days, Seq("dd"), "left")
        .select(col("dd"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      val w = Window.orderBy("dd")
      val scored = dense
        .withColumn("f_seasonal", lag("cnt", 7).over(w))
        .withColumn("f_last", lag("cnt", 1).over(w))
        .where(col("f_seasonal").isNotNull)
      scored.select(lit("seasonal_naive").as("model"),
          abs(col("cnt") - col("f_seasonal")).as("ae"),
          (col("cnt") - col("f_seasonal")).as("err"))
        .unionByName(scored.select(lit("last_value").as("model"),
          abs(col("cnt") - col("f_last")).as("ae"),
          (col("cnt") - col("f_last")).as("err")))
        .groupBy("model")
        .agg(count(lit(1)).as("n_days"),
          sum("ae").as("sum_ae"), sum("err").as("sum_err"))
        .select(col("model"), col("n_days"),
          expr("(sum_ae * 1000) div n_days").as("mae_milli"),
          col("sum_err"))
    }),

    // full-corpus layout manifest (S1+S2 closure): every CSV path the engine
    // writes for the complete 18-family sweep, checked verbatim against the
    // SHIPPED Datasets/ tree — the oracle lists the actual reference
    // deliverable via glob, so a single stem/casing/dual-view drift anywhere
    // in the 4,320-file grammar hash-fails. CorpusSpec proves writeFullCorpus
    // materializes exactly this manifest wholesale
    "q175_corpus_manifest" -> ((s, d) => {
      import s.implicits._
      s.createDataset(graft.generate.Sinks.corpusManifest(Grid.all()).toSeq)
        .toDF("rel_path")
    }),

    // txt-sidecar closure of the corpus manifest: the 1,404 shipped
    // structure/statistics text paths, hash-pinned against the tree itself
    // (CorpusSpec additionally proves the 1,188 structure files byte-equal)
    "q180_txt_manifest" -> ((s, d) => {
      import s.implicits._
      s.createDataset(graft.generate.Sinks.txtManifest(Grid.all()).toSeq)
        .toDF("rel_path")
    }),

    // Gini coefficient, exactly, from q145's Lorenz bins: twice the area
    // between the diagonal and the Lorenz curve via the trapezoid sum
    // Σ dx·(y_i + y_{i−1}) in ppm² — every term an exact integer on the
    // SAME div-truncated cumulative shares q145 publishes, so the two
    // queries can never disagree about the curve they summarize
    "q174_gini" -> ((s, d) => {
      val ov = orders(s, d).select(cents(col("o_totalprice")).as("v"))
      val bins = ov.groupBy(expr("v div 100000").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(38,0)")).cast("long").as("sv"))
      val wC = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wT = Window.partitionBy()
      val lor = bins
        .withColumn("cum_n", sum("n").over(wC))
        .withColumn("cum_v", sum("sv").over(wC))
        .withColumn("tot_n", sum("n").over(wT))
        .withColumn("tot_v", sum("sv").over(wT))
        .select(col("bin"),
          expr("(cum_n * 1000000) div tot_n").as("x"),
          expr("cast((cast(cum_v as decimal(38,0)) * 1000000) div tot_v " +
            "as bigint)").as("y"))
      val wL = Window.orderBy("bin")
      lor
        .withColumn("px", lag("x", 1, 0L).over(wL))
        .withColumn("py", lag("y", 1, 0L).over(wL))
        .agg(count(lit(1)).as("n_bins"),
          sum(expr("(x - px) * (y + py)")).as("trapezoid_ppm2"))
        .select(col("n_bins"), col("trapezoid_ppm2"),
          expr("(1000000000000 - trapezoid_ppm2) div 1000000")
            .as("gini_ppm"))
    }),

    // Kendall's τ rank correlation: do nations with more revenue also
    // have more active customers? Concordant/discordant/tied pair counts
    // over the |nations|² aggregate — pure sign comparisons, no products
    // (overflow-free at any magnitude), τ_a = (C−D)/n_pairs from exact
    // integers. The pairwise join is bounded by nation cardinality, never
    // fact rows
    "q173_kendall_tau" -> ((s, d) => {
      val cust = customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val m = orders(s, d).select(col("o_custkey"),
          cents(col("o_totalprice")).as("v"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"))
        .agg(sum(col("v").cast("decimal(38,0)")).cast("long").as("rev"),
          countDistinct(col("o_custkey")).as("nc"))
      val b = m.select(col("nk").as("nk2"), col("rev").as("rev2"),
        col("nc").as("nc2"))
      m.join(broadcast(b), col("nk2") > col("nk"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when((col("rev") > col("rev2") && col("nc") > col("nc2")) ||
            (col("rev") < col("rev2") && col("nc") < col("nc2")), 1L)
            .otherwise(0L)).as("n_concordant"),
          sum(when((col("rev") > col("rev2") && col("nc") < col("nc2")) ||
            (col("rev") < col("rev2") && col("nc") > col("nc2")), 1L)
            .otherwise(0L)).as("n_discordant"),
          sum(when(col("rev") === col("rev2"), 1L).otherwise(0L))
            .as("n_tie_x"),
          sum(when(col("nc") === col("nc2"), 1L).otherwise(0L))
            .as("n_tie_y"))
        .select(col("n_pairs"), col("n_concordant"), col("n_discordant"),
          col("n_tie_x"), col("n_tie_y"),
          expr("cast(floor(cast(n_concordant - n_discordant as double) " +
            "/ cast(n_pairs as double) * 1000 + 0.5) as bigint)")
            .as("tau_a_milli"))
    }),

    // integer exponential smoothing (SES, α=1/4): the order-dependent
    // recursion l_t = (v_t + 3·l_{t-1}) div 4 stays EXACT because values
    // are non-negative micro integers — no float decay drift, any engine
    // agrees bit for bit. Spark walks each user's sorted sequence with
    // one aggregate() lambda (the q170 pattern); the oracle replays the
    // identical recursion as a recursive CTE over per-user row numbers.
    // The final level IS the one-step forecast. The fold carries an
    // explicit 'init' flag (not a sign sentinel), and vm clamps at 0 in
    // BOTH engines — div (truncate) vs // (floor) agree only on
    // non-negative operands, so the clamp IS the cross-engine contract,
    // not an assumption about the data
    "q172_ses_smoothing" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        expr("ts div 1000").as("ts_us"), col("event_id"),
        expr("cast(greatest(floor(value * 1e6), 0) as long)").as("vm"))
      val seqs = ev.groupBy("user_id")
        .agg(array_sort(collect_list(struct(col("ts_us"), col("event_id"),
          col("vm")))).as("seq"))
      seqs.select(col("user_id"), size(col("seq")).as("n_events"),
        expr("""
          aggregate(seq, named_struct('init', false, 'lvl', 0L),
            (acc, x) -> named_struct('init', true,
              'lvl', case when acc.init then (x.vm + 3 * acc.lvl) div 4
                          else x.vm end)).lvl
        """).as("level_micro"))
    }),

    // nested types + higher-order functions: each user's event sequence
    // becomes a ts-sorted ARRAY OF STRUCTS (collect_list + array_sort),
    // then ONE codegen'd aggregate() lambda walks it with a struct
    // accumulator computing the longest strictly-increasing value run and
    // the max inter-event gap — no window, no re-shuffle, the sequence
    // never leaves its row. The oracle computes the same two quantities
    // relationally (lag + run-id islands), which is the semantic check
    // that the HOF walk is right. Census by run length caps the output
    "q170_sequence_hof" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        expr("ts div 1000").as("ts_us"),
        expr("cast(floor(value * 1e6) as long)").as("vm"),
        col("event_id"))
      val seqs = ev.groupBy("user_id")
        .agg(array_sort(collect_list(struct(col("ts_us"), col("event_id"),
          col("vm")))).as("seq"))
      // acc = (best_run, cur_run, max_gap, prev_ts, prev_vm); sentinel
      // prev_ts = -1 marks the first element
      val walked = seqs.select(col("user_id"), size(col("seq")).as("n_events"),
        expr("""
          aggregate(
            seq,
            named_struct('best', 1L, 'cur', 1L, 'gap', 0L,
                         'pts', -1L, 'pvm', 0L),
            (acc, x) -> named_struct(
              'best', greatest(acc.best,
                case when acc.pts >= 0 and x.vm > acc.pvm
                     then acc.cur + 1 else 1L end),
              'cur',  case when acc.pts >= 0 and x.vm > acc.pvm
                     then acc.cur + 1 else 1L end,
              'gap',  case when acc.pts >= 0
                     then greatest(acc.gap, x.ts_us - acc.pts)
                     else acc.gap end,
              'pts', x.ts_us,
              'pvm', x.vm),
            acc -> named_struct('best', acc.best, 'gap', acc.gap))
        """).as("r"))
      walked.groupBy(col("r.best").as("run_len"))
        .agg(count(lit(1)).as("n_users"),
          sum("n_events").as("sum_events"),
          max(col("r.gap")).as("max_gap_us"))
    }),

    // UNPIVOT (melt): the inverse of q39's pivot — wide lineitem measures
    // become (measure, value) long form via the stack generator, then a
    // per-(flag, measure) census. The 4x generator blowup never shuffles:
    // partial aggregation collapses each partition to |flags|·4 rows
    // before the exchange. Uniform floor(x·1e6) quantization on both
    // sides (bit-identical IEEE multiply, order-free integer sums)
    "q168_unpivot_measures" -> ((s, d) =>
      lineitem(s, d).select(col("l_returnflag"),
          expr("stack(4, " +
            "'quantity', cast(floor(l_quantity * 1e6) as long), " +
            "'extendedprice', cast(floor(l_extendedprice * 1e6) as long), " +
            "'discount', cast(floor(l_discount * 1e6) as long), " +
            "'tax', cast(floor(l_tax * 1e6) as long)) as (measure, vm)"))
        .groupBy("l_returnflag", "measure")
        .agg(count(lit(1)).as("n"),
          sum(col("vm").cast("decimal(38,0)")).cast("long")
            .as("sum_micro"))),

    // first-order Markov transition matrix over per-user event sequences:
    // consecutive (from → to) pairs via ONE lead() on the per-user window
    // (state bounded by a user's events, never the stream), then a
    // transition census with exact ppm row-normalized probabilities. The
    // clickstream "what happens next" model, entirely on the pair grain
    "q191_markov_transitions" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"), col("event_id"))
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val pairs = e.withColumn("to_type", lead(col("event_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val fromTot = pairs.groupBy("from_type").agg(sum("n").as("n_from"))
      pairs.join(broadcast(fromTot), "from_type")
        .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
          expr("(n * 1000000) div n_from").as("p_ppm"))
    }),

    // grid-bucketed spatial near-neighbor self-join: points on a derived
    // integer lattice, cell size = search radius (2000), so every pair within r
    // meets in ONE equi-join of a 9-cell neighborhood explode against the
    // home cell — O(9·N) candidates on a (cx, cy) shuffle key instead of
    // the O(N²) cross join; skew is bounded by cell occupancy. Exact
    // integer squared distances; a < b orders each unordered pair once
    "q192_spatial_grid_join" -> ((s, d) => {
      val pts = customer(s, d).select(col("c_custkey").as("id"),
          expr("(c_custkey * 48271) % 100000").as("x"),
          expr("(c_custkey * 69621) % 100000").as("y"))
        .withColumn("cx", expr("x div 2000"))
        .withColumn("cy", expr("y div 2000"))
      val offs = for { dx <- Seq(-1, 0, 1); dy <- Seq(-1, 0, 1) }
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
      val probe = pts
        .withColumn("o", explode(array(offs: _*)))
        .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
          (col("cx") + col("o.dx")).as("jcx"),
          (col("cy") + col("o.dy")).as("jcy"))
      val home = pts.select(col("id").as("b_id"), col("x").as("bx"),
        col("y").as("b_y"), col("cx").as("jcx"), col("cy").as("jcy"))
      val pairs = probe.join(home, Seq("jcx", "jcy"))
        .where(col("a_id") < col("b_id"))
        .withColumn("d2",
          expr("(ax - bx) * (ax - bx) + (ay - b_y) * (ay - b_y)"))
        .where(col("d2") <= lit(4000000L))
      val census = pairs.agg(count(lit(1)).as("n_pairs"),
        sum("d2").as("sum_d2"), min("d2").as("min_d2"),
        max("d2").as("max_d2"),
        sum(expr("(a_id * 131071 + b_id) % 2147483647")).as("pair_checksum"))
      val layout = pts.agg(count(lit(1)).as("n_points"),
        count_distinct(expr("cx * 200 + cy")).as("n_cells"))
      census.crossJoin(broadcast(layout))
        .select(col("n_points"), col("n_cells"), col("n_pairs"),
          col("sum_d2"), col("min_d2"), col("max_d2"), col("pair_checksum"))
    }),

    // sweep-line concurrency at the DAY grain: order intervals become
    // ±1 deltas aggregated to (nation, day) BEFORE any ordered scan, so
    // the running sum's window holds at most the calendar's days per
    // nation — bounded by time, not by rows, which is what lets the same
    // plan sweep a 100 TB fact table. Dates ride as epoch-day integers
    // end-to-end (no engine date-encoding drift)
    "q193_max_concurrency" -> ((s, d) => {
      val o = orders(s, d).select(col("o_custkey"),
          expr("datediff(to_date(o_orderdate), date'1970-01-01')").as("d0"),
          expr("datediff(to_date(o_orderdate), date'1970-01-01') " +
            "+ 1 + o_orderkey % 30").as("d1"))
      val cust = customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val deltas = o.join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey"), explode(array(
          struct(col("d0").as("day"), lit(1L).as("delta")),
          struct(col("d1").as("day"), lit(-1L).as("delta")))).as("e"))
        .select(col("c_nationkey"), col("e.day").as("day"),
          col("e.delta").as("delta"))
        .groupBy("c_nationkey", "day").agg(sum("delta").as("net"))
      val w = Window.partitionBy("c_nationkey").orderBy("day")
      val cum = deltas.withColumn("conc", sum("net").over(w))
      val mx = cum.groupBy("c_nationkey")
        .agg(max("conc").as("max_conc"), count(lit(1)).as("n_days"))
      cum.join(mx, "c_nationkey").where(col("conc") === col("max_conc"))
        .groupBy("c_nationkey", "max_conc", "n_days")
        .agg(min("day").as("peak_day"))
        .select(col("c_nationkey"), col("max_conc"), col("n_days"),
          col("peak_day"))
    }),

    // bloom-pruned join: the build side's custkeys become a ≤ 8192-row bit
    // set (q81's relational contract) that prunes the FACT rows through two
    // broadcast equi-joins — no per-key aggregate, no shuffle — before the
    // real membership join eliminates the residual false positives. Output
    // exposes both counts per priority, so the pruning's one-sided
    // guarantee (n_member ≤ n_bloom_pass, members never dropped) is itself
    // oracled
    "q194_bloom_semijoin" -> ((s, d) => {
      import graft.ops.Bloom
      val bld = customer(s, d)
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val pruned = Bloom.bloomPrune(orders(s, d), "o_custkey",
        Bloom.bloomBits(bld, "c_custkey"))
      val mem = bld.distinct()
        .select(col("c_custkey").as("o_custkey"), lit(1).as("m"))
      pruned.join(mem, Seq("o_custkey"), "left")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_bloom_pass"),
          sum(coalesce(col("m"), lit(0)).cast("long")).as("n_member"),
          sum(when(col("m") === 1,
              ExactStats.micro(col("o_totalprice")).cast("long"))
            .otherwise(0L)).as("member_rev_micro"))
    }),

    // entity-resolution capstone: a dirty registry (every customer plus
    // deterministic prefix-mutated duplicates and a non-duplicate decoy),
    // blocked on the mutation-stable digit payload so candidate pairs form
    // inside ≤4-record blocks (one equi-join, never N²), matched by edit
    // distance (the decoy fails the threshold — similarity doing real
    // work), clustered by distributed connected components, and reported
    // as a cluster-size census with the candidate/match funnel attached
    "q195_entity_resolution" -> ((s, d) => {
      val cand = erCandidates(s, d)
      val edges = cand.where(col("lev") <= 2)
      val comp = graft.ops.ConnectedComponents.components(edges, "id_a", "id_b")
      val labeled = erRegistry(s, d).select(col("id")).as("r")
        .join(comp.as("c"), col("r.id") === col("c.id"), "left")
        .select(coalesce(col("c.component"), col("r.id")).as("component"))
      val hist = labeled.groupBy("component")
        .agg(count(lit(1)).as("csize"))
        .groupBy("csize").agg(count(lit(1)).as("n_clusters"),
          sum("component").as("comp_checksum"))
      val glob = cand.agg(count(lit(1)).as("n_candidates"),
        sum((col("lev") <= 2).cast("long")).as("n_matches"))
      hist.crossJoin(broadcast(glob))
        .select(col("csize"), col("n_clusters"), col("comp_checksum"),
          col("n_candidates"), col("n_matches"))
    }),

    // single-source weighted shortest paths over the nation-grain shipping
    // graph (edge weight = fastest observed order→ship days), as 8 fixed
    // synchronous Bellman–Ford rounds: each round is one join of the
    // 25-row frontier against the ≤625-row edge list — the Pregel shape,
    // every round a bounded shuffle, localCheckpoint snapping the lineage.
    // The oracle replays the SAME 8 unrolled rounds, so the iteration
    // count is part of the pinned contract
    "q196_weighted_sssp" -> ((s, d) => {
      val fact = lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("s_nationkey").cast("long").as("u"),
          col("c_nationkey").cast("long").as("v"),
          greatest(expr("datediff(to_date(l_shipdate), to_date(o_orderdate))"),
            lit(0)).cast("long").as("wd"))
      val edges = fact.groupBy("u", "v").agg(min("wd").as("w")).localCheckpoint()
      var dist = nation(s, d).select(col("n_nationkey").cast("long").as("node"),
        when(col("n_nationkey") === 0, 0L).otherwise(lit(null).cast("long"))
          .as("dist"))
      for (_ <- 1 to 8) {
        val relax = dist.where(col("dist").isNotNull)
          .join(edges, col("node") === col("u"))
          .groupBy(col("v")).agg(min(col("dist") + col("w")).as("cand"))
          .withColumnRenamed("v", "node")
        dist = dist.join(relax, Seq("node"), "left")
          .select(col("node"),
            when(col("dist").isNull, col("cand"))
              .when(col("cand").isNull, col("dist"))
              .otherwise(least(col("dist"), col("cand"))).as("dist"))
          .localCheckpoint()
      }
      dist
    }),

    // the native full Damerau–Levenshtein expression (transposition = ONE
    // edit, the Lowrance–Wagner variant DuckDB also implements) scored
    // against builtin levenshtein over the ER candidate pairs: the
    // transposed-prefix duplicates land at (lev=2, dl=1) — the census IS
    // the evidence transposition-awareness changes match decisions
    "q197_damerau_vs_lev" -> ((s, d) =>
      erCandidates(s, d)
        .select(col("lev"),
          graft.text.DamerauLevenshtein(col("name_a"), col("name_b"))
            .cast("long").as("dl"))
        .groupBy("lev", "dl").agg(count(lit(1)).as("n_pairs"))),

    // weight-of-evidence feature binning (the credit-scoring/feature-
    // engineering staple): per-user click count binned, each bin's good/bad
    // odds scored as WOE at bit-length granularity (q188's integer-log
    // device, +1 Laplace smoothing so empty cells stay finite) plus an
    // exact-integer IV contribution. One user-grain aggregate, then a
    // ≤6-row bin census — nothing user-sized ever re-shuffles
    "q198_woe_binning" -> ((s, d) => {
      val per = events(s, d).groupBy("user_id")
        .agg(sum((col("event_type") === "click").cast("long")).as("clicks"),
          max((col("event_type") === "purchase").cast("long")).as("good"))
        .withColumn("b", least(expr("clicks div 4"), lit(5L)))
      val bins = per.groupBy("b").agg(count(lit(1)).as("n_users"),
        sum("good").as("n_good"), sum(lit(1L) - col("good")).as("n_bad"))
      val tot = bins.agg(sum("n_good").as("tot_good"),
        sum("n_bad").as("tot_bad"), count(lit(1)).as("n_bins"))
      val woe = (length(bin((col("n_good") + 1) * (col("tot_bad") + col("n_bins")))) -
        length(bin((col("n_bad") + 1) * (col("tot_good") + col("n_bins")))))
        .cast("long")
      bins.crossJoin(broadcast(tot))
        .select(col("b"), col("n_users"), col("n_good"), col("n_bad"),
          woe.as("woe_bits"),
          ((expr("((n_good + 1) * 1000) div (tot_good + n_bins)") -
            expr("((n_bad + 1) * 1000) div (tot_bad + n_bins)")) * woe)
            .as("iv_contrib_milli"))
    }),

    // k-core decomposition (k=3) by 5 FIXED peeling rounds over the
    // supplier/part-bucket bipartite graph: each round one degree
    // aggregate + two semi-join filters, localCheckpoint snapping lineage
    // — the iterative-graph-contraction shape at one shuffle per round.
    // The oracle unrolls the SAME 5 peels, so the round count is pinned;
    // the census is coalesce-guarded so an empty core still hash-matches
    "q199_kcore" -> ((s, d) => {
      var edges = lineitem(s, d)
        .select(col("l_suppkey").cast("long").as("u"),
          (lit(1000000L) + col("l_partkey") % 500).as("v"))
        .distinct().localCheckpoint()
      for (_ <- 1 to 5) {
        val keep = edges.select(col("u").as("n"))
          .union(edges.select(col("v").as("n")))
          .groupBy("n").agg(count(lit(1)).as("deg"))
          .where(col("deg") >= 3).select("n")
        edges = edges
          .join(keep.withColumnRenamed("n", "u"), Seq("u"))
          .join(keep.withColumnRenamed("n", "v"), Seq("v"))
          .select("u", "v").localCheckpoint()
      }
      val nodes = edges.select(col("u").as("n"))
        .union(edges.select(col("v").as("n"))).distinct()
      edges.agg(count(lit(1)).as("n_edges"),
          coalesce(sum(expr("u + v")), lit(0L)).as("edge_checksum"))
        .crossJoin(broadcast(nodes.agg(count(lit(1)).as("n_nodes"),
          coalesce(sum("n"), lit(0L)).as("node_checksum"))))
        .select(col("n_nodes"), col("n_edges"), col("node_checksum"),
          col("edge_checksum"))
    }),

    // the hashing trick: tokens mapped to a fixed 64-bucket feature space
    // through the [[graft.text.Fingerprint]] rolling hash (the codegen'd
    // expression whose contract is SQL-expressible, so the oracle hashes
    // identically) — per-bucket load and collision census, the dimension-
    // bounded featurization every large-scale text model feeds on
    "q200_feature_hashing" -> ((s, d) =>
      documents(s, d)
        .select(explode(TextOps.tokensCol(col("text"))).as("tok"))
        .withColumn("bucket", TextOps.fingerprint(col("tok")) % 64)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_occurrences"),
          count_distinct(col("tok")).as("n_distinct_tokens"))),

    // Spark 4 VARIANT round-trip: per-order nested JSON docs (header +
    // linenumber-ordered line array) built with to_json, parsed to the
    // VARIANT type, and shredded back out with typed variant_get paths —
    // the semi-structured ingestion pattern. The oracle never sees the
    // JSON: it recomputes the same census relationally, so a wrong
    // parse/shred (dropped line, misordered array, type coercion)
    // hash-fails against first principles
    "q201_variant_shred" -> ((s, d) => {
      val lines = lineitem(s, d).select(col("l_orderkey"),
          struct(col("l_linenumber").cast("long").as("ln"),
            ExactStats.micro(col("l_quantity")).cast("long").as("q")).as("li"))
        .groupBy("l_orderkey").agg(sort_array(collect_list("li")).as("lis"))
      val v = orders(s, d)
        .join(lines, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"),
          parse_json(to_json(struct(col("o_custkey").as("cust"),
            col("o_orderpriority").as("prio"), col("lis").as("lines"))))
            .as("v"))
      v.select(col("o_orderpriority"),
          expr("variant_get(v, '$.cust', 'long')").as("cust"),
          expr("variant_get(v, '$.lines[0].q', 'long')").as("first_q"),
          size(expr("variant_get(v, '$.lines', 'array<variant>')"))
            .cast("long").as("n_lines"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), sum("first_q").as("sum_first_q"),
          sum("n_lines").as("sum_n_lines"), sum("cust").as("cust_checksum"))
    }),

    // t-closeness (q161/q186's completer): per-QI-group Earth Mover's
    // Distance of the ordered sensitive attribute (balance band) against
    // the global distribution — for an ordered attribute EMD is the mean
    // |cumulative-share difference|, exact in ppm. Group×band grid is
    // groups × ≤7 bands (broadcast), cumulative windows run on that grid,
    // never on raw rows
    "q202_t_closeness" -> ((s, d) => {
      val bands = customer(s, d).select(col("c_nationkey"),
        col("c_mktsegment"),
        expr("cast(floor(c_acctbal / 2000.0) as long)").as("band"))
      val glob = bands.groupBy("band").agg(count(lit(1)).as("gcnt"))
      val gtot = glob.agg(sum("gcnt").as("n_total"),
        count(lit(1)).as("n_bands"))
      val gcum = glob.crossJoin(broadcast(gtot))
        .withColumn("gcum_ppm", expr(
          "(sum(gcnt) OVER (ORDER BY band) * 1000000) div n_total"))
        .select(col("band"), col("gcum_ppm"), col("n_bands"))
      val groups = bands.groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n_rows"))
      val cells = bands.groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(count(lit(1)).as("cnt"))
      val grid = groups.crossJoin(broadcast(glob.select(col("band"))))
        .join(cells, Seq("c_nationkey", "c_mktsegment", "band"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      val w = Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
      grid.withColumn("cum_ppm",
          expr("(sum(cnt) OVER (PARTITION BY c_nationkey, c_mktsegment " +
            "ORDER BY band) * 1000000) div n_rows"))
        .join(broadcast(gcum), Seq("band"))
        .groupBy("c_nationkey", "c_mktsegment", "n_rows", "n_bands")
        .agg(sum(abs(col("cum_ppm") - col("gcum_ppm"))).as("sum_absdiff"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n_rows"),
          expr("sum_absdiff div (n_bands - 1)").as("t_ppm"))
    }),

    // NDCG@5 for the dense retriever, in the integer-log contract: the
    // discount 1e6 div bitlen(rank+1) and its cumulative ideal are BOTH
    // generated from one Scala table shared with the oracle SQL, so the
    // quantization cannot drift. Relevance = label agreement (excluding
    // the self-hit); queries with no relevant hit are excluded (idcg=0)
    "q203_ndcg" -> ((s, d) => {
      val emb = embeddings(s, d)
      val topk = Similarity.cosineTopK(emb,
        emb.where(col("vec_id") % 50 === 0), "vec_id", "embedding", 5)
      val lbl = emb.select(col("vec_id"), col("label"))
      val rel = topk
        .join(broadcast(lbl.withColumnRenamed("vec_id", "query_id")
          .withColumnRenamed("label", "lq")), Seq("query_id"))
        .join(broadcast(lbl.withColumnRenamed("vec_id", "cand_id")
          .withColumnRenamed("label", "lc")), Seq("cand_id"))
        .withColumn("rel", (col("lq") === col("lc") &&
          col("cand_id") =!= col("query_id")).cast("long"))
      val per = rel.groupBy("query_id")
        .agg(sum(col("rel") * expr(NdcgDiscCase)).as("dcg"),
          sum("rel").as("nrel"))
        .where(col("nrel") > 0)
        .withColumn("ndcg_ppm",
          expr(s"(dcg * 1000000) div ($NdcgIdealCase)"))
      per.agg(count(lit(1)).as("n_queries"),
        expr("sum(ndcg_ppm) div count(1)").as("mean_ndcg_ppm"),
        min("ndcg_ppm").as("min_ndcg_ppm"),
        sum((col("ndcg_ppm") === 1000000L).cast("long")).as("n_perfect"))
    }),

    // LATERAL correlated subquery (Spark 4 lateral join): per-nation top-2
    // customers by balance expressed as the SQL-standard lateral shape —
    // the optimizer decorrelates it into a ranked join rather than
    // rescanning customers per nation; ties broken on c_custkey
    "q204_lateral_topk" -> ((s, d) => {
      nation(s, d).createOrReplaceTempView("nation_v")
      customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""SELECT n_nationkey, c_custkey, bal_micro FROM nation_v,
        LATERAL (SELECT c_custkey,
                   cast(floor(c_acctbal * 1e6) as long) AS bal_micro
                 FROM customer_v WHERE c_nationkey = n_nationkey
                 ORDER BY bal_micro DESC, c_custkey LIMIT 2)""")
    }),

    // collation-aware dedup (Spark 4 collations): case-variant duplicates
    // synthesized deterministically, then distinct-counted under binary
    // equality vs the UTF8_LCASE collation — the engine-native form of
    // case-insensitive identity, pinned against the oracle's lower()
    // formulation
    "q205_collation_dedup" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      val reg = docs.unionByName(docs.where(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          upper(col("text")).as("text")))
      reg.agg(count(lit(1)).as("n_docs"),
        count_distinct(col("text")).as("n_distinct_binary"),
        count_distinct(expr("collate(text, 'UTF8_LCASE')"))
          .as("n_distinct_ci"))
    }),

    // hive-partitioned write + partition-pruned read: the storage-layout
    // contract a 100 TB table lives or dies by. Orders land partitioned by
    // priority; the read-back filter must prune to ONE directory (PlanSpec
    // asserts PartitionFilters carries the predicate — the other 4/5 of
    // the data is never opened), and the oracle re-reads the same tree
    // hive-style, so the layout itself is hash-checked
    "q206_partition_pruning" -> ((s, d) => {
      val dir = s"$genDir/q206_orders_by_priority"
      orders(s, d).write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(dir)
      s.read.parquet(dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .agg(count(lit(1)).as("n_orders"),
          sum(ExactStats.micro(col("o_totalprice")).cast("long"))
            .as("rev_micro"),
          count_distinct(col("o_custkey")).as("n_custs"))
    }),

    // compaction planning (the small-file problem): the 4,320-file corpus
    // manifest with deterministic synthetic sizes, packed into ~64 KiB
    // bins by ordered first-fit — bin id is pure arithmetic on the
    // running sum ((cum − size) div cap), so planning is one window over
    // the per-family file lists, no driver loop. The ops sweep every
    // large table's maintenance job runs nightly
    "q207_compaction_plan" -> ((s, d) => {
      import s.implicits._
      val files = s.createDataset(
          graft.generate.Sinks.corpusManifest(Grid.all()).toSeq)
        .toDF("rel_path")
        .withColumn("family", expr("split_part(rel_path, '/', 1)"))
        .withColumn("bytes",
          (TextOps.fingerprint(col("rel_path")) % 9000 + 1000).cast("long"))
      val w = Window.partitionBy("family").orderBy("rel_path")
      val packed = files.withColumn("cum", sum("bytes").over(w))
        .withColumn("bin", expr("(cum - bytes) div 65536"))
      packed.groupBy("family", "bin")
        .agg(sum("bytes").as("bin_bytes"), count(lit(1)).as("nf"))
        .groupBy("family")
        .agg(sum("nf").as("n_files"), sum("bin_bytes").as("total_bytes"),
          count(lit(1)).as("n_bins"), max("bin_bytes").as("max_bin_bytes"))
    }),

    // hierarchical rollup by pointer doubling: the ancestor closure of the
    // decimal-digit forest (parent = id div 10) built in 3 doubling rounds
    // (A ∪ A∘A, distinct, localCheckpoint) — O(log depth) joins instead of
    // depth sequential passes, the transitive-closure shape that makes
    // deep-hierarchy rollups tractable at scale. Subtree sums for shallow
    // ancestors then drop out of one grouped join; the oracle walks the
    // SAME closure with a recursive CTE
    "q208_hierarchy_rollup" -> ((s, d) => {
      val cust = customer(s, d)
      var anc = cust.where(col("c_custkey") > 0)
        .select(col("c_custkey").as("v"),
          expr("c_custkey div 10").as("a")).localCheckpoint()
      for (_ <- 1 to 3) {
        anc = anc.unionByName(
            anc.as("x").join(anc.as("y"), col("x.a") === col("y.v"))
              .select(col("x.v").as("v"), col("y.a").as("a")))
          .distinct().localCheckpoint()
      }
      val vals = cust.select(col("c_custkey").as("v"),
        cents(col("c_acctbal")).cast("long").as("cts"))
      anc.where(col("a") < 100).join(vals, Seq("v"))
        .groupBy("a").agg(count(lit(1)).as("n_desc"),
          sum("cts").as("subtree_cents"))
    }),

    // COMPLETE output mode (the third streaming mode, after q18-append and
    // q163-update): a running top-3 event-type leaderboard whose memory
    // sink is REPLACED per micro-batch — sort+limit is legal only in this
    // mode. The 2-batch parity split proves the final emission equals the
    // batch answer no matter how the stream was chopped
    "q209_stream_complete_topk" -> ((s, d) =>
      graft.streaming.StreamAgg.eventsTopTypesComplete(s, d,
        splitDir = s"$genDir/events_split_complete",
        queryName = s"graft_complete_${System.nanoTime()}")),

    // equi-DEPTH binning (q198's equal-width complement): exact quintile
    // boundaries as order statistics on the $100-bin histogram grain
    // (boundary_q = min bin with cum ≥ ceil(qN/5) — pure integer), rows
    // assigned by comparison against the 4 broadcast boundaries. The
    // histogram is the only thing the window ever sorts; rows meet the
    // boundaries in a broadcast join, never a global rank
    "q210_equidepth_binning" -> ((s, d) => {
      val binned = orders(s, d)
        .select((cents(col("o_totalprice")).cast("long"))
          .as("v")).withColumn("b", expr("v div 10000"))
      val hist = binned.groupBy("b").agg(count(lit(1)).as("n"))
      val tot = hist.agg(sum("n").as("nt"))
      val cum = hist.crossJoin(broadcast(tot))
        .withColumn("cum", expr("sum(n) OVER (ORDER BY b)"))
      val bounds = cum.agg(
        min(when(col("cum") >= expr("(1 * nt + 4) div 5"), col("b"))).as("b1"),
        min(when(col("cum") >= expr("(2 * nt + 4) div 5"), col("b"))).as("b2"),
        min(when(col("cum") >= expr("(3 * nt + 4) div 5"), col("b"))).as("b3"),
        min(when(col("cum") >= expr("(4 * nt + 4) div 5"), col("b"))).as("b4"))
      binned.crossJoin(broadcast(bounds))
        .withColumn("bucket", lit(1L) + (col("b") > col("b1")).cast("long")
          + (col("b") > col("b2")).cast("long")
          + (col("b") > col("b3")).cast("long")
          + (col("b") > col("b4")).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_orders"), min("b").as("min_bin"),
          max("b").as("max_bin"), sum("v").as("sum_cents"))
    }),

    // per-user behavioral set similarity through array HOFs: the two
    // parity halves' distinct event-type sets meet in collect_set /
    // array_intersect (no per-pair shuffle), censused on the (|A|, |B|,
    // |A∩B|) grain with exact ppm Jaccard. The oracle never builds an
    // array — inclusion-exclusion over relational distinct counts proves
    // the HOF set algebra from first principles
    "q211_set_similarity" -> ((s, d) => {
      val per = events(s, d).groupBy("user_id").agg(
        array_sort(collect_set(when(col("event_id") % 2 === 0,
          col("event_type")))).as("sa"),
        array_sort(collect_set(when(col("event_id") % 2 === 1,
          col("event_type")))).as("sb"))
      per.select(size(col("sa")).cast("long").as("na"),
          size(col("sb")).cast("long").as("nb"),
          size(array_intersect(col("sa"), col("sb"))).cast("long").as("ni"))
        .groupBy("na", "nb", "ni")
        .agg(count(lit(1)).as("n_users"))
        .withColumn("jaccard_ppm",
          expr("(ni * 1000000) div (na + nb - ni)"))
    }),

    // schema evolution: two snapshot generations written with different
    // schemas (v2 adds a column), read back as ONE table via mergeSchema —
    // the long-lived-dataset contract every 100 TB lake depends on. The
    // oracle re-reads both trees union_by_name, so the null-fill of the
    // missing column is itself hash-checked
    "q212_schema_evolution" -> ((s, d) => {
      val o = orders(s, d)
      val v1 = s"$genDir/q212_v1"
      val v2 = s"$genDir/q212_v2"
      o.where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          ExactStats.micro(col("o_totalprice")).cast("long").as("price_micro"))
        .write.mode("overwrite").parquet(v1)
      o.where(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"),
          ExactStats.micro(col("o_totalprice")).cast("long").as("price_micro"),
          col("o_orderpriority"))
        .write.mode("overwrite").parquet(v2)
      s.read.option("mergeSchema", "true").parquet(v1, v2)
        .groupBy(coalesce(col("o_orderpriority"), lit("<pre-evolution>"))
          .as("priority"))
        .agg(count(lit(1)).as("n_orders"), sum("price_micro").as("rev_micro"),
          count_distinct(col("o_custkey")).as("n_custs"))
    }),

    // top user journeys: per (user, hour) activity window, the ordered
    // event-type path materializes through ONE sorted-struct collect (no
    // window function, no re-shuffle), long sessions capped so path state
    // stays bounded; global top-5 rides TakeOrdered. The sequence-mining
    // census every product-analytics stack starts from
    "q213_path_census" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        expr("ts div 1000").as("ts_us"), col("event_id"), col("event_type"))
        .withColumn("sess", expr("ts_us div 3600000000"))
      val per = ev.groupBy("user_id", "sess")
        .agg(count(lit(1)).as("n"),
          expr("array_join(transform(array_sort(collect_list(" +
            "struct(ts_us, event_id, event_type))), x -> x.event_type), " +
            "'>')").as("path"))
      per.where(col("n") <= 8)
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(5)
    }),

    // r×c chi-square independence (q156's 2×2 generalized): nation ×
    // segment observed vs expected under independence, the whole statistic
    // exact — contrib_milli = (O·N − rt·ct)²·1000 div (rt·ct·N) in
    // DECIMAL(38,0)/HUGEINT. Safe bound: (O·N)² must stay under 10^38, so
    // exact arithmetic holds to N ≈ 10^9 rows per grid; beyond that,
    // rescale counts (divide margins by a common factor) before squaring.
    // Dimension margins broadcast back onto the ≤125-cell grid
    "q214_chi2_independence" -> ((s, d) => {
      val cells = customer(s, d)
        .groupBy(col("c_nationkey").as("r"), col("c_mktsegment").as("c"))
        .agg(count(lit(1)).as("o"))
      val rt = cells.groupBy("r").agg(sum("o").as("rt"))
      val ct = cells.groupBy("c").agg(sum("o").as("ct"))
      val n = cells.agg(sum("o").as("n"),
        count_distinct(col("r")).as("nr"), count_distinct(col("c")).as("nc"))
      cells.join(broadcast(rt), "r").join(broadcast(ct), "c")
        .crossJoin(broadcast(n))
        .withColumn("contrib_milli", expr(
          "cast(cast((o * n - rt * ct) as decimal(38,0)) " +
            "* (o * n - rt * ct) * 1000 div (rt * ct * n) as long)"))
        .agg(sum("contrib_milli").as("chi2_milli"),
          count(lit(1)).as("n_cells"),
          max(expr("(nr - 1) * (nc - 1)")).as("dof"),
          max(col("n")).as("n_customers"))
    }),

    // time-decayed engagement scoring (the feature-store freshness
    // weighting) in EXACT integer halving: value halves per week of age
    // (v div 2^age_weeks, shift capped), so the score is bit-stable under
    // any partitioning — no float decay drift. One scan + broadcast
    // max-ts, top-10 rides TakeOrdered
    "q215_time_decay_score" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        expr("ts div 1000").as("ts_us"),
        greatest(floor(col("value") * 1e6), lit(0.0)).cast("long")
          .as("vm"))
      val mx = ev.agg(max("ts_us").as("max_us"))
      ev.crossJoin(broadcast(mx))
        .withColumn("shift", least(
          expr("(max_us - ts_us) div 604800000000"), lit(20L)).cast("int"))
        .withColumn("dec", expr("vm div (cast(1 as bigint) << shift)"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("dec").as("decayed_micro"))
        .orderBy(col("decayed_micro").desc, col("user_id")).limit(10)
    }),

    // sequence-pattern census over the q213 journey paths: how many
    // (user, hour) sessions contain the click→purchase adjacency, a view
    // before any purchase, or an error anywhere — pattern tests are plain
    // substring containment on the materialized path (identical semantics
    // on both engines; no regex-dialect drift), the MATCH_RECOGNIZE-lite
    // every product funnel starts with
    "q216_sequence_pattern" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        expr("ts div 1000").as("ts_us"), col("event_id"), col("event_type"))
        .withColumn("sess", expr("ts_us div 3600000000"))
      val per = ev.groupBy("user_id", "sess")
        .agg(expr("array_join(transform(array_sort(collect_list(" +
          "struct(ts_us, event_id, event_type))), x -> x.event_type), " +
          "'>')").as("path"))
      per.agg(count(lit(1)).as("n_sessions"),
        sum(col("path").contains("click>purchase").cast("long"))
          .as("n_click_then_purchase"),
        sum((instr(col("path"), "view") > 0 &&
          instr(col("path"), "purchase") > instr(col("path"), "view"))
          .cast("long")).as("n_view_before_purchase"),
        sum(col("path").contains("error").cast("long")).as("n_with_error"))
    }),

    // sorted-neighborhood blocking (the classic alternative to q195's key
    // blocking): sort the dirty registry by its stable digit payload INSIDE digit-suffix
    // partitions, pair each record with its next 2 neighbors (two lead()
    // calls — O(w·N) candidates, no self-join), and score recall against
    // q195's full blocked-candidate truth. Cross-partition misses are the
    // documented SNM trade; the recall number IS the output
    "q217_sorted_neighborhood" -> ((s, d) => {
      val reg = erRegistry(s, d)
      // sort key quality IS the method: sorting by the mutation-stable
      // digit payload (blk) puts true duplicates adjacent; sorting by raw
      // name would scatter them and recall collapses to 0
      val w = Window.partitionBy(expr("right(name, 2)"))
        .orderBy(col("blk"), col("name"), col("id"))
      val nbr = reg
        .withColumn("n1", lead(col("name"), 1).over(w))
        .withColumn("i1", lead(col("id"), 1).over(w))
        .withColumn("n2", lead(col("name"), 2).over(w))
        .withColumn("i2", lead(col("id"), 2).over(w))
      val pairs = nbr.where(col("i1").isNotNull)
        .select(col("id").as("ia"), col("name").as("na"),
          col("i1").as("ib"), col("n1").as("nb"))
        .unionByName(nbr.where(col("i2").isNotNull)
          .select(col("id").as("ia"), col("name").as("na"),
            col("i2").as("ib"), col("n2").as("nb")))
        .select(least(col("ia"), col("ib")).as("id_lo"),
          greatest(col("ia"), col("ib")).as("id_hi"),
          expr("levenshtein(na, nb)").cast("long").as("lev"))
        .distinct()
      val truth = erCandidates(s, d).where(col("lev") <= 2)
        .select(least(col("id_a"), col("id_b")).as("id_lo"),
          greatest(col("id_a"), col("id_b")).as("id_hi"))
      val hits = pairs.where(col("lev") <= 2)
        .join(truth, Seq("id_lo", "id_hi"), "inner")
      pairs.agg(count(lit(1)).as("n_pairs_considered"),
          sum((col("lev") <= 2).cast("long")).as("n_matches"))
        .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true_matches"))))
        .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
        .select(col("n_pairs_considered"), col("n_matches"),
          col("n_true_matches"), col("n_hits"),
          expr("(n_hits * 1000000) div n_true_matches").as("recall_ppm"))
    }),

    // bucket pruning (q59's bucketed layout, read side): a point-lookup
    // filter on the bucketing key scans only the buckets those keys hash
    // to — PlanSpec asserts SelectedBucketsCount < total, the
    // file-skipping complement to q206's directory pruning. At 100 TB the
    // difference is opening 3 files instead of 8·(files per bucket)
    "q218_bucket_pruning" -> ((s, d) => {
      val name = "graft_cust_bucketed"
      s.sql(s"DROP TABLE IF EXISTS $name")
      val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir")).getPath
      val dir = new java.io.File(wh, name)
      if (dir.exists)
        require(scala.reflect.io.Directory(dir).deleteRecursively(),
          s"cannot clear stale table location $dir")
      customer(s, d).select("c_custkey", "c_nationkey", "c_acctbal")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(name)
      // the auto-bucketed-scan heuristic drops the bucketed layout when no
      // join wants its distribution — but that also forfeits bucket
      // PRUNING, which is the point here. Scope the override to a child
      // session (own SQLConf, shared catalog) so the rest of a same-JVM
      // verify/bench run plans with the untouched session conf
      val s2 = s.newSession()
      s2.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      s2.table(name).where(col("c_custkey").isin(7L, 42L, 100L))
        .select(col("c_custkey"), col("c_nationkey"),
          cents(col("c_acctbal")).cast("long").as("bal_cents"))
    }),

    // query observability: the observe() API attaches metrics to a running
    // query (zero extra scan — the listener collects them as rows flow),
    // the production pattern for row-count/quality monitors on 100 TB
    // pipelines where a second audit pass is unaffordable. The observed
    // metrics ARE the output here, and the oracle recomputes them with a
    // plain aggregate — so the listener path is hash-checked against the
    // data itself
    "q219_query_observability" -> ((s, d) => {
      val obs = org.apache.spark.sql.Observation()
      val li = lineitem(s, d).observe(obs,
        count(lit(1)).as("n_rows"),
        sum(cents(col("l_extendedprice")).cast("long")).as("sum_price_cents"),
        sum(col("l_quantity").isNull.cast("long")).as("n_null_qty"),
        max(cents(col("l_discount")).cast("long")).as("max_disc_cents"))
      li.where(col("l_quantity") > 0).write.mode("overwrite")
        .format("noop").save() // drive the scan; metrics land in obs
      val m = obs.get
      import s.implicits._
      Seq((m("n_rows").asInstanceOf[Long],
        m("sum_price_cents").asInstanceOf[Long],
        m("n_null_qty").asInstanceOf[Long],
        m("max_disc_cents").asInstanceOf[Long]))
        .toDF("n_rows", "sum_price_cents", "n_null_qty", "max_disc_cents")
    }),

    // ANSI-mode safe casting: try_cast/try_divide turn malformed input
    // into nulls instead of job-killing exceptions — the ingestion-edge
    // contract for dirty 100 TB feeds. Tokens of the documents corpus are
    // probed as numbers; the census pins how many parse, and the sum of
    // those that do, plus a try_divide-by-zero null count
    "q220_try_cast_audit" -> ((s, d) => {
      // the word corpus carries no numeric tokens, so deterministic
      // integer-form tokens (n_chars, -doc_id) are mixed in; dotted
      // decimals are deliberately absent — Spark's try_cast nulls '3.5'
      // where DuckDB rounds it, a real cross-engine semantic edge this
      // contract sidesteps by construction
      val docs = documents(s, d)
      val toks = docs.select(col("doc_id"),
          explode(TextOps.tokensCol(col("text"))).as("tok"))
        .unionByName(docs.select(col("doc_id"),
          col("n_chars").cast("string").as("tok")))
        .unionByName(docs.select(col("doc_id"),
          concat(lit("-"), col("doc_id")).as("tok")))
      toks.select(col("doc_id"), col("tok"),
          expr("try_cast(tok as bigint)").as("num"),
          expr("try_divide(100, length(tok) - 3)").as("risky"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("num").isNotNull.cast("long")).as("n_numeric"),
          sum(coalesce(col("num"), lit(0L))).as("sum_numeric"),
          sum(col("risky").isNull.cast("long")).as("n_div_null"))
    }),

    // REAL image resize (the thumbnail/preprocess stage, completing the
    // multimodal quartet: decode q176 / features / resize / frame-sample
    // q50): genuine PNGs decoded through ImageIO, nearest-neighbor resized
    // to 8×6 in exact floor-division arithmetic, features of the RESIZED
    // raster — the oracle replays the sampling map pixel-by-pixel,
    // codec-free, so a wrong resize kernel hash-fails
    "q221_image_resize" -> ((s, d) => {
      import graft.multimodal.Multimodal
      Multimodal.imageResizeFeatures(
          Multimodal.synthImageCorpus(documents(s, d)), 8, 6)
        .toDF()
        .select(col("mediaId").as("media_id"), col("width"), col("height"),
          col("nPixels").as("n_pixels"), col("sumPix").as("sum_pix"),
          col("momentPix").as("moment_pix"), col("meanMilli").as("mean_milli"))
    }),

    // foreachBatch CDC-apply: the parity-split change stream merged into a
    // versioned per-user serving table batch by batch (latest-wins, merge
    // input collapsed to |keys touched| first) — the lakehouse pattern for
    // sinks with no native MERGE. The invariant under test: the final
    // version equals the one-shot latest-per-user over the whole stream,
    // however the stream was chopped
    "q222_stream_foreachbatch_upsert" -> ((s, d) =>
      graft.streaming.StreamUpsert.eventsIncrementalUpsert(s, d,
        splitDir = s"$genDir/events_split_upsert",
        tableDir = s"$genDir/q222_serving_table",
        queryName = s"graft_febupsert_${System.nanoTime()}")),

    // MapType end-to-end: per-user event-type histograms as REAL map
    // columns (map_from_entries over one sorted collect), consumed with
    // map lookups (element_at), size, and a map_values HOF fold — then
    // censused back to scalars. The semi-structured per-entity-profile
    // shape feature stores serve; the oracle proves the map algebra
    // relationally
    "q223_map_analytics" -> ((s, d) => {
      val m = events(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("event_type"), col("n"))))).as("m"))
      m.select(size(col("m")).cast("long").as("n_types"),
          // try_element_at: ANSI element_at throws on a missing map key;
          // a purchase-free user must yield 0, not MAP_KEY_DOES_NOT_EXIST
          coalesce(try_element_at(col("m"), lit("purchase")), lit(0L))
            .as("n_purchase"),
          expr("aggregate(map_values(m), 0L, (a, x) -> a + x)")
            .as("n_total"))
        .groupBy("n_types")
        .agg(count(lit(1)).as("n_users"), sum("n_purchase").as("sum_purchase"),
          sum("n_total").as("sum_events"))
    }),

    // correlated scalar subquery (the fourth correlation shape after
    // EXISTS q167, IN q34, LATERAL q204): per-order max line quantity as
    // an inline scalar — Catalyst decorrelates it into one aggregate +
    // join instead of a per-row rescan, which is the difference between
    // one shuffle and O(orders) scans at 100 TB
    "q224_scalar_subquery" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("ord_v")
      lineitem(s, d).createOrReplaceTempView("li_v")
      s.sql("""SELECT o_orderpriority, count(*) AS n_orders,
          sum((SELECT coalesce(cast(floor(max(l_quantity) * 1e6) as long), 0)
               FROM li_v l WHERE l.l_orderkey = o.o_orderkey))
            AS sum_max_qty_micro
        FROM ord_v o GROUP BY o_orderpriority""")
    }),

    // SQL-native PIVOT clause (the API complement of q39's DataFrame
    // pivot): multi-aggregate pivot over a pinned value list — the value
    // list is explicit, so the output schema is static and plannable (an
    // inferred list would need an extra distinct pass at 100 TB). The
    // oracle is plain conditional aggregation with matching column names
    "q225_sql_pivot" -> ((s, d) => {
      events(s, d).select((col("user_id") % 10).as("cohort"),
          col("event_type"),
          floor(col("value") * lit(1e6)).cast("long").as("vm"))
        .createOrReplaceTempView("ev_pivot_v")
      s.sql("""SELECT * FROM ev_pivot_v
        PIVOT (count(*) AS n, sum(vm) AS s
               FOR event_type IN ('click' AS click, 'view' AS view,
                                  'purchase' AS purchase))""")
    }),

    // explicit null ordering: Spark sorts nulls FIRST ascending by
    // default, DuckDB LAST — an engine-default divergence that silently
    // reorders any ranked output with nullable keys. The contract pins
    // NULLS LAST explicitly on both sides (top-3 per status over a
    // deliberately nulled key), which is the only portable spelling
    "q226_null_ordering" -> ((s, d) => {
      val o = orders(s, d).select(col("o_orderstatus"),
        expr("nullif(o_orderpriority, '1-URGENT')").as("prio_nullable"),
        col("o_orderkey"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("prio_nullable").asc_nulls_last, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .select(col("o_orderstatus"), col("prio_nullable"),
          col("o_orderkey"), col("rn").cast("long").as("rn"))
    }),

    // DYNAMIC partition pruning — the join-driven counterpart of q206's
    // static directory pruning: the fact side is partitioned on
    // o_orderpriority, the pruning predicate lives on a DIMENSION (tier =
    // 'hot'), so no static filter touches the partition column. Catalyst's
    // PartitionPruning rule derives a runtime IN-subquery from the
    // broadcast side and the scan lists only the two 'hot' directories —
    // the single biggest scan saver on a 100 TB date/tenant-partitioned
    // fact where every query filters through a dimension. PlanSpec pins
    // the dynamicpruning expression in the scan's PartitionFilters
    "q253_dpp_partition_join" -> ((s, d) => {
      val dir = s"$genDir/q253_orders_by_priority"
      orders(s, d).write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(dir)
      import s.implicits._
      // the dim must be a STORAGE scan, not a literal Seq: Catalyst's
      // ConvertToLocalRelation would eagerly fold a Filter over a
      // LocalRelation, and with no surviving selective predicate on the
      // filtering side the PartitionPruning rule never inserts the DPP
      // subquery (verified: the literal form plans a plain static scan)
      val dimDir = s"$genDir/q253_priority_tier_dim"
      Seq(("1-URGENT", "hot"), ("2-HIGH", "hot"),
        ("3-MEDIUM", "warm"), ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold"))
        .toDF("pri", "tier").write.mode("overwrite").parquet(dimDir)
      s.read.parquet(dir)
        .join(broadcast(s.read.parquet(dimDir)),
          col("o_orderpriority") === col("pri"))
        .where(col("tier") === "hot")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(ExactStats.micro(col("o_totalprice")).cast("long"))
            .as("rev_micro"),
          count_distinct(col("o_custkey")).as("n_custs"))
    }),

    // HITS hubs & authorities over the q86 supply graph: PageRank scores
    // "importance" on one axis; HITS separates exporter (hub) from
    // importer (authority) roles — a nation can rank high on one and near
    // zero on the other. Same two-tier shape: fact-scale edge derivation
    // (the only stage that touches lineitem), then 3 integer-exact
    // iterations on the 25-node contracted graph with broadcast score
    // state (ops/Hits.scala)
    "q254_nation_hits" -> ((s, d) =>
      graft.ops.Hits.scoresMicro(nationTradeEdges(s, d), iterations = 3)
        .select(col("node").as("nation"), col("auth_micro"),
          col("hub_micro"))),

    // template/boilerplate stripping (text/Boilerplate.scala): 5-grams in
    // ≥10% of documents are template chrome; every covered token position
    // is dropped. Planted ground truth: docs with id%3=0 carry an
    // 8-token injected header (df ≈ 33% → stripped), docs with id%29=0 a
    // rarer one (df ≈ 3% → kept, the negative control). Body grams from
    // the 31-word vocabulary stay far under the 10% document-frequency
    // bar, so the census measures exactly the planted template
    "q255_boilerplate_strip" -> ((s, d) => {
      val mixed = documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(lit(BoilerTemplate + " "), col("text")))
          .when(col("doc_id") % 29 === 0,
            concat(lit(BoilerRareTemplate + " "), col("text")))
          .otherwise(col("text")).as("text"))
      graft.text.Boilerplate.coverage(mixed, "doc_id", "text",
        n = 5, permille = 100)
    }),

    // full iterative BPE tokenizer training (text/Bpe.scala): 6 merge
    // rounds over the corpus word-frequency vocabulary — the corpus is
    // scanned once, every round runs on distinct words. Each round's
    // pre-merge state is dumped positionally so the oracle re-derives the
    // argmax AND the merge application (candidate-chain parity) from the
    // exact rows Spark used — selection and application are both pinned
    "q256_bpe_train" -> ((s, d) =>
      graft.text.Bpe.train(s, documents(s, d), "text", rounds = 6,
        dumpDir = Some(s"$genDir/q256_bpe"))),

    // BPE ENCODING — the trained merges applied back to the corpus: every
    // token occurrence joins its trained segmentation (distinct-word-sized
    // vocab, AQE-broadcast) and the census counts each subword symbol's
    // corpus occurrences and word spread. The oracle derives the same
    // census from the dumped final vocabulary by the weighting identity
    // Σ_corpus 1 = Σ_vocab cnt — an independent derivation path that
    // cross-checks the encode join/explode plumbing against the dump
    "q257_bpe_encode" -> ((s, d) => {
      val docs = documents(s, d)
      val vocab = graft.text.Bpe.trainedVocab(s, docs, "text", rounds = 6,
        dumpDir = Some(s"$genDir/q257_bpe"))
      graft.text.Bpe.encode(docs, "doc_id", "text", vocab)
        .groupBy("sym")
        .agg(count(lit(1)).as("n_occ"),
          count_distinct(col("w")).as("n_words"))
    }),

    // closeness centrality over the top-3-trade-partner digraph: the full
    // supply graph is near-complete (diameter ~1, distances trivial), so
    // each nation keeps only its 3 heaviest-weight partners — a sparse
    // deterministic digraph with real multi-hop structure. Multi-source
    // BFS: 8 rounds of (expand ∪ keep → min), state keyed (src, node),
    // lineage snapped per round; closeness = (reached−1)·1e6 div Σdist,
    // pure integers end to end. Fact rows only feed the edge derivation
    "q258_closeness_centrality" -> ((s, d) => {
      val top3 = nationTradeEdges(s, d)
        .withColumn("rk", row_number().over(Window.partitionBy("src")
          .orderBy(col("w").desc, col("dst"))))
        .where(col("rk") <= 3).select(col("src").as("u"), col("dst").as("v"))
        .localCheckpoint(false)
      val nodes = nation(s, d).select(col("n_name").as("node"))
      var dist = nodes.select(col("node").as("src"), col("node"),
        lit(0L).as("dist"))
      for (_ <- 1 to 8) {
        val nxt = dist.join(top3, dist("node") === top3("u"))
          .select(col("src"), col("v").as("node"),
            (col("dist") + 1L).as("dist"))
        dist = dist.union(nxt).groupBy("src", "node")
          .agg(min("dist").as("dist")).localCheckpoint(false)
      }
      dist.groupBy(col("src").as("nation"))
        .agg(count(lit(1)).as("n_reached"), sum("dist").as("sum_dist"))
        .select(col("nation"), col("n_reached"), col("sum_dist"),
          expr("""case when sum_dist > 0
                  then ((n_reached - 1) * 1000000) div sum_dist
                  else 0L end""").as("closeness_micro"))
    }),

    // CUPED variance-reduced A/B readout (Deng et al. 2013): pre-period
    // purchase value is the covariate, θ = cov(X,Y)/var(X) from pooled
    // exact sufficient statistics (one scalar row, DECIMAL(38,0) sums —
    // Σxy ~ 1e20 overflows LONG at 500 users already), adjusted metric
    // Y − θ(X − X̄) per user, then per-arm means. Every division is
    // `div`/`//` — both engines truncate toward zero, negatives included
    // (verified), so the fixed-point θ and the adjusted means are bitwise
    // cross-engine. The period pivot is the overflow-safe midpoint test
    // 2·ts < min+max (no division, order-preserving under the ns↔us unit
    // change). Scale: two scans of events (per-user rollup, then scalar
    // stats), state is one broadcast row — nothing widens with users
    "q259_cuped_ab_adjust" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("ts"),
        col("event_type"),
        ExactStats.micro(col("value")).cast("long").as("vm"))
      val piv = ev.agg(min("ts").as("mn"), max("ts").as("mx"))
      val per = ev.crossJoin(broadcast(piv))
        .groupBy("user_id")
        .agg(
          sum(when(col("event_type") === "purchase"
            && col("ts") * 2 < col("mn") + col("mx"), col("vm"))
            .otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase"
            && col("ts") * 2 >= col("mn") + col("mx"), col("vm"))
            .otherwise(0L)).as("y"))
        .localCheckpoint(false)
      val stats = per.agg(
          count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
        .select(
          expr("""case when n * sxx - sx * sx = 0 then 0L
                  else ((n * sxy - sx * sy) * 1000000)
                       div (n * sxx - sx * sx) end""").as("theta_micro"),
          expr("sx div n").as("xbar_micro"))
      per.crossJoin(broadcast(stats))
        .withColumn("adj", col("y") -
          expr("(theta_micro * (x - xbar_micro)) div 1000000"))
        .groupBy((col("user_id") % 2).as("arm"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(col("adj").cast("decimal(38,0)")).as("sadj"),
          max("theta_micro").as("theta_micro"))
        .select(col("arm"), col("n_users"),
          expr("sy div n_users").as("mean_y_micro"),
          expr("sadj div n_users").as("mean_adj_micro"),
          col("theta_micro"))
    }),

    // directed weighted modularity of the REGION partition over the trade
    // graph — "is trade intra-region?" as an exact integer. Per community:
    // Q_c = (m·e_c − a_c·b_c)·1e6 div m² with e_c = intra-community
    // weight, a_c/b_c = out/in strength, m = total weight; all sums in
    // DECIMAL(38,0) (m² ~1e24 at a 1e12-edge-weight corpus), the one
    // division truncating identically on both engines (negatives
    // included). Fact rows only feed the shared edge derivation; the
    // modularity arithmetic runs on ≤ |nations|² rows
    "q260_region_modularity" -> ((s, d) => {
      val regs = nation(s, d)
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name").as("nname"), col("r_name").as("reg"))
      val el = nationTradeEdges(s, d)
        .join(broadcast(regs.select(col("nname").as("src"),
          col("reg").as("rsrc"))), "src")
        .join(broadcast(regs.select(col("nname").as("dst"),
          col("reg").as("rdst"))), "dst")
        .localCheckpoint(false)
      val m = el.agg(sum("w").cast("decimal(38,0)").as("m"))
      val intra = el.where(col("rsrc") === col("rdst"))
        .groupBy(col("rsrc").as("reg"))
        .agg(sum("w").as("e_w"))
      val outS = el.groupBy(col("rsrc").as("reg"))
        .agg(sum("w").as("out_w"))
      val inS = el.groupBy(col("rdst").as("reg"))
        .agg(sum("w").as("in_w"))
      region(s, d).select(col("r_name").as("reg"))
        .join(broadcast(intra), Seq("reg"), "left")
        .join(broadcast(outS), Seq("reg"), "left")
        .join(broadcast(inS), Seq("reg"), "left")
        .select(col("reg"),
          coalesce(col("e_w"), lit(0L)).as("e_w"),
          coalesce(col("out_w"), lit(0L)).as("out_w"),
          coalesce(col("in_w"), lit(0L)).as("in_w"))
        .crossJoin(broadcast(m))
        .select(col("reg"), col("e_w"), col("out_w"), col("in_w"),
          expr("""case when m > 0 then
                    ((m * e_w - cast(out_w as decimal(38,0)) * in_w)
                      * 1000000) div (m * m)
                  else 0L end""").as("contrib_micro"))
    }),

    // out-of-fold target encoding — the leakage-free categorical feature
    // every tabular training pipeline ships: a row's encoding averages the
    // target over all OTHER folds, enc(cat, fold) = (S_cat − S_cat,fold)
    // div (N_cat − N_cat,fold). One aggregate at (category, fold) grain,
    // per-category totals via a window over the 25-row grid — the fact
    // table is scanned once and nothing joins at row grain. Folds are
    // deterministic (o_custkey % 5)
    "q261_target_encoding" -> ((s, d) => {
      val o = orders(s, d).select(col("o_orderpriority").as("cat"),
        (col("o_custkey") % 5).as("fold"),
        cents(col("o_totalprice")).cast("long").as("t"))
      val grid = o.groupBy("cat", "fold")
        .agg(count(lit(1)).as("n_cf"),
          sum(col("t").cast("decimal(38,0)")).as("s_cf"))
      val wc = Window.partitionBy("cat")
      grid
        .withColumn("n_cat", sum("n_cf").over(wc))
        .withColumn("s_cat", sum("s_cf").over(wc))
        .select(col("cat"), col("fold"),
          (col("n_cat") - col("n_cf")).as("n_oof"),
          expr("""case when n_cat - n_cf > 0
                  then (s_cat - s_cf) div (n_cat - n_cf)
                  else 0L end""").as("enc_cents"))
    }),

    // DSIR-style importance resampling (Xie et al. 2023, integer-exact
    // skeleton): hashed-bigram features (fingerprint % 256), per-bucket
    // target(lang=en)/raw frequency ratio as an integer log
    // (bitlen((t+1)·1024 div (r+1)) — the q188/q189 device), per-doc
    // score = Σ occurrences · log-ratio, then the deterministic
    // content-keyed priority sampler (Sampling.weightedPrioritySample)
    // draws 100 docs ∝ score. Scale: the feature table is 256 rows
    // (broadcast), scoring is one equi-join + groupBy(doc) — the corpus
    // is scanned twice (count pass, score pass), nothing else grows
    "q262_dsir_resample" -> ((s, d) => {
      val docs = documents(s, d)
      val big = docs.select(col("doc_id"), col("lang"),
          explode(TextOps.shinglesAll(col("text"), 2)).as("g"))
        .withColumn("b", TextOps.fingerprint(col("g")) % 256)
      // raw and target counts in ONE map-side-combinable pass (a separate
      // filtered aggregate would re-explode the corpus)
      val lr = big.groupBy("b")
        .agg(count(lit(1)).as("r_cnt"),
          sum((col("lang") === "en").cast("long")).as("t_cnt"))
        .select(col("b"),
          expr("""cast(length(bin(
                    (t_cnt + 1) * 1024 div (r_cnt + 1)))
                  as bigint)""").as("lr"))
      val scores = big.join(broadcast(lr), "b")
        .groupBy("doc_id").agg(sum("lr").as("score"))
      val scored = docs.join(scores, Seq("doc_id"), "left")
        .select(col("doc_id"), col("text"),
          coalesce(col("score"), lit(0L)).as("score"))
      graft.text.Sampling.weightedPrioritySample(scored, "doc_id", "text",
        col("score"), k = 100)
    }),

    // corpus-wide exact-substring dedup, keep-first (text/Dedup
    // .substringDupCoverage — the Lee et al. 2021 dedup): planted ground
    // truth reuses the q248 splice (doc pairs (2i, 2i+1) with id < 80
    // share the even member's 12-token prefix), so the odd member's three
    // duplicate 10-grams cover exactly its 12 spliced positions while the
    // even member — the lexicographic first occurrence — keeps everything
    "q263_substring_dedup" -> ((s, d) => {
      val docs = documents(s, d)
      val donor = docs.where(col("doc_id") % 2 === 0 && col("doc_id") < 80)
        .select((col("doc_id") + 1).as("doc_id"),
          expr("concat_ws(' ', slice(split(text, ' '), 1, 12))").as("pfx"))
      val mixed = docs.join(donor, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("pfx").isNotNull,
            concat(col("pfx"), lit(" "), col("text")))
            .otherwise(col("text")).as("text"))
      Dedup.substringDupCoverage(mixed, "doc_id", "text", k = 10)
    }),

    // bigram-conditional perplexity filter — the KenLM-shaped quality gate
    // (perplexity against a corpus LM is THE classic LLM-data filter;
    // q188 is the unigram marginal, this is the conditional): surprisal
    // of token b given predecessor a = bitlen(c(a·)) − bitlen(c(ab))
    // (integer log2 ratio of context to bigram count), per-doc mean in
    // milli-bits, keep ⇔ mean ≤ 4500. Scale: the bigram count table is
    // vocab²-bounded (joined back equi-keyed, AQE-broadcast while it
    // fits), the corpus is scanned twice (count pass, score pass), and
    // both aggregates are map-side combinable
    "q264_bigram_perplexity" -> ((s, d) => {
      // pairs as structs straight off the token array — building "a b"
      // shingle STRINGS and re-splitting them doubled the per-row string
      // work (measured 4.1 s → struct form avoids the concat+resplit)
      val big = documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), explode(expr(
          """case when size(tk) >= 2
            |  then transform(sequence(0, size(tk) - 2),
            |         i -> named_struct('a', tk[i], 'b', tk[i + 1]))
            |  else cast(array() as array<struct<a:string,b:string>>)
            |end""".stripMargin)).as("p"))
        .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      val cab = big.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      // context count = bigram occurrences whose first token is a (token
      // count minus doc-final positions — consistent with c_ab's support)
      val ca = cab.groupBy("a").agg(sum("c_ab").as("c_a"))
      big.join(broadcast(cab), Seq("a", "b"))
        .join(broadcast(ca), Seq("a"))
        .select(col("doc_id"),
          (length(bin(col("c_a"))) - length(bin(col("c_ab"))))
            .cast("long").as("sbits"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("sbits").as("sum_bits"))
        .select(col("doc_id"), col("n_bigrams"), col("sum_bits"),
          expr("(sum_bits * 1000) div n_bigrams").as("mean_milli"))
        .withColumn("keep",
          (col("mean_milli") <= 4500L).cast("long"))
    }),

    // tokenizer-aware packing manifest — the pretraining composition:
    // q63 packs by WHITESPACE counts, but a training run packs by the
    // TOKENIZER's subword counts, so this trains the q256 BPE, prices
    // every document in encoded tokens (vocab-sized broadcast join —
    // the corpus never re-tokenizes per round), and lays the corpus into
    // 512-token sequences with the q63 content-keyed shard + prefix-sum
    // placement (one window per shard, no global sort). The oracle
    // re-prices docs from the dumped final segmentation and replays the
    // same integer placement arithmetic
    "q265_bpe_pack_manifest" -> ((s, d) => {
      val docs = documents(s, d)
      val vocab = graft.text.Bpe.trainedVocab(s, docs, "text", rounds = 6,
        dumpDir = Some(s"$genDir/q265_bpe"))
      val wlen = vocab.select(col("w"), size(col("syms")).cast("long")
        .as("n_syms"))
      val encLen = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "")
        .join(broadcast(wlen), "w")
        .groupBy("doc_id").agg(sum("n_syms").as("enc_len"))
      val w = Window.partitionBy("shard").orderBy("doc_id")
      encLen.withColumn("shard", pmod(col("doc_id"), lit(8L)))
        .withColumn("tok_end", sum("enc_len").over(w))
        .withColumn("tok_start", col("tok_end") - col("enc_len"))
        .withColumn("first_seq", expr("tok_start div 512"))
        .withColumn("last_seq", expr("(tok_end - 1) div 512"))
        .select(col("doc_id"), col("shard"), col("enc_len"),
          col("tok_start"), col("first_seq"), col("last_seq"),
          (col("last_seq") - col("first_seq") + 1L).as("n_seqs"))
    }),

    // functional-dependency audit (the Hummingbird/Metanome-class data
    // profiling primitive): for each candidate det → dep pair, count
    // determinant groups and groups whose dependent is not single-valued.
    // Each candidate is one column-pruned scan + one (det)-grain aggregate
    // with count_distinct(dep) — map-side combinable, no row-grain joins;
    // candidates union at the 4-row result grain
    "q266_fd_audit" -> ((s, d) => {
      def fd(name: String, det: String, dep: String) =
        orders(s, d).groupBy(col(det))
          .agg(count_distinct(col(dep)).as("ndep"))
          .agg(lit(name).as("fd"), count(lit(1)).as("n_groups"),
            sum((col("ndep") > 1).cast("long")).as("n_violating"))
          .withColumn("holds", (col("n_violating") === 0L).cast("long"))
      fd("orderkey_to_custkey", "o_orderkey", "o_custkey")
        .unionByName(fd("custkey_to_status", "o_custkey", "o_orderstatus"))
        .unionByName(fd("orderkey_to_priority",
          "o_orderkey", "o_orderpriority"))
        .unionByName(fd("orderdate_to_priority",
          "o_orderdate", "o_orderpriority"))
    }),

    // shot-boundary keyframe selection over REAL video (PNG frames in a
    // spec-correct AVI container, planted hard cut per video): per-frame
    // motion from the honest decode path (multimodal/Multimodal
    // .videoFrameMotion), keyframe ⇔ first frame or the frame carries
    // ≥ half the video's total motion — which only the cut does, since
    // within-shot jitter touches ~1/29 of pixels. The oracle re-derives
    // every frame's motion codec-free from the synth formula, so a demux
    // misalignment or pixel-layout bug breaks the hash
    "q267_shot_keyframes" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val fm = Multimodal
        .videoFrameMotion(Multimodal.synthShotVideoCorpus(documents(s, d)))
        .toDF()
      val w = Window.partitionBy("mediaId")
      fm.withColumn("total_motion", sum("motionAbs").over(w))
        .select(col("mediaId").as("media_id"),
          col("frameIdx").cast("long").as("frame_idx"),
          col("sumPix").as("sum_pix"), col("motionAbs").as("motion_abs"),
          ((col("frameIdx") === 0) ||
            (col("motionAbs") * 2 >= col("total_motion")))
            .cast("long").as("is_key"))
    }),

    // matryoshka truncation audit (MRL, Kusupati et al. 2022 — serve the
    // first d′ dims, re-rank with full vectors): exact cosine top-5 under
    // 16-of-64-dim prefixes vs the full-dimension truth, recall in exact
    // ppm. The audit a vector-store operator runs before flipping serving
    // to truncated embeddings; both rankers are the q14 partial top-k
    // aggregate (corpus never shuffles, queries broadcast)
    "q268_matryoshka_recall" -> ((s, d) => {
      val emb = embeddings(s, d)
      val full = Similarity.cosineTopK(emb,
        emb.where(col("vec_id") < 10), "vec_id", "embedding", 5)
      val e16 = emb.select(col("vec_id"),
        expr("slice(embedding, 1, 16)").as("embedding"))
      val trunc = Similarity.cosineTopK(e16,
        e16.where(col("vec_id") < 10), "vec_id", "embedding", 5)
      val nF = full.agg(count(lit(1)).as("n_full"))
      val nT = trunc.agg(count(lit(1)).as("n_trunc"))
      val hit = full.select(col("query_id"), col("cand_id"))
        .join(trunc.select(col("query_id"), col("cand_id")),
          Seq("query_id", "cand_id"))
        .agg(count(lit(1)).as("n_hit"))
      nF.crossJoin(broadcast(nT)).crossJoin(broadcast(hit))
        .select(col("n_full"), col("n_trunc"), col("n_hit"),
          expr("(n_hit * 1000000) div n_full").as("recall_ppm"))
    }),

    // ---- causal-discovery analysis suite (metrics/Causal.scala) ----
    // The reference generates benchmark corpora FOR external causal-
    // discovery tools and only ingests their output (R3-R5 converters);
    // these four run the discovery step itself, engine-native. One
    // fact-scale aggregation feeds a #series × #days panel; every test is
    // an exact-integer cross-multiplied contract (no division touches a
    // decision), so the census hashes bitwise against DuckDB.

    // pairwise lag-1 Granger F-test census over the event-type panel:
    // 20 ordered pairs, centered cross-moment integers, one Frisch-Waugh
    // step instead of a 3x3 solve, F compared at the 5% critical value
    // 4.22 = F(1, ~26) via 100·(n-3)·gain > 422·rss_u
    "q269_granger_census" -> ((s, d) =>
      graft.metrics.Causal.grangerLag1(
        graft.metrics.Causal.dailyMeanPanel(events(s, d)))),

    // PC-algorithm skeleton to conditioning order 1 on Spearman ranks:
    // rank panel (magnitudes bounded by #days at ANY corpus scale, which
    // is what keeps the four-C-product partial-correlation test inside
    // DECIMAL(38,0)/HUGEINT), all-pairs cross-moments once, τ = 0.25
    // (τ² = 625 bp) for both the marginal and order-1 tests
    "q270_pc_skeleton" -> ((s, d) =>
      graft.metrics.Causal.pcSkeleton(
        graft.metrics.Causal.dailyMeanPanel(events(s, d)))),

    // planted-structure recovery capstone: synthesize a 4-series panel
    // with known lag-1 edges s1→s2→s4 (s1 = the 'view' daily means,
    // descendants = lagged parent + small deterministic hash noise, s3 =
    // pure hash noise), run the SAME q269 Granger contract on it, and
    // score the recovered graph with the R7-R9 metrics operators
    // (confusion, TPR/FDR, SHD) against the planted truth — generation,
    // discovery, and scoring composed end-to-end
    "q271_granger_recovery" -> ((s, d) => {
      import s.implicits._
      val panel = graft.metrics.Causal.dailyMeanPanel(events(s, d))
      // 30-row single-partition window: the base series is one panel row
      // per day, deliberately driver-scale
      val w = Window.orderBy("day")
      val bi = panel.where(col("series") === "view")
        .select(col("day"), col("v"), row_number().over(w).as("i"),
          lag("v", 1).over(w).as("bl"), lag("v", 2).over(w).as("bl2"))
        .where(col("i") >= 3)
      val synth = bi.select(lit("s1").as("series"), col("day"), col("v"))
        .unionByName(bi.select(lit("s2").as("series"), col("day"),
          expr("bl + ((bigint(i) * 2654435761) % 1001)").as("v")))
        .unionByName(bi.select(lit("s3").as("series"), col("day"),
          expr("(bigint(i) * 2246822519) % 100000").as("v")))
        .unionByName(bi.select(lit("s4").as("series"), col("day"),
          expr("bl2 + ((bigint(i - 1) * 2654435761) % 1001)" +
            " + ((bigint(i) * 1779033703) % 1001)").as("v")))
      val g = graft.metrics.Causal.grangerLag1(synth)
      val pred = g.where(col("granger") === 1)
        .select(lit("panel").as("graphId"), col("cause").as("source"),
          col("effect").as("target"), lit(1).as("lag"))
      val truth = Seq(("panel", "s1", "s2", 1), ("panel", "s2", "s4", 1))
        .toDF("graphId", "source", "target", "lag")
      val total = Seq(("panel", 12L)).toDF("graphId", "total")
      val conf = graft.metrics.Metrics.tprFdr(
        graft.metrics.Metrics.confusion(truth, pred, total))
      val shd = graft.metrics.Metrics.shdXor(truth, pred)
      conf.join(shd, Seq("graphId"))
        .select(col("graphId").as("graph_id"), col("tp"), col("fp"),
          col("fn"), col("tn"), round(col("tpr"), 6).as("tpr"),
          round(col("fdr"), 6).as("fdr"), col("shd"))
    }),

    // binary-binned lag-1 transfer entropy census: series binned
    // above/below their own integer mean, (y_t, y_{t-1}, x_{t-1}) triple
    // counts, N·TE summed through the shared micro-ln lookup table (the
    // single quantization both engines embed) — the information-theoretic
    // sibling of q269's parametric F-test
    "q272_transfer_entropy" -> ((s, d) =>
      graft.metrics.Causal.transferEntropy(
        graft.metrics.Causal.dailyMeanPanel(events(s, d)))),

    // Benford first-digit audit (data-profiling / fraud-screening
    // primitive): observed first-significant-digit counts of
    // l_extendedprice vs the Benford ppm table (the shared quantized
    // log10(1+1/d) constants), χ² contribution per digit in micro units —
    // (1e6·(obs−e))² div (1e6·e) with e = exp_ppm·N div 1e6 kept as the
    // exact cross-multiplied form. One map-side-combined 9-group
    // aggregation; no shuffle beyond it
    "q273_benford_audit" -> ((s, d) => {
      val obs = lineitem(s, d)
        .select(substring(ExactStats.micro(col("l_extendedprice"))
          .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      val tot = obs.agg(sum("n_obs").as("n"))
      obs.crossJoin(broadcast(tot))
        .withColumn("exp_ppm", expr(BenfordPpmCase))
        .select(col("digit"), col("n_obs"),
          col("exp_ppm").cast("long").as("exp_ppm"),
          expr("""(cast(n_obs as decimal(38,0)) * 1000000 - exp_ppm * n)
                 | * (cast(n_obs as decimal(38,0)) * 1000000 - exp_ppm * n)
                 | div (exp_ppm * n)""".stripMargin).as("chi2_micro"))
    }),

    // PMI collocation census over document bigrams: counts from ONE
    // bigram relation (pair count, left-position count, right-position
    // count, total), the PMI > ln 8 decision cross-multiplied as
    // c_xy·N > 8·c_x·c_y — integers only. The unigram-position tables are
    // vocab-sized and broadcast; the bounded top-50 never sorts the corpus
    "q274_pmi_collocations" -> ((s, d) => {
      val bi = documents(s, d)
        .select(explode(TextOps.shinglesAll(col("text"), 2)).as("pair"))
        .select(expr("split(pair, ' ')[0]").as("x"),
          expr("split(pair, ' ')[1]").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("cxy"))
        .localCheckpoint(false)
      val left = bi.groupBy("x").agg(sum("cxy").as("cx"))
      val right = bi.groupBy("y").agg(sum("cxy").as("cy"))
      val tot = bi.agg(sum("cxy").as("nbi"))
      // no broadcast HINT on the position tables: they are vocab-sized,
      // and above the auto-broadcast threshold the right plan is a
      // token-keyed shuffle join — let size-based planning degrade
      // (the q189 dfreq lesson); at test sf they broadcast anyway
      bi.where(col("cxy") >= 5)
        .join(left, Seq("x"))
        .join(right, Seq("y"))
        .crossJoin(broadcast(tot))
        .withColumn("pmi8", expr(
          "case when cxy * nbi > 8 * cx * cy then 1 else 0 end"))
        .orderBy(col("cxy").desc, col("x"), col("y")).limit(50)
        .select(col("x"), col("y"), col("cxy"), col("cx"), col("cy"),
          col("nbi"), col("pmi8"))
    }),

    // split-conformal interval calibration: 3-way deterministic split on
    // event_id (train fits per-type means, calibration takes the exact
    // ceil(0.9·(n+1))-th smallest |residual| via a per-type ordered
    // window — the standard exact-order-statistic shape, one shuffle by
    // type — and the held-out third audits empirical coverage in ppm)
    "q275_conformal_interval" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"), col("event_id"),
        ExactStats.micro(col("value")).cast("long").as("vm"))
      val mu = ev.where(col("event_id") % 3 === 0)
        .groupBy("event_type")
        .agg(expr("sum(vm) div count(1)").as("mu_micro"))
      val calib = ev.where(col("event_id") % 3 === 1)
        .join(broadcast(mu), Seq("event_type"))
        .withColumn("r", abs(col("vm") - col("mu_micro")))
      val wr = Window.partitionBy("event_type")
        .orderBy(col("r"), col("event_id"))
      val qhat = calib
        .select(col("event_type"), col("r"),
          row_number().over(wr).as("rk"),
          count(lit(1)).over(Window.partitionBy("event_type")).as("nc"))
        .where(col("rk") === expr("(9 * nc + 18) div 10"))
        .select(col("event_type"), col("r").as("qhat_micro"),
          col("nc").as("n_calib"))
      ev.where(col("event_id") % 3 === 2)
        .join(broadcast(mu), Seq("event_type"))
        .join(broadcast(qhat), Seq("event_type"))
        .groupBy(col("event_type"), col("mu_micro"), col("qhat_micro"),
          col("n_calib"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(abs(col("vm") - col("mu_micro")) <= col("qhat_micro"),
            1L).otherwise(0L)).as("n_cover"))
        .select(col("event_type"), col("mu_micro"), col("n_calib"),
          col("qhat_micro"), col("n_test"),
          expr("(n_cover * 1000000) div n_test").as("coverage_ppm"))
    }),

    // Holt double-exponential smoothing: integer recurrence folded inside
    // one higher-order `aggregate` per series (recurrences are sequential
    // per series, parallel across series — no driver loop, no per-step
    // Spark job); the oracle replays it as a recursive CTE
    "q276_holt_smoothing" -> ((s, d) =>
      graft.ops.Smoothing.holt(
        graft.metrics.Causal.dailyMeanPanel(events(s, d)))),

    // STL-lite weekly decomposition: trend = full-window centered 7-day
    // mean, seasonal = day-of-week mean of the detrended residual,
    // remainder census per (series, dow) — two window/aggregate stages,
    // all integer div truncation
    "q277_weekly_decompose" -> ((s, d) => {
      val panel = graft.metrics.Causal.dailyMeanPanel(events(s, d))
      val wt = Window.partitionBy("series").orderBy("day")
        .rowsBetween(-3, 3)
      val detr = panel
        .withColumn("wn", count(lit(1)).over(wt))
        .withColumn("trend", sum(col("v")).over(wt))
        .where(col("wn") === 7)
        .select(col("series"), col("day"),
          (col("v") - expr("trend div 7")).as("dt"))
      val seas = detr.groupBy(col("series"), (col("day") % 7).as("dow"))
        .agg(expr("sum(dt) div count(1)").as("seasonal_milli"),
          count(lit(1)).as("n"))
      val dj = detr.select(col("series").as("dseries"),
        (col("day") % 7).as("ddow"), col("dt"))
      dj.join(broadcast(seas),
          dj("dseries") === seas("series") && dj("ddow") === seas("dow"))
        .groupBy(col("series"), col("dow"), col("seasonal_milli"), col("n"))
        .agg(sum(abs(col("dt") - col("seasonal_milli"))).as("sum_abs_rem"))
    }),

    // iterative proportional fitting (survey raking): the 6-cell
    // (returnflag × linestatus) table raked to the heavy-subset
    // (quantity > 25) row/column margins, TWO full row+column rounds
    // unrolled with ppm integer weights — every factor is
    // (target·1e12) div mass then div 1e6, truncating identically in
    // both engines. Fact rows feed two aggregations; the raking loop
    // itself runs on ≤ |flags|·|statuses| rows, all broadcast
    "q278_ipf_raking" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_returnflag").as("rf"),
        col("l_linestatus").as("ls"), col("l_quantity"))
      val cells = li.groupBy("rf", "ls").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val heavy = li.where(col("l_quantity") > 25)
      val rT = heavy.groupBy("rf").agg(count(lit(1)).as("rt"))
      val cT = heavy.groupBy("ls").agg(count(lit(1)).as("ct"))
      var w = cells.withColumn("w", lit(1000000L))
      (1 to 2).foreach { _ =>
        val rm = w.groupBy("rf").agg(sum(expr("c * w")).as("rm"))
        w = w.join(broadcast(rm), Seq("rf")).join(broadcast(rT), Seq("rf"))
          .withColumn("w",
            expr("(w * ((rt * 1000000000000) div rm)) div 1000000"))
          .select(col("rf"), col("ls"), col("c"), col("w"))
        val cm = w.groupBy("ls").agg(sum(expr("c * w")).as("cm"))
        w = w.join(broadcast(cm), Seq("ls")).join(broadcast(cT), Seq("ls"))
          .withColumn("w",
            expr("(w * ((ct * 1000000000000) div cm)) div 1000000"))
          .select(col("rf"), col("ls"), col("c"), col("w"))
      }
      w.select(col("rf"), col("ls"), col("c"), col("w").as("w_ppm"),
        expr("(c * w) div 1000000").as("fitted"))
    }),

    // Mann-Kendall nonparametric trend test per series: S = Σ_{i<j}
    // sign(v_j − v_i) over the panel's ordered day pairs, tie-corrected
    // variance numerator n(n−1)(2n+5) − Σ t(t−1)(2t+5), and the
    // continuity-corrected z test cross-multiplied at 5%
    // (z² = 3.8416): 180000·max(|S|−1,0)² > 38416·varnum. Pairing is
    // panel-sized (≤ days² per series); fact rows only feed the panel
    "q279_mann_kendall" -> ((s, d) => {
      val p = graft.metrics.Causal.dailyMeanPanel(events(s, d))
        .localCheckpoint(false)
      val a = p.select(col("series"), col("day").as("di"),
        col("v").as("vi"))
      val b = p.select(col("series").as("sb"), col("day").as("dj"),
        col("v").as("vj"))
      val sStat = a.join(broadcast(b),
          col("series") === col("sb") && col("di") < col("dj"))
        .groupBy("series")
        .agg(sum(expr(
          "case when vj > vi then 1 when vj < vi then -1 else 0 end"))
          .as("s_stat"))
      val nS = p.groupBy("series").agg(count(lit(1)).as("n"))
      val ties = p.groupBy("series", "v").agg(count(lit(1)).as("t"))
        .groupBy("series")
        .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
      sStat.join(broadcast(nS), Seq("series"))
        .join(broadcast(ties), Seq("series"))
        .withColumn("varnum",
          expr("n * (n - 1) * (2 * n + 5) - tie_term"))
        .select(col("series"), col("n"), col("s_stat"), col("varnum"),
          expr("""case when 180000 * greatest(abs(s_stat) - 1, 0)
                 |       * greatest(abs(s_stat) - 1, 0)
                 |       > 38416 * varnum
                 |then case when s_stat > 0 then 1 else -1 end
                 |else 0 end""".stripMargin).as("trend"))
    }),

    // exact two-sample Kolmogorov–Smirnov test (click vs error value
    // distributions): D* = max|cumA·nB − cumB·nA| over the distinct-value
    // grid (the value domain is a bounded cent grid, so the cumulative
    // window runs on the ≤49k-row distinct table, not fact rows — at
    // unbounded support this becomes the standard two-level bucketed
    // prefix sum), rejection cross-multiplied at α=0.05
    // (c² = 1.358² → 18442 bp·1e4): 10000·D*² > 18442·nA·nB·(nA+nB)
    "q280_ks_two_sample" -> ((s, d) => {
      val ev = events(s, d)
        .where(col("event_type").isin("click", "error"))
        .select(col("event_type"),
          ExactStats.micro(col("value")).cast("long").as("vm"))
      val byv = ev.groupBy("vm").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("a_v"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("b_v"))
      val wv = Window.orderBy("vm")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = byv.select(col("vm"), sum("a_v").over(wv).as("ca"),
        sum("b_v").over(wv).as("cb"))
      val tot = ev.agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("na"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("nb"))
      cum.crossJoin(broadcast(tot))
        .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
          max(abs(col("ca") * col("nb") - col("cb") * col("na")))
            .as("d_star"))
        .select(col("na"), col("nb"), col("d_star"),
          expr("""case when 10000 * cast(d_star as decimal(38,0)) * d_star
                 |       > 18442 * cast(na as decimal(38,0)) * nb * (na + nb)
                 |then 1 else 0 end""".stripMargin).as("reject"))
    }),

    // LATERAL correlated subquery (SQL-surface parity): top-2 orders per
    // order priority via one ANSI text both engines run — the correlated
    // ORDER BY … LIMIT pushes the per-group bound into the subquery
    // instead of ranking the whole fact table
    "q281_lateral_topn" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders_lat_v")
      s.sql(LateralTopnSql("orders_lat_v"))
    }),

    // binary-segmentation changepoint (one split) per series: candidate
    // costs from prefix sums only — SSE·n = n·Σv² − (Σv)² needs no mean —
    // quantized at one declared div per segment, argmin by (cost, index)
    // via an ordered window over the ≤#days candidate rows. The q89 CUSUM
    // flags drift; this one LOCATES the break with an exact two-segment
    // least-squares criterion
    "q282_binseg_changepoint" -> ((s, d) => {
      val p = graft.metrics.Causal.dailyMeanPanel(events(s, d))
      val w = Window.partitionBy("series").orderBy("day")
      val pre = p.select(col("series"), col("day"), col("v"),
        row_number().over(w).as("i"),
        sum("v").over(w).as("cs"),
        sum(expr("v * v")).over(w).as("cs2"))
      val tot = p.groupBy("series").agg(count(lit(1)).as("n"),
        sum("v").as("st"), sum(expr("v * v")).as("qt"))
      val cand = pre.join(broadcast(tot), Seq("series"))
        .where(col("i") >= 2 && col("i") <= col("n") - 2)
        .withColumn("cost_micro", expr(
          """((cast(i as decimal(38,0)) * cs2 - cast(cs as decimal(38,0)) * cs)
            |   * 1000000 div i)
            | + ((cast(n - i as decimal(38,0)) * (qt - cs2)
            |     - cast(st - cs as decimal(38,0)) * (st - cs))
            |   * 1000000 div (n - i))""".stripMargin))
        .withColumn("total_micro", expr(
          """(cast(n as decimal(38,0)) * qt - cast(st as decimal(38,0)) * st)
            | * 1000000 div n""".stripMargin))
      val wb = Window.partitionBy("series")
        .orderBy(col("cost_micro"), col("i"))
      cand.withColumn("rk", row_number().over(wb))
        .where(col("rk") === 1)
        .select(col("series"), col("n"), col("day").as("split_day"),
          col("cost_micro"), col("total_micro"),
          (col("total_micro") - col("cost_micro")).as("gain_micro"))
    }),

    // single-bin DFT power (Goertzel-style) at the weekly and 5-day
    // periods: re/im are integer dot products of the panel against the
    // shared quantized cos/sin tables (one Scala constant rendered into
    // both engines), power = (re² + im²) div 1e12 — a periodicity
    // detector with zero floating point
    "q283_periodogram" -> ((s, d) => {
      val p = graft.metrics.Causal.dailyMeanPanel(events(s, d))
        .localCheckpoint(false)
      def band(period: Int) = p.groupBy("series")
        .agg(sum(expr(s"v * (${trigCase("cos", period)})")).as("re_u"),
          sum(expr(s"v * (${trigCase("sin", period)})")).as("im_u"))
        .select(col("series"), lit(period).as("period"),
          col("re_u").as("re"), col("im_u").as("im"),
          expr("""(cast(re_u as decimal(38,0)) * re_u
                 | + cast(im_u as decimal(38,0)) * im_u)
                 | div 1000000000000""".stripMargin).as("power"))
      band(7).unionByName(band(5))
    }),

    // multi-touch attribution: every purchase credits the user's
    // non-purchase events of the prior 7 days — last-touch (latest
    // (ts, id) wins) and time-decay (half-life 1 day, the shared
    // 2^-age ppm table, per-purchase shares normalized to 1e6). The
    // purchase×prior pairing is a user-keyed equi-join (co-partitioned at
    // scale), per-purchase normalization a purchase-keyed re-join — never
    // a cross product
    "q284_attribution" -> ((s, d) => {
      val ev = events(s, d)
      val purch = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"),
          col("ts").as("pts"))
      val prior = ev.where(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_type").as("channel"),
          col("event_id").as("eid"), col("ts").as("ets"))
      val j = purch.join(prior, Seq("user_id"))
        .where(col("ets") < col("pts")
          && col("pts") - col("ets") <= lit(604800000000000L))
        .withColumn("age_d", expr("(pts - ets) div 86400000000000"))
        .withColumn("w", expr(DecayPpmCase))
        .localCheckpoint(false)
      val last = j.groupBy("pid")
        .agg(max(struct(col("ets"), col("eid"), col("channel")))
          .as("top"))
        .groupBy(col("top.channel").as("channel"))
        .agg(count(lit(1)).as("n_last"))
      val mass = j.groupBy("pid").agg(sum("w").as("m"))
      val decay = j.join(mass, Seq("pid"))
        .groupBy("channel")
        .agg(sum(expr("(w * 1000000) div m")).as("decay_ppm"))
      decay.join(broadcast(last), Seq("channel"), "full_outer")
        .select(col("channel"),
          coalesce(col("n_last"), lit(0L)).as("n_last"),
          coalesce(col("decay_ppm"), lit(0L)).as("decay_ppm"))
    }),

    // Gopher-style repetition quality rules: per document the top-bigram
    // coverage (2·max_count/n_tok) and the repeated-bigram-instance rate,
    // thresholded at 20% / 30%, reported as a keep-matrix census. One
    // doc-grain aggregation over the exploded bigrams; docs with < 2
    // tokens are out of scope by construction
    "q285_repetition_rules" -> ((s, d) => {
      val bi = documents(s, d)
        .select(col("doc_id"),
          explode(TextOps.shinglesAll(col("text"), 2)).as("pair"))
        .groupBy("doc_id", "pair").agg(count(lit(1)).as("cnt"))
      val per = bi.groupBy("doc_id").agg(max("cnt").as("mx"),
        sum("cnt").as("tot"), count(lit(1)).as("npairs"))
        .select(col("doc_id"), (col("tot") + 1).as("n_tok"),
          expr("(2 * mx * 1000000) div (tot + 1)").as("cov_ppm"),
          expr("((tot - npairs) * 1000000) div tot").as("dup_ppm"))
      per.groupBy(
          when(col("cov_ppm") <= 200000, 1).otherwise(0).as("keep_cov"),
          when(col("dup_ppm") <= 300000, 1).otherwise(0).as("keep_dup"))
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tok"))
    }),

    // calibration reliability table (ECE ingredients) for the q231 linear
    // quality classifier against the lang='en' label: margins bucketed
    // into 21 clamped bins, confidence from the shared quantized logistic
    // table, accuracy as exact ppm, per-bin |acc − conf|·n contribution.
    // One doc-grain pass then a 21-group aggregate
    "q286_calibration_ece" -> ((s, d) => {
      val m = TextOps.linearQualityMargin(documents(s, d))
        .select(col("margin"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      m.select(expr("greatest(least(margin div 200, 10), -10)").as("bin"),
          col("pos"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_b"), sum("pos").as("npos"))
        .withColumn("conf_ppm", expr(SigmoidPpmCase))
        .select(col("bin"), col("n_b"),
          col("conf_ppm").cast("long").as("conf_ppm"),
          expr("(npos * 1000000) div n_b").as("acc_ppm"),
          expr("abs((npos * 1000000) div n_b - conf_ppm) * n_b")
            .as("ece_contrib"))
    }),

    // exact tie-aware ROC AUC for the same classifier/label: the
    // Mann-Whitney U from average ranks kept integer by working in 2·rank
    // units — tied group spanning ranks (c, c+t] contributes
    // p_g·(2c + t + 1) — then AUC·1e6 = (2U − n_p(n_p+1))·1e6 div
    // (2·n_p·n_n). The cumulative runs on the distinct-margin grid, not
    // doc rows
    "q287_auc_exact" -> ((s, d) => {
      val m = TextOps.linearQualityMargin(documents(s, d))
        .select(col("margin"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val byv = m.groupBy("margin")
        .agg(count(lit(1)).as("t"), sum("pos").as("p"))
      val wv = Window.orderBy("margin")
        .rowsBetween(Window.unboundedPreceding, -1)
      val grp = byv.select(col("t"), col("p"),
        coalesce(sum("t").over(wv), lit(0L)).as("c"))
      grp.agg(sum("p").as("n_pos"), sum(expr("t - p")).as("n_neg"),
          sum(expr("p * (2 * c + t + 1)")).as("two_sum_rp"))
        .select(col("n_pos"), col("n_neg"),
          expr("two_sum_rp - n_pos * (n_pos + 1)").as("two_u"),
          expr("""((two_sum_rp - n_pos * (n_pos + 1)) * 1000000)
                 | div (2 * n_pos * n_neg)""".stripMargin).as("auc_ppm"))
    }),

    // Neyman-allocation stratified sampling: per-stratum σ via exact
    // integer variance + a float-sqrt CORRECTED to the true integer
    // square root (±1 post-fix, so IEEE rounding can never flip the
    // census), budget 1000 apportioned largest-remainder over N_h·σ_h,
    // then the deterministic fingerprint bottom-k draw per stratum. The
    // only fact-scale stages are the variance pass and the hash-ranked
    // draw (one shuffle each)
    "q288_neyman_sampling" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"), col("event_id"),
        ExactStats.micro(col("value")).cast("long").as("vm"))
      val st = ev.groupBy("event_type")
        .agg(count(lit(1)).as("nh"),
          sum(col("vm").cast("decimal(38,0)")).as("sv"),
          sum((col("vm") * col("vm")).cast("decimal(38,0)")).as("sq"))
        .withColumn("varq",
          expr("(nh * sq - sv * sv) div (cast(nh as decimal(38,0)) * nh)"))
        .withColumn("s0",
          floor(sqrt(col("varq").cast("double"))).cast("long"))
        .withColumn("s_h", expr(
          """case when (s0 + 1) * (s0 + 1) <= varq then s0 + 1
            |when s0 * s0 > varq then s0 - 1 else s0 end""".stripMargin))
        .withColumn("w_h", col("nh") * col("s_h"))
        .localCheckpoint(false)
      val tot = st.agg(sum("w_h").as("w"), count(lit(1)).as("k"))
      val quota = st.crossJoin(broadcast(tot))
        .withColumn("q0", expr("(1000 * w_h) div w"))
        .withColumn("rem", expr("(1000 * w_h) % w"))
      val short = quota.agg((lit(1000L) - sum("q0")).as("left1"))
      val wq = Window.orderBy(col("rem").desc, col("event_type"))
      val alloc = quota.crossJoin(broadcast(short))
        .withColumn("rk", row_number().over(wq))
        .withColumn("alloc",
          col("q0") + when(col("rk") <= col("left1"), 1L).otherwise(0L))
        .select(col("event_type"), col("nh"), col("s_h"), col("w_h"),
          col("alloc"))
      val wd = Window.partitionBy("event_type")
        .orderBy(pmod(TextOps.fingerprint(col("event_id").cast("string")),
          lit(1000000L)), col("event_id"))
      ev.join(broadcast(alloc), Seq("event_type"))
        .withColumn("r", row_number().over(wd))
        .where(col("r") <= col("alloc"))
        .groupBy(col("event_type"), col("nh"), col("s_h"), col("alloc"))
        .agg(count(lit(1)).as("n_drawn"),
          sum("event_id").as("drawn_id_sum"))
    }),

    // streaming drift monitor: a REAL streaming query maintains per-day
    // coarse value histograms (tumbling event-time windows × bins,
    // watermark-bounded state = #days × #bins), then each day's binned
    // CDF is tested against the whole-corpus reference with the q280 KS
    // integer contract — the production "is today's distribution off?"
    // alarm. Reference includes the tested day (the stationary-baseline
    // convention); a trailing split composes the same way
    "q289_stream_drift_monitor" -> ((s, d) => {
      val hist = graft.streaming.StreamAgg.eventsDailyHistogram(s, d,
          50000000L, s"graft_stream_drift_${System.nanoTime()}")
        .localCheckpoint(false)
      val ref = hist.groupBy("bin").agg(sum("n").as("rn"))
      val spine = hist.select("day_start_us").distinct()
        .crossJoin(broadcast(ref))
      val grid = spine.join(hist, Seq("day_start_us", "bin"), "left_outer")
        .na.fill(0L, Seq("n"))
      val wb = Window.partitionBy("day_start_us").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = grid.select(col("day_start_us"),
        sum("n").over(wb).as("cd"), sum("rn").over(wb).as("cr"))
      val nday = hist.groupBy("day_start_us").agg(sum("n").as("nd"))
      val tot = hist.agg(sum("n").as("ntot"))
      cum.join(broadcast(nday), Seq("day_start_us"))
        .crossJoin(broadcast(tot))
        .groupBy(col("day_start_us"), col("nd"), col("ntot"))
        .agg(max(abs(col("cd") * col("ntot") - col("cr") * col("nd")))
          .as("d_star"))
        .select(col("day_start_us"), col("nd"), col("d_star"),
          expr("""case when 10000 * cast(d_star as decimal(38,0)) * d_star
                 |  > 18442 * cast(nd as decimal(38,0)) * ntot * (nd + ntot)
                 |then 1 else 0 end""".stripMargin).as("drift"))
    }),

    // hash-seeded deterministic random walks over the nation trade graph
    // (the DeepWalk/node2vec sampling primitive, derandomized): from
    // every node, 3 steps, next hop = argmin of the shared rolling-hash
    // fingerprint over out-edges, ABSORBING at sinks (a node with no
    // out-edges keeps its position — at sparse sf the supplier side is
    // tiny and every walk would otherwise die). Each step is one
    // frontier ⋈ edge-list join (broadcast here; co-partitioned
    // equi-join at web scale), never a materialized path explosion
    "q290_hash_walks" -> ((s, d) => {
      val edges = nationTradeEdges(s, d)
        .select(col("src"), col("dst")).localCheckpoint(false)
      def step(cur: DataFrame, k: Int): DataFrame = {
        val wk = Window.partitionBy("start").orderBy(col("h"), col("dst"))
        val chosen = cur.join(broadcast(edges),
            cur("cur") === edges("src"))
          .withColumn("h", pmod(TextOps.fingerprint(
            concat_ws("|", lit(k.toString), col("cur"), col("dst"))),
            lit(1000000000L)))
          .withColumn("rk", row_number().over(wk))
          .where(col("rk") === 1)
          .select(col("start"), col("dst").as("nxt"))
        cur.join(chosen, Seq("start"), "left_outer")
          .select(col("start"),
            coalesce(col("nxt"), col("cur")).as("dst"))
      }
      val start = edges.select(col("src").as("start")).distinct()
        .withColumn("cur", col("start"))
      val h1 = step(start, 1).withColumnRenamed("dst", "hop1")
      val h2 = step(h1.select(col("start"), col("hop1").as("cur")), 2)
        .withColumnRenamed("dst", "hop2")
      val h3 = step(
        h1.join(h2, Seq("start")).select(col("start"),
          col("hop2").as("cur")), 3).withColumnRenamed("dst", "hop3")
      h1.join(h2, Seq("start")).join(h3, Seq("start"))
        .select(col("start"), col("hop1"), col("hop2"), col("hop3"))
    }),

    // isotonic regression via the minimax identity — fitted_i =
    // max_{j≤i} min_{k≥i} avg(v[j..k]) — which turns the sequential
    // pool-adjacent-violators algorithm into three relational stages
    // (segment averages from prefix sums, min over k, max over j), all on
    // panel-sized tables (n³/6 segment rows per series). Averages
    // quantized once ((S·1000) div len, micro units); the max-of-min
    // structure keeps the quantized fit monotone by construction
    "q291_isotonic_minimax" -> ((s, d) => {
      val p = graft.metrics.Causal.dailyMeanPanel(events(s, d))
      val w = Window.partitionBy("series").orderBy("day")
      val pre = p.select(col("series"), col("day"), col("v"),
        row_number().over(w).as("i"), sum("v").over(w).as("cs"))
        .localCheckpoint(false)
      val jside = pre.select(col("series"), (col("i") + 1).as("j"),
        col("cs").as("csj1"))
        .unionByName(pre.where(col("i") === 1)
          .select(col("series"), lit(1).as("j"), lit(0L).as("csj1")))
      val seg = jside.join(pre.select(col("series"), col("i").as("k"),
          col("cs").as("csk")), Seq("series"))
        .where(col("j") <= col("k"))
        .select(col("series"), col("j"), col("k"),
          expr("((csk - csj1) * 1000) div (k - j + 1)").as("avg_micro"))
      val spine = pre.select(col("series"), col("i"), col("day"),
        col("v"))
      spine.join(broadcast(seg), Seq("series"))
        .where(col("j") <= col("i") && col("k") >= col("i"))
        .groupBy(col("series"), col("i"), col("day"), col("v"), col("j"))
        .agg(min("avg_micro").as("minv"))
        .groupBy(col("series"), col("day"), col("v"))
        .agg(max("minv").as("fitted_micro"))
    }),

    // Kaplan-Meier survival curve: time from each user's first event to
    // first purchase (right-censored at the corpus horizon), risk sets
    // from one user-grain pass, and the product-limit estimator folded in
    // ppm over the ≤#days distinct event times — the same single-group
    // higher-order fold the Holt entry uses, replayed by the oracle as a
    // recursive CTE. S ← (S·(n_t − d_t)) div n_t at each event time
    "q292_kaplan_meier" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"),
        col("event_type"))
      val horizon = ev.agg(max("day").as("hz"))
      val users = ev.groupBy("user_id")
        .agg(min("day").as("origin"),
          min(when(col("event_type") === "purchase", col("day")))
            .as("pday"))
        .crossJoin(broadcast(horizon))
        .select(
          coalesce(col("pday") - col("origin"),
            col("hz") - col("origin")).as("t"),
          col("pday").isNotNull.cast("int").as("ev"))
      val times = users.groupBy("t")
        .agg(sum("ev").as("d"), count(lit(1)).as("c"))
      val wt = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
      val tot = users.agg(count(lit(1)).as("ntot"))
      val risk = times.crossJoin(broadcast(tot))
        .select(col("t"), col("d"),
          (col("ntot") - coalesce(sum("c").over(wt), lit(0L)))
            .as("n_risk"))
        .where(col("d") > 0)
      risk.agg(sort_array(collect_list(struct(col("t"), col("n_risk"),
          col("d")))).as("arr"))
        .select(explode(expr(
          """aggregate(arr,
            |  named_struct('s', cast(1000000 as bigint),
            |    'curve', cast(array() as array<struct<t:bigint,
            |      n_risk:bigint, d:bigint, s_ppm:bigint>>)),
            |  (st, x) -> named_struct(
            |    's', (st.s * (x.n_risk - x.d)) div x.n_risk,
            |    'curve', concat(st.curve, array(named_struct(
            |      't', x.t, 'n_risk', x.n_risk, 'd', x.d,
            |      's_ppm', (st.s * (x.n_risk - x.d)) div x.n_risk)))),
            |  st -> st.curve)""".stripMargin)).as("r"))
        .select(col("r.t").as("t"), col("r.n_risk").as("n_risk"),
          col("r.d").as("d"), col("r.s_ppm").as("s_ppm"))
    }),

    // difference-in-differences: treatment = user parity, post = second
    // half of the observed span (the q259 midpoint convention), outcome =
    // purchase micro value per user-cell mean; DiD =
    // (m_treat_post − m_treat_pre) − (m_ctl_post − m_ctl_pre), all
    // truncating integer means. One fact pass, a 4-cell pivot
    "q293_diff_in_diff" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("ts"),
        col("event_type"),
        ExactStats.micro(col("value")).cast("long").as("vm"))
      val piv = ev.agg(min("ts").as("mn"), max("ts").as("mx"))
      val cells = ev.where(col("event_type") === "purchase")
        .crossJoin(broadcast(piv))
        .groupBy((col("user_id") % 2).as("treat"),
          (col("ts") * 2 >= col("mn") + col("mx")).cast("int").as("post"))
        .agg(count(lit(1)).as("n"), sum("vm").as("sv"))
        .select(col("treat"), col("post"), col("n"),
          expr("sv div n").as("mean_micro"))
      cells.groupBy()
        .pivot(concat(col("treat"), lit("_"), col("post")),
          Seq("0_0", "0_1", "1_0", "1_1"))
        .agg(max("mean_micro"))
        .select(col("0_0").as("m_ctl_pre"), col("0_1").as("m_ctl_post"),
          col("1_0").as("m_treat_pre"), col("1_1").as("m_treat_post"),
          expr("(`1_1` - `1_0`) - (`0_1` - `0_0`)").as("did_micro"))
    }),

    // the generation→discovery capstone on the reference's OWN equations:
    // generate the A1 4-var lag-2 gaussian config with the kernel, dump
    // it (so DuckDB replays the identical rows), run the q269 Granger
    // contract over the 12 ordered variable pairs at lag 1, and flag each
    // decision against the catalog's declared lag-1 links — the engine
    // produces its benchmark data AND runs the discovery step the
    // benchmark exists to evaluate
    "q294_granger_on_generated" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 5000 && c.nVars == 4 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q294_gen",
        Generate.wideFast(s, Seq(cfg))
          .select(col("t"), col("X1"), col("X2"), col("X3"), col("X4")))
      val panel = (1 to 4).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      graft.metrics.Causal.grangerLag1(panel)
        .withColumn("truth_lag1", expr(GrangerGenTruthCase))
    }),

    // inclusion-dependency discovery (the foreign-key-profiling sibling
    // of the q266 FD audit): for each candidate column pair A ⊆ B?, the
    // distinct-A count and the count of A values absent from B — each
    // candidate is a distinct-reduce then an anti-join on the key, never
    // a row-level comparison. Census over 8 declared candidates, both
    // true FKs and deliberate violations
    "q295_inclusion_deps" -> ((s, d) => {
      def ind(nm: String, a: DataFrame, ca: String, b: DataFrame,
          cb: String): DataFrame = {
        val da = a.select(col(ca).as("v")).distinct()
        val db = b.select(col(cb).as("v")).distinct()
        val miss = da.join(db, Seq("v"), "left_anti")
          .agg(count(lit(1)).as("n_missing"))
        da.agg(count(lit(1)).as("n_distinct"))
          .crossJoin(broadcast(miss))
          .select(lit(nm).as("candidate"), col("n_distinct"),
            col("n_missing"),
            (col("n_missing") === 0).cast("int").as("holds"))
      }
      Seq(
        ind("orders.custkey<customer", orders(s, d), "o_custkey",
          customer(s, d), "c_custkey"),
        ind("customer<orders.custkey", customer(s, d), "c_custkey",
          orders(s, d), "o_custkey"),
        ind("lineitem.partkey<part", lineitem(s, d), "l_partkey",
          part(s, d), "p_partkey"),
        ind("part<lineitem.partkey", part(s, d), "p_partkey",
          lineitem(s, d), "l_partkey"),
        ind("lineitem.suppkey<supplier", lineitem(s, d), "l_suppkey",
          supplier(s, d), "s_suppkey"),
        ind("customer.nationkey<nation", customer(s, d), "c_nationkey",
          nation(s, d), "n_nationkey"),
        ind("nation.regionkey<region", nation(s, d), "n_regionkey",
          region(s, d), "r_regionkey"),
        ind("supplier.suppkey<customer", supplier(s, d), "s_suppkey",
          customer(s, d), "c_custkey")
      ).reduce(_ unionByName _)
    }),

    // sequence-length bucketing padding audit (training-batch
    // efficiency): padding waste when every document pads to the global
    // max vs to its 64-wide length-bucket max — the quantified case for
    // length-bucketed batching. Two aggregate passes over doc token
    // lengths, waste in exact ppm
    "q296_padding_efficiency" -> ((s, d) => {
      val lens = documents(s, d)
        .select(expr("size(split(text, ' '))").cast("long").as("len"))
        .localCheckpoint(false)
      val global = lens.agg(count(lit(1)).as("n_docs"),
          sum("len").as("token_sum"), max("len").as("mx"))
        .select(lit("global_max_pad").as("strategy"), col("n_docs"),
          col("token_sum"),
          (col("n_docs") * col("mx") - col("token_sum"))
            .as("padded_tokens"),
          expr("""((n_docs * mx - token_sum) * 1000000)
                 | div (n_docs * mx)""".stripMargin).as("waste_ppm"))
      val bucketed = lens.groupBy(expr("len div 64").as("b"))
        .agg(count(lit(1)).as("n"), sum("len").as("ts"), max("len").as("mx"))
        .agg(sum("n").as("n_docs"), sum("ts").as("token_sum"),
          sum(expr("n * mx - ts")).as("padded_tokens"),
          sum(expr("n * mx")).as("padded_total"))
        .select(lit("bucket64_pad").as("strategy"), col("n_docs"),
          col("token_sum"), col("padded_tokens"),
          expr("(padded_tokens * 1000000) div padded_total")
            .as("waste_ppm"))
      global.unionByName(bucketed)
    }),

    // GROUP BY ALL (SQL-surface parity): one ANSI text both engines run —
    // the grouping key list is inferred from the non-aggregate select
    // items on each side, pinning that the inference rules agree
    "q297_group_by_all" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders_gba_v")
      s.sql(GroupByAllSql("orders_gba_v"))
    }),

    // physical-layout sortedness / RLE-friendliness audit: for each
    // audited lineitem column, adjacency within the (l_orderkey,
    // l_linenumber) layout order — nondecreasing-pair fraction (sort
    // pushdown / min-max pruning quality) and value-change runs (RLE
    // compressibility). Windows partition by orderkey (never a global
    // sort); cross-order boundaries are out of the contract
    "q298_sortedness_audit" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_orderkey"),
        col("l_linenumber"),
        ExactStats.micro(col("l_quantity")).cast("long").as("qty"),
        col("l_shipdate").as("ship"), col("l_partkey"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // the layout order needs a total tie-break or the adjacency census
      // is run-dependent; exact-duplicate rows are interchangeable
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_linenumber"), col("l_partkey"), col("qty"),
          col("ship"))
      def audit(nm: String, c: String): DataFrame =
        li.select(col(c).as("v"), lag(c, 1).over(w).as("p"))
          .where(col("p").isNotNull)
          .agg(lit(nm).as("col_name"), count(lit(1)).as("n_pairs"),
            sum(when(col("v") >= col("p"), 1L).otherwise(0L))
              .as("nondec"),
            sum(when(col("v") =!= col("p"), 1L).otherwise(0L))
              .as("changes"))
          .select(col("col_name"), col("n_pairs"),
            expr("(nondec * 1000000) div n_pairs").as("sorted_ppm"),
            (col("changes") + 1).as("runs_upper"))
      audit("l_shipdate", "ship")
        .unionByName(audit("l_quantity", "qty"))
        .unionByName(audit("l_partkey", "l_partkey"))
    }),

    // group-sequential A/B monitoring with O'Brien-Fleming-shaped
    // boundaries: three looks at days 10/20/30 of cumulative purchase
    // value by arm, two-sample z² kept rational —
    // 10000·(S1·n0 − S0·n1)² > bound_bp·(n1+n0)·n1·n0·varq — against the
    // shared boundary table c²·K/k, c = 2.004. The early looks demand
    // ~3× the final evidence, the classic peeking-safe monitor
    "q299_group_sequential" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"),
        col("event_type"),
        ExactStats.micro(col("value")).cast("long").as("vm"))
        .where(col("event_type") === "purchase")
        .localCheckpoint(false)
      val d0 = ev.agg(min("day").as("d0"))
      val looks = (1 to 3).map { k =>
        ev.crossJoin(broadcast(d0))
          .where(col("day") <= col("d0") + (k * 10 - 1))
          .groupBy()
          .agg(
            sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L))
              .as("n0"),
            sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L))
              .as("n1"),
            sum(when(col("user_id") % 2 === 0, col("vm"))
              .otherwise(0L)).cast("decimal(38,0)").as("s0"),
            sum(when(col("user_id") % 2 === 1, col("vm"))
              .otherwise(0L)).cast("decimal(38,0)").as("s1"),
            count(lit(1)).as("n"),
            sum(col("vm").cast("decimal(38,0)")).as("sv"),
            sum((col("vm") * col("vm")).cast("decimal(38,0)"))
              .as("sq"))
          .select(lit(k).as("look"), col("n0"), col("n1"),
            expr("s1 * n0 - s0 * n1").cast("decimal(38,0)")
              .as("diff_num"),
            expr("(n * sq - sv * sv) div (cast(n as decimal(38,0)) * n)")
              .as("varq"),
            lit(ObfBoundBp(k - 1)).as("bound_bp"))
          .select(col("look"), col("n0"), col("n1"),
            col("diff_num").cast("long").as("diff_num"),
            col("varq").cast("long").as("varq"), col("bound_bp"),
            expr("""case when n0 > 0 and n1 > 0 and varq > 0 and
                   |  10000 * diff_num * diff_num >
                   |  bound_bp * cast(n0 + n1 as decimal(38,0))
                   |    * n0 * n1 * varq
                   |then 1 else 0 end""".stripMargin).as("reject"))
      }
      looks.reduce(_ unionByName _)
    }),

    // PC skeleton on the engine's own generated data (the q294 sibling
    // for UNDIRECTED structure): generate the A1 4-var lag-2 config,
    // keep the first 200 observations (Spearman rank magnitudes must
    // keep the four-C-product partial-correlation test inside
    // HUGEINT/DECIMAL(38) — n⁴-scaled cross-moments cap the window),
    // run the q270 skeleton, flag each unordered pair against the
    // catalog's any-lag adjacency
    "q300_pc_on_generated" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 500 && c.nVars == 4 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q300_gen",
        Generate.wideFast(s, Seq(cfg)).where(col("t") < 200)
          .select(col("t"), col("X1"), col("X2"), col("X3"), col("X4")))
      val panel = (1 to 4).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      graft.metrics.Causal.pcSkeleton(panel)
        .withColumn("truth_adj", expr(PcGenTruthCase))
    }),

    // Dickey-Fuller unit-root audit per series (the stationarity
    // precondition every test in the causal suite assumes): regress
    // Δv_t on v_{t-1} via centered cross-moments, reject the unit root
    // when the slope is negative and the cross-multiplied τ² clears the
    // intercept-model 5% critical value 2.96² —
    // 100·(n−2)·Cxy² > 876·(Cxx·Cyy − Cxy²)
    "q301_unit_root" -> ((s, d) => {
      val p = graft.metrics.Causal.dailyMeanPanel(events(s, d))
      val w = Window.partitionBy("series").orderBy("day")
      val dl = p.select(col("series"), col("v"),
          lag("v", 1).over(w).as("pv"))
        .where(col("pv").isNotNull)
        .select(col("series"), col("pv").as("x"),
          (col("v") - col("pv")).as("y"))
      dl.groupBy("series").agg(
          count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
          sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
        .withColumn("cxx", expr("n*sxx - sx*sx"))
        .withColumn("cxy", expr("n*sxy - sx*sy"))
        .withColumn("cyy", expr("n*syy - sy*sy"))
        .select(col("series"), col("n").cast("long").as("n"),
          col("cxx").cast("long").as("cxx"),
          col("cxy").cast("long").as("cxy"),
          expr("""case when cxy < 0 and
                 |  100 * (n - 2) * cxy * cxy >
                 |  876 * (cxx * cyy - cxy * cxy)
                 |then 1 else 0 end""".stripMargin).as("stationary"))
    }),

    // lead-lag cross-correlation census (the exploratory sibling of the
    // q269 test): for every ordered pair and displacement L ∈ 0..3,
    // corr²(a_{t−L}, b_t) in basis points from centered cross-moments,
    // with the argmax displacement flagged per pair — "who leads whom,
    // by how many days". Four shifted panel joins, all broadcast
    "q302_lead_lag_ccf" -> ((s, d) => {
      val p = graft.metrics.Causal.dailyMeanPanel(events(s, d))
        .localCheckpoint(false)
      val lagged = (0 to 3).map { l =>
        val a = p.select(col("series").as("cause"),
          (col("day") + l).as("day"), col("v").as("av"))
        val b = p.select(col("series").as("effect"), col("day"),
          col("v").as("bv"))
        b.join(broadcast(a), Seq("day"))
          .where(col("cause") =!= col("effect"))
          .select(col("cause"), col("effect"), lit(l).as("lag_d"),
            col("av"), col("bv"))
      }.reduce(_ unionByName _)
      val sums = lagged.groupBy("cause", "effect", "lag_d").agg(
          count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("av").cast("decimal(38,0)")).as("sa"),
          sum(col("bv").cast("decimal(38,0)")).as("sb"),
          sum((col("av") * col("av")).cast("decimal(38,0)")).as("saa"),
          sum((col("av") * col("bv")).cast("decimal(38,0)")).as("sab"),
          sum((col("bv") * col("bv")).cast("decimal(38,0)")).as("sbb"))
        .withColumn("caa", expr("n*saa - sa*sa"))
        .withColumn("cab", expr("n*sab - sa*sb"))
        .withColumn("cbb", expr("n*sbb - sb*sb"))
        .select(col("cause"), col("effect"), col("lag_d"),
          col("n").cast("long").as("n"),
          expr("""case when caa = 0 or cbb = 0 then 0
                 |else (cab * cab * 10000) div (caa * cbb) end"""
            .stripMargin).as("corr_bp"),
          expr("case when cab < 0 then -1 else 1 end").as("sign"))
      val wb = Window.partitionBy("cause", "effect")
        .orderBy(col("corr_bp").desc, col("lag_d"))
      sums.withColumn("is_best",
        (row_number().over(wb) === 1).cast("int"))
    }),

    // EWMA control chart (λ = 0.2, 3σ limits): z_t = (20·v + 80·z_{t−1})
    // div 100 folded per series with the curve accumulated in-state (the
    // q292 array-fold pattern); with λ = 0.2 the 3σ_z breach test
    // simplifies EXACTLY to (z − μ)² > varq since 9·λ/(2−λ) = 1 — one
    // more division-free decision. Output per (series, day)
    "q303_ewma_chart" -> ((s, d) => {
      val p = graft.metrics.Causal.dailyMeanPanel(events(s, d))
        .localCheckpoint(false)
      val stats = p.groupBy("series").agg(
          count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("v").cast("decimal(38,0)")).as("sv"),
          sum((col("v") * col("v")).cast("decimal(38,0)")).as("sq"))
        .select(col("series"), expr("sv div n").cast("long").as("mu"),
          expr("(n*sq - sv*sv) div (n*n)").cast("long").as("varq"))
      val curve = p.groupBy("series")
        .agg(sort_array(collect_list(struct(col("day"), col("v"))))
          .as("arr"))
        .select(col("series"), explode(expr(
          """aggregate(
            |  slice(arr, 2, size(arr) - 1),
            |  named_struct('z', arr[0].v,
            |    'curve', array(named_struct('day', arr[0].day,
            |      'z', arr[0].v))),
            |  (st, x) -> named_struct(
            |    'z', (20 * x.v + 80 * st.z) div 100,
            |    'curve', concat(st.curve, array(named_struct(
            |      'day', x.day, 'z', (20 * x.v + 80 * st.z) div 100)))),
            |  st -> st.curve)""".stripMargin)).as("r"))
        .select(col("series"), col("r.day").as("day"),
          col("r.z").as("z_milli"))
      curve.join(broadcast(stats), Seq("series"))
        .select(col("series"), col("day"), col("z_milli"),
          expr("""case when (z_milli - mu) * (z_milli - mu) > varq
                 |then 1 else 0 end""".stripMargin).as("breach"))
    }),

    // PNG tEXt metadata extraction over REAL binary media: each document
    // becomes a genuine PNG (JDK codec) with spec-correct tEXt chunks
    // spliced after IHDR (CRC32-stamped); the pipeline walks the chunk
    // stream back (CRC-VERIFYING every chunk), decodes the raster through
    // the same codec (the splice must not break it), and reports a census
    // by extracted source key — which the codec-free oracle re-derives
    // relationally from the documents table alone
    "q304_png_metadata" -> ((s, d) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val rows = documents(s, d)
        .select(col("doc_id").cast("long"), col("source"), col("lang"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, src, lang) =>
          val w = 16 + (id % 16).toInt
          val h = 12 + (id % 8).toInt
          val png = Multimodal.injectPngText(
            Multimodal.encodePng(w, h, Multimodal.synthRaster(id, w, h)),
            Seq("src" -> src, "lang" -> lang))
          val meta = Multimodal.extractPngText(png).toMap
          val dec = Multimodal.decodeImage(png)
          (meta("src"), meta("lang"), id,
            dec.width.toLong * dec.height)
        })
        .toDF("src", "lang", "doc_id", "n_pixels")
      rows.groupBy("src")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"),
          sum("n_pixels").as("pixel_sum"),
          count_distinct(col("lang")).as("n_langs"))
    }),

    // moving-block bootstrap (autocorrelation-respecting uncertainty for
    // the mean): 20 hash-seeded replicates × 6 length-5 blocks per
    // series, replicate means in milli, bootstrap variance
    // (R·Σm² − (Σm)²) div R² — the resampling plan is a 120-row spine
    // joined to the panel on index ranges, deterministic end to end
    "q305_block_bootstrap" -> ((s, d) => {
      import s.implicits._
      val p = graft.metrics.Causal.dailyMeanPanel(events(s, d))
      val w = Window.partitionBy("series").orderBy("day")
      val ix = p.select(col("series"), col("v"),
        row_number().over(w).as("i")).localCheckpoint(false)
      val nBlocks = 26 // n - L + 1 with n = 30, L = 5
      val spine = (for { r <- 1 to 20; j <- 0 until 6 } yield
        (r, j, 1 + (((r * 31 + j).toLong * 2654435761L) % nBlocks).toInt))
        .toDF("rep", "slot", "start")
      val picked = ix.join(broadcast(spine),
          ix("i") >= spine("start") && ix("i") <= spine("start") + 4)
        .groupBy("series", "rep")
        .agg(expr("sum(v) div 30").as("m"))
      picked.groupBy("series")
        .agg(count(lit(1)).as("n_reps"),
          sum(col("m").cast("decimal(38,0)")).as("sm"),
          sum((col("m") * col("m")).cast("decimal(38,0)")).as("smm"))
        .select(col("series"), col("n_reps"),
          expr("sm div n_reps").cast("long").as("boot_mean_milli"),
          expr("(n_reps*smm - sm*sm) div (cast(n_reps as decimal(38,0)) * n_reps)")
            .cast("long").as("boot_var"))
    }),

    // exact average precision (PR-AUC companion to q287's ROC AUC) with
    // the pessimistic tie contract: descending margin groups processed
    // atomically, precision evaluated AFTER each whole group —
    // AP·1e6 = Σ_g p_g·(cumP·1e6 div cumT) div n_p. Cumulative on the
    // distinct-margin grid, never doc rows
    "q307_average_precision" -> ((s, d) => {
      val m = TextOps.linearQualityMargin(documents(s, d))
        .select(col("margin"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val byv = m.groupBy("margin")
        .agg(count(lit(1)).as("t"), sum("pos").as("p"))
      val wv = Window.orderBy(col("margin").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byv.select(col("p"),
          sum("p").over(wv).as("cp"), sum("t").over(wv).as("ct"))
        .agg(sum("p").as("n_pos"),
          sum(expr("p * ((cp * 1000000) div ct)")).as("ap_num"))
        .select(col("n_pos"),
          expr("ap_num div n_pos").as("ap_ppm"))
    }),

    // Brier score with the Murphy decomposition over the q286 reliability
    // bins: direct Brier from the 0/1 labels, reliability Σn_b(conf−acc)²,
    // resolution Σn_b(acc−base)², uncertainty base·(1e6−base) — all in
    // ppm² integers with one declared div N each, plus the decomposition
    // residual (pure quantization, pinned)
    "q308_brier_decomposition" -> ((s, d) => {
      val m = TextOps.linearQualityMargin(documents(s, d))
        .select(col("margin"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val bins = m.select(
          expr("greatest(least(margin div 200, 10), -10)").as("bin"),
          col("pos"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_b"), sum("pos").as("p_b"))
        .withColumn("conf", expr(SigmoidPpmCase))
        .withColumn("acc", expr("(p_b * 1000000) div n_b"))
      val tot = bins.agg(sum("n_b").as("n"), sum("p_b").as("np"))
        .select(col("n"), expr("(np * 1000000) div n").as("base"))
      bins.crossJoin(broadcast(tot))
        .agg(max("n").as("n"), max("base").as("base_ppm"),
          sum(expr("""p_b * cast(conf - 1000000 as decimal(38,0))
                     |  * (conf - 1000000)
                     |+ (n_b - p_b) * cast(conf as decimal(38,0)) * conf"""
            .stripMargin)).as("brier_num"),
          sum(expr("n_b * cast(conf - acc as decimal(38,0)) * (conf - acc)"))
            .as("rel_num"),
          sum(expr("n_b * cast(acc - base as decimal(38,0)) * (acc - base)"))
            .as("res_num"))
        .select(col("n"), col("base_ppm"),
          expr("brier_num div n").cast("long").as("brier_pm2"),
          expr("rel_num div n").cast("long").as("rel_pm2"),
          expr("res_num div n").cast("long").as("res_pm2"),
          expr("base_ppm * (1000000 - base_ppm)").as("unc_pm2"),
          expr("""(brier_num div n) - ((rel_num div n)
                 | - (res_num div n) + base_ppm * (1000000 - base_ppm))"""
            .stripMargin).cast("long").as("quant_residual"))
    }),

    // embedding-outlier curation census: distance² of every vector to
    // its label centroid as exact integers — per-dim deviation n·m − S
    // (scaled by n, no truncated mean), normalized once by n² — then a
    // per-label 2σ outlier flag, cross-multiplied. One posexplode pass,
    // 640-row centroid table broadcast; the ANN/dedup stack's "drop the
    // mislabeled tail before training" companion
    "q309_embedding_outliers" -> ((s, d) => {
      val vecs = embeddings(s, d).select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("vec_id"), col("label"), col("dim"),
          floor(col("x") * 1e6).cast("long").as("m"))
      val cent = vecs.groupBy("label", "dim")
        .agg(count(lit(1)).as("n"), sum("m").as("sm"))
      val d2 = vecs.join(broadcast(cent), Seq("label", "dim"))
        .groupBy(col("vec_id"), col("label"), col("n"))
        .agg(sum(expr(
          "cast(n * m - sm as decimal(38,0)) * (n * m - sm)")).as("ss"))
        .select(col("vec_id"), col("label"),
          expr("ss div (cast(n as decimal(38,0)) * n)").as("d2"))
      // the variance of d2 lives in d2² units (~1e21, past BIGINT — and
      // past `div`'s long result, which would silently wrap) — so never
      // materialize it: take σ = isqrt(num)/nv directly, with the ±1
      // correction done against the exact decimal numerator via
      // s² ≤ num div nv² ⟺ s²·nv² ≤ num, then flag with the LINEAR
      // comparison d2 > μ + 2σ
      val stats = d2.groupBy("label").agg(
          count(lit(1)).as("nv"),
          sum(col("d2").cast("decimal(38,0)")).as("sd"),
          sum(expr("cast(d2 as decimal(38,0)) * d2")).as("sdd"))
        .withColumn("num", expr("nv * sdd - sd * sd"))
        .withColumn("s0",
          floor(sqrt(col("num").cast("double")) / col("nv"))
            .cast("long"))
        .select(col("label"), col("nv"),
          expr("sd div nv").cast("long").as("mu_d2"),
          expr("""case when cast(s0 + 1 as decimal(38,0)) * (s0 + 1)
                 |    * nv * nv <= num then s0 + 1
                 |when cast(s0 as decimal(38,0)) * s0 * nv * nv > num
                 |  then s0 - 1
                 |else s0 end""".stripMargin).cast("long").as("sig_d2"))
      d2.join(broadcast(stats), Seq("label"))
        .groupBy(col("label"), col("nv"), col("mu_d2"), col("sig_d2"))
        .agg(sum(expr(
          "case when d2 > mu_d2 + 2 * sig_d2 then 1 else 0 end"))
          .as("n_outliers"))
        .select(col("label"), col("nv"), col("mu_d2"), col("sig_d2"),
          col("n_outliers"))
    }),

    // SAX series similarity (symbolic aggregate approximation, Lin et
    // al.): each series' daily means discretized into 8 per-series
    // min-max symbols, concatenated in day order, and every unordered
    // pair scored with the BUILTIN levenshtein both engines share — the
    // classic symbolic-representation route to cheap whole-series
    // similarity. Panel-sized throughout; the 5-row word table
    // broadcasts to its own 10-pair self-join
    "q311_sax_similarity" -> ((s, d) => {
      val p = graft.metrics.Causal.dailyMeanPanel(events(s, d))
      val mm = p.groupBy("series").agg(min("v").as("mn"),
        max("v").as("mx"))
      val words = p.join(broadcast(mm), Seq("series"))
        .select(col("series"), col("day"),
          expr("char(97 + (((v - mn) * 8) div (mx - mn + 1)))")
            .as("sym"))
        .groupBy("series")
        .agg(expr(
          """array_join(transform(
            |  sort_array(collect_list(struct(day, sym))),
            |  x -> x.sym), '')""".stripMargin).as("word"))
        .localCheckpoint(false)
      val a = words.select(col("series").as("a"), col("word").as("wa"))
      val b = words.select(col("series").as("b"), col("word").as("wb"))
      a.join(broadcast(b), col("a") < col("b"))
        .select(col("a"), col("b"),
          length(col("wa")).cast("long").as("len_a"),
          levenshtein(col("wa"), col("wb")).cast("long").as("dist"),
          expr("(cast(levenshtein(wa, wb) as bigint) * 1000000)"
            + " div greatest(length(wa), length(wb))").as("dist_ppm"))
    }),

    // S4 inverse at corpus scale: parse every shipped structure txt back
    // into normalized causal links with the Sinks line parser (the
    // reference's own downstream consumers read these files back,
    // a1.py:297-306 grammar), then census links by (func, lag) — count,
    // exact coef micro-sum, distinct endpoints. One recursive listing of
    // 1,188 small files, line-parallel parsing, a ~20-row aggregate; the
    // oracle re-parses the same tree in DuckDB with the same anchored
    // grammars
    "q312_structure_parse_census" -> ((s, d) => {
      import s.implicits._
      val lines = s.read
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.txt")
        .text("/root/reference/Datasets")
        .where(!input_file_name().like("%_statistics.txt"))
        .select(col("value")).as[String]
      lines.flatMap(graft.generate.Sinks.parseLinkLine _)
        .toDF("source", "lag", "target", "func", "coef")
        .groupBy(col("func"), col("lag").cast("long").as("lag"))
        .agg(count(lit(1)).as("n_links"),
          sum(floor(col("coef") * 1e6 + 0.5).cast("long"))
            .as("sum_coef_micro"),
          countDistinct("source").as("n_sources"),
          countDistinct("target").as("n_targets"))
    }),

    // confounded generation→discovery capstone: A1C 4-var lag-2 WITH the
    // confounder U observed as a fifth panel series. The q269 Granger
    // contract over the 20 ordered pairs; truth_lag1 declares only the
    // catalog's X lag-1 edges (U's edges are contemporaneous), so the
    // U rows surface exactly the confounder-induced flags the benchmark
    // family exists to create
    "q313_granger_confounded" -> ((s, d) => {
      val cfg = Grid.forFamily("A1C").find(c =>
        c.nPoints == 5000 && c.nVars == 4 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q313_gen",
        Generate.wideFast(s, Seq(cfg))
          .select(col("t"), col("X1"), col("X2"), col("X3"), col("X4"),
            col("U")))
      val panel = ((1 to 4).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        :+ gen.select(lit("U").as("series"), col("t").as("day"),
          floor(col("U") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      graft.metrics.Causal.grangerLag1(panel)
        .withColumn("truth_lag1", expr(grangerTruthCase("A1C")))
    }),

    // irregular generation→discovery capstone: A2 4-var lag-2, whose
    // kernel samples on an exponential-gap continuous clock. The lag
    // alignment is the reference's own nearest-lag lookup
    // (a2.py:162-167): for row i, the past index nearest to
    // time_i − meanDiff — Lagged.nearestLagIndexView (union + one sort +
    // two carries, the AsOf shape). Both regressors take the nearest-lag
    // index (the generator's semantics); the Granger sums/decision tail
    // is shared verbatim with q294/q269
    "q314_granger_irregular" -> ((s, d) => {
      val cfg = Grid.forFamily("A2").find(c =>
        c.nPoints == 5000 && c.nVars == 4 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q314_gen",
        Generate.wideFast(s, Seq(cfg))
          .select(col("t"), col("time"), col("X1"), col("X2"), col("X3"),
            col("X4")))
      // snap the alignment: without this the union+sort lineage re-runs
      // once per downstream join stage (profiled at 3.8 s vs 0.5 s)
      val lx = graft.ops.Lagged.nearestLagIndexView(
        gen.select(col("t"), col("time")), "t", "time")
        .localCheckpoint(false)
      val pan = (1 to 4).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _).localCheckpoint(false)
      val e = pan.select(col("series").as("effect"), col("t"),
        col("v").as("yv"))
      val ep = pan.select(col("series").as("effect"),
        col("t").as("lag_idx"), col("v").as("pv"))
      val cp = pan.select(col("series").as("cause"),
        col("t").as("lag_idx"), col("v").as("qv"))
      val lagged = lx.join(broadcast(e), Seq("t"))
        .join(broadcast(ep), Seq("effect", "lag_idx"))
        .join(broadcast(cp), Seq("lag_idx"))
        .where(col("cause") =!= col("effect"))
        .select(col("cause"), col("effect"), col("yv"), col("pv"),
          col("qv"))
      graft.metrics.Causal.grangerDecide(
          graft.metrics.Causal.grangerSumsFromLagged(lagged), 422L)
        .withColumn("truth_lag1", expr(grangerTruthCase("A2")))
    }),

    // R7-R10 at PANEL scale: 1,200 deterministically perturbed predicted
    // graphs (drop by (g+3·idx)%5, reverse by (g+idx)%7, spurious
    // self-loop by (g+idx)%11 — pure integer arithmetic both engines run)
    // scored against the A1 4-var lag-2 truth in ONE pair-level join pass
    // via Metrics.scoreAll: tp/fp/fn/tn, XOR-SHD and orientation-aware
    // structural SHD all from a single full-outer join whose sides
    // pre-collapse on the exact join key. The ARCHITECTURE "a million
    // graphs is one shuffle" claim, oracled; PlanSpec pins the shape
    "q315_shd_panel_scale" -> ((s, d) => {
      val (truth, pred) = graft.metrics.Metrics.perturbedGraphs(
        s, 1200L, ShdPanelEdges)
      graft.metrics.Metrics.scoreAll(truth, pred)
        .withColumn("tn",
          lit(ShdPanelTotalCells) - col("tp") - col("fp") - col("fn"))
        .select(col("graphId").as("graph_id"), col("tp"), col("fp"),
          col("fn"), col("tn"), col("shd_xor"), col("shd_structural"))
    }),

    // interpolation-under-mask parity on the MAXIMAL family: a D3C kernel
    // dump (irregular clock + MCAR∪block missing + confounder) regularized
    // onto the 0.5-unit grid with the q71 Resample contract — the X1
    // series interpolates only its UNMASKED observations (missing cells
    // drop out before the as-of brackets), while U (always fully observed,
    // the reference's declared D3C property) interpolates every row.
    // Same two as-of joins, exact integer arithmetic
    "q316_resample_d3c_masked" -> ((s, d) => {
      val cfg = Grid.forFamily("D3C").find(c =>
        c.nPoints == 1000 && c.nVars == 4 && c.maxLag == 2 &&
          c.mixRatio == 0.5 && c.mcarProb == 0.1 && c.blockProb == 0.1).get
      val gen = dumpGen(s, "q316_gen",
        Generate.wideFast(s, Seq(cfg)).select(
          ExactStats.micro(col("time")).cast("long").as("t_us"),
          ExactStats.micro(col("X1")).cast("long").as("x1_micro"),
          ExactStats.micro(col("U")).cast("long").as("u_micro"),
          col("maskBits").bitwiseAND(lit(1)).as("mask1")))
      val samples = gen.where(col("mask1") === 0)
        .select(lit("X1").as("series"), col("t_us"),
          col("x1_micro").as("v_micro"))
        .unionByName(gen.select(lit("U").as("series"), col("t_us"),
          col("u_micro").as("v_micro")))
      val grid = samples.select(col("series")).distinct()
        .select(col("series"),
          explode(expr("sequence(0L, 100000000L, 500000L)")).as("grid_us"))
      graft.ops.Resample.interpolateToGrid(samples, grid,
        Seq("series"), "t_us", "v_micro")
    }),

    // distributed PCA top component over the embedding table, exact
    // integers end-to-end: centered covariance C_ab = n·Σm_a m_b −
    // Σm_a·Σm_b and 6 power iterations with a ppm rescale by max|cw|
    // each round (w stays in [−1e6, 1e6]; BigInteger internally — the
    // same values the oracle's HUGEINT CTEs compute, div truncation
    // included), ALL from ONE CovVec.topComponent typed aggregate: the
    // map-side-combined buffer is the 2,144-slot sufficient-statistics
    // array, the shuffle carries that single row (never vector rows),
    // and the k×k iteration runs in the aggregate's finish — the
    // RowMatrix Gramian pattern, executor-side, one job total
    "q317_pca_power_iteration" -> ((s, d) => {
      pcaComponentRow(s, d)
        .select(posexplode(col("warr")).as(Seq("dim", "w_ppm")))
        .select(col("dim").cast("long").as("dim"), col("w_ppm"))
    }),

    // PCA projection census (the curation use of q317's component:
    // 1-D dimensionality reduction for binning/outlier cuts): every
    // vector's exact integer projection Σ m_d·w_d (micro·ppm units,
    // ≤6.4e13 — well inside LONG), bucketed at 1e11 grain. The component
    // arrives as q317's one-row array (one CovVec.topComponent job),
    // broadcast, and the dot product runs as a per-row `aggregate` lambda
    // over the array column — no explode, no per-vector shuffle; the only
    // exchange left is the tiny bin aggregate
    "q318_pca_projection_census" -> ((s, d) => {
      val warr = pcaComponentRow(s, d)
      embeddings(s, d).crossJoin(broadcast(warr))
        // coalesce per term, NOT on acc: a NULL or missing embedding slot
        // contributes 0 — matching the DuckDB twin's sum() over vm, which
        // skips NULL dims — instead of NULL-poisoning the whole fold. But
        // an ALL-null vector must yield NULL, not 0: SQL sum() over zero
        // non-null terms is NULL, so the fold carries a contributing-term
        // count and the finish lambda nulls p when it is 0
        .select(expr(
          """aggregate(
            |  transform(sequence(0, 63), i ->
            |    floor(element_at(embedding, i + 1) * 1e6) *
            |      element_at(warr, i + 1)),
            |  named_struct('s', 0L, 'c', 0),
            |  (acc, t) -> named_struct(
            |    's', acc.s + coalesce(t, 0L),
            |    'c', acc.c + if(t IS NULL, 0, 1)),
            |  acc -> if(acc.c = 0, cast(NULL AS BIGINT), acc.s))"""
            .stripMargin).as("p"))
        .groupBy(expr("p div 100000000000").as("bin"))
        // per-bin MEAN, not sum: a corpus-scale sum of ~6e13-magnitude
        // projections passes LONG near 100k vectors per bin and Spark's
        // non-ANSI sum would wrap where DuckDB's HUGEINT doesn't —
        // the mean stays ~6e13 at any scale (the daily-means rule)
        .agg(count(lit(1)).as("n_vecs"),
          expr("sum(cast(p as decimal(38,0))) div count(1)")
            .cast("long").as("mean_proj_trunc"),
          min("p").as("min_proj"), max("p").as("max_proj"))
    }),

    // DDSketch-style quantile sketch per order priority: log-bucket keys
    // (bit-length octave + 4-bit mantissa → ≤16 sub-buckets per octave;
    // the lower-bound estimate is within bucket width / value ≤ 1/8
    // RELATIVE error at any magnitude — the skew-proof complement to
    // q102's linear bins, observed ~7% at the gate sf), fully mergeable
    // (the shuffle
    // carries ≤ |groups|·octaves·16 bucket rows no matter the fact
    // count), with the exact value-grain quantile and its error ppm
    // audited inline — the hllWithExact validation pattern
    "q319_ddsketch_quantiles" -> ((s, d) => {
      val ov = orders(s, d).select(col("o_orderpriority").as("pri"),
        cents(col("o_totalprice")).cast("long").as("v"))
      val keyed = ov
        .withColumn("b", expr("length(bin(v))"))
        .withColumn("lb", expr(
          """(v div shiftleft(1L, cast(greatest(b - 4, 0) as int)))
            | * shiftleft(1L, cast(greatest(b - 4, 0) as int))"""
            .stripMargin))
      val sk = keyed.groupBy("pri", "b", "lb")
        .agg(count(lit(1)).as("cnt"))
      val wS = Window.partitionBy("pri").orderBy("b", "lb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wP = Window.partitionBy("pri")
      val est = sk.withColumn("cum", sum("cnt").over(wS))
        .withColumn("total", sum("cnt").over(wP))
        .groupBy("pri")
        .agg(max("total").as("n_rows"),
          count(lit(1)).as("n_buckets"),
          min(when(col("cum") * 100 >= col("total") * 50, col("lb")))
            .as("p50_est"),
          min(when(col("cum") * 100 >= col("total") * 90, col("lb")))
            .as("p90_est"),
          min(when(col("cum") * 100 >= col("total") * 99, col("lb")))
            .as("p99_est"))
      val vg = ov.groupBy("pri", "v").agg(count(lit(1)).as("cnt"))
      val wV = Window.partitionBy("pri").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val exact = vg.withColumn("cum", sum("cnt").over(wV))
        .withColumn("total", sum("cnt").over(wP))
        .groupBy("pri")
        .agg(
          min(when(col("cum") * 100 >= col("total") * 50, col("v")))
            .as("p50_exact"),
          min(when(col("cum") * 100 >= col("total") * 90, col("v")))
            .as("p90_exact"),
          min(when(col("cum") * 100 >= col("total") * 99, col("v")))
            .as("p99_exact"))
      est.join(exact, Seq("pri"))
        .select(col("pri"), col("n_rows"), col("n_buckets"),
          col("p50_est"), col("p50_exact"),
          expr("((p50_exact - p50_est) * 1000000) div p50_exact")
            .as("p50_err_ppm"),
          col("p90_est"), col("p90_exact"),
          expr("((p90_exact - p90_est) * 1000000) div p90_exact")
            .as("p90_err_ppm"),
          col("p99_est"), col("p99_exact"),
          expr("((p99_exact - p99_est) * 1000000) div p99_exact")
            .as("p99_err_ppm"))
    }),

    // Zipf rank-frequency slope audit per source: top-64 tokens (freq
    // desc, token tie-break), x = qlog2(rank), y = qlog2(freq) via the
    // shared quantized-log LUT (q319's octave+mantissa key reused as a
    // logarithm), OLS slope from integer cross-moments — the corpus
    // power-law health check (natural text ≈ −1000 milli; the word-salad
    // synthetic corpus reads shallower). The token count is fact-scale;
    // everything after the top-64 window is 64 rows per source
    "q320_zipf_slope" -> ((s, d) => {
      val tf = documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("f"))
      val w = Window.partitionBy("source")
        .orderBy(col("f").desc, col("tok"))
      val top = tf.withColumn("r", row_number().over(w))
        .where(col("r") <= 64)
        .select(col("source"),
          expr(qlog2Expr("r", isSpark = true)).as("x"),
          expr(qlog2Expr("f", isSpark = true)).as("y"))
      top.groupBy("source").agg(
          count(lit(1)).as("n_top"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
        .select(col("source"), col("n_top"),
          expr("cast(n_top as decimal(38,0)) * sxy - sx * sy")
            .cast("long").as("cxy"),
          expr("cast(n_top as decimal(38,0)) * sxx - sx * sx")
            .cast("long").as("cxx"),
          expr("""((cast(n_top as decimal(38,0)) * sxy - sx * sy) * 1000)
                 | div (cast(n_top as decimal(38,0)) * sxx - sx * sx)"""
            .stripMargin).cast("long").as("slope_milli"))
    }),

    // Theil-Sen robust trend per series (the estimator companion to
    // q279's Mann-Kendall test): every ordered day pair's slope
    // quantized as (Δv·1e6) div Δday, then the exact median of the
    // quantized slopes (lower median — deterministic, no averaging of
    // two middles). Pairing is panel-sized (≤ days² per series, the
    // q279 bound); the median is one row_number window over the pair
    // slopes, never a global sort
    "q321_theil_sen" -> ((s, d) => {
      val p = graft.metrics.Causal.dailyMeanPanel(events(s, d))
        .localCheckpoint(false)
      val a = p.select(col("series"), col("day").as("di"),
        col("v").as("vi"))
      val b = p.select(col("series").as("sb"), col("day").as("dj"),
        col("v").as("vj"))
      val slopes = a.join(broadcast(b),
          col("series") === col("sb") && col("di") < col("dj"))
        .select(col("series"),
          expr("((vj - vi) * 1000000) div (dj - di)").as("sl"))
      val w = Window.partitionBy("series").orderBy("sl")
      slopes
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("series")))
        .where(col("rk") === expr("(n + 1) div 2"))
        .select(col("series"), col("n").as("n_pairs"),
          col("sl").as("median_slope_micro"),
          signum(col("sl")).cast("long").as("trend_sign"))
    }),

    // propensity-score caliper matching (the missing member of the
    // causal-adjustment family beside IPF/Neyman/CUPED/DiD): users
    // collapse to one row (activity score = event count, outcome = mean
    // purchase micro), treatment = user parity; every treated user
    // matches its nearest-score control WITH replacement via the AsOf
    // union-carry (one sort on the score axis, backward/forward struct
    // carries, ties to the lower score then highest uid — all
    // deterministic), caliper 5 drops distant matches; ATT = matched
    // mean difference. User-grain input — fact-scale work is only the
    // first aggregation; at 1e9 users the sort range-partitions on score
    "q322_psm_matching" -> ((s, d) => {
      val users = events(s, d)
        .select(col("user_id"), col("event_type"),
          ExactStats.micro(col("value")).cast("long").as("vm"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("score"),
          coalesce(expr(
            """sum(case when event_type = 'purchase' then vm end)
              | div nullif(sum(case when event_type = 'purchase'
              |   then 1 else 0 end), 0)""".stripMargin), lit(0L))
            .as("out"))
        .select(col("user_id").as("uid"), col("score"), col("out"),
          (col("user_id") % 2).as("treat"))
        .localCheckpoint(false)
      val ctl = users.where(col("treat") === 0)
        .select(col("score").cast("long").as("s"), lit(0).as("kind"),
          col("uid"), col("out"))
      val trt = users.where(col("treat") === 1)
        .select(col("score").cast("long").as("s"), lit(1).as("kind"),
          col("uid"), col("out"))
      val wb = Window.orderBy(col("s"), col("kind"), col("uid"))
        .rowsBetween(Window.unboundedPreceding, 0)
      // reversed growing frame, not unbounded-following (the AsOf O(n²)
      // note): last over the exactly-reversed order picks the same row
      val wf = Window.orderBy(col("s").desc, col("kind").desc,
          col("uid").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val cRow = when(col("kind") === 0,
        struct(col("s").as("cs"), col("uid").as("cuid"),
          col("out").as("cout")))
      val matched = ctl.unionByName(trt)
        .withColumn("_b", last(cRow, ignoreNulls = true).over(wb))
        .withColumn("_f", last(cRow, ignoreNulls = true).over(wf))
        .where(col("kind") === 1)
        .withColumn("pick", when(
          col("_f").isNotNull && (col("_b").isNull ||
            col("_f.cs") - col("s") < col("s") - col("_b.cs")),
          col("_f")).otherwise(col("_b")))
        .where(col("pick").isNotNull &&
          abs(col("pick.cs") - col("s")) <= 5)
      matched.agg(count(lit(1)).as("n_matched"),
          sum("out").as("sum_treated"),
          sum("pick.cout").as("sum_control"))
        .crossJoin(broadcast(
          users.where(col("treat") === 1)
            .agg(count(lit(1)).as("n_treated"))))
        .select(col("n_treated"), col("n_matched"),
          expr("sum_treated div n_matched").as("mean_treated_micro"),
          expr("sum_control div n_matched").as("mean_control_micro"),
          expr("(sum_treated div n_matched) - (sum_control div n_matched)")
            .as("att_micro"))
    }),

    // log-rank test (the two-group comparison beside q292's
    // Kaplan-Meier curve): groups = user parity, time-to-event = first
    // purchase day offset with horizon censoring (the q292 contract).
    // Per event time: at-risk and death counts by group from ONE
    // cumulative window pass, expected deaths and hypergeometric
    // variance in declared ppm quantization (every div truncates
    // identically), χ² decision cross-multiplied at 5% (3.8416):
    // 1e6·(O−E)² > 3841600·V with O−E and V in the same ppm scale
    "q323_log_rank" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"),
        col("event_type"))
      val horizon = ev.agg(max("day").as("hz"))
      val subjects = ev.groupBy("user_id")
        .agg(min("day").as("origin"),
          min(when(col("event_type") === "purchase", col("day")))
            .as("pday"))
        .crossJoin(broadcast(horizon))
        .select((col("user_id") % 2).as("g"),
          coalesce(col("pday") - col("origin"),
            col("hz") - col("origin")).as("t"),
          col("pday").isNotNull.cast("long").as("e"))
      graft.metrics.Causal.logRank(subjects)
    }),

    // right-to-be-forgotten cascade census (the GDPR-deletion audit a
    // pipeline needs before it mutates anything): a deterministic
    // forget-set (key % 97 = 0) propagated through the FK graph
    // customer→orders→lineitem plus the events user axis — per table
    // the row count, the cascade-delete count and its ppm. Each hop is
    // one semi join on the key (the delete-key set broadcasts at any
    // corpus scale: it is customer-grain, not fact-grain)
    "q324_deletion_cascade" -> ((s, d) => {
      val cust = customer(s, d)
      val ord = orders(s, d)
      val li = lineitem(s, d)
      val ev = events(s, d)
      val fc = cust.where(col("c_custkey") % 97 === 0)
        .select(col("c_custkey")).localCheckpoint(false)
      val fo = ord.join(broadcast(fc),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey")).localCheckpoint(false)
      def row(nm: String, total: DataFrame, del: DataFrame): DataFrame =
        total.agg(count(lit(1)).as("n_total"))
          .crossJoin(broadcast(del.agg(count(lit(1)).as("n_delete"))))
          .select(lit(nm).as("table_name"), col("n_total"),
            col("n_delete"),
            expr("(n_delete * 1000000) div n_total").as("delete_ppm"))
      row("customer", cust, fc)
        .unionByName(row("orders", ord, fo))
        .unionByName(row("lineitem", li,
          li.join(broadcast(fo),
            li("l_orderkey") === fo("o_orderkey"), "left_semi")))
        .unionByName(row("events", ev,
          ev.where(col("user_id") % 97 === 0)))
    }),

    // the full consumer loop on the reference's OWN shipped artifacts:
    // S6-scan the shipped D3 *_missing.csv (irregular clock + masked
    // cells), align with the nearest-lag view on the shared spine
    // (q314's operator), run the Granger census, and flag decisions
    // against the truth links PARSED FROM THE SHIPPED structure txt by
    // the S4-inverse parser — file in, file-derived truth out, nothing
    // generated. Masked cells drop out of the panel before pairing
    "q325_granger_on_shipped" -> ((s, d) => {
      val idxed = graft.generate.Sinks.readWideCsv(s,
          s"$ShippedD3Base" + "_missing.csv")
        .withColumn("t",
          (row_number().over(Window.orderBy("time")) - 1).cast("long"))
        .localCheckpoint(false)
      // snapped for the same reason as q314's alignment
      val lx = graft.ops.Lagged.nearestLagIndexView(
        idxed.select(col("t"), col("time")), "t", "time")
        .localCheckpoint(false)
      val pan = (1 to 4).map(i =>
        idxed.where(col(s"X$i").isNotNull)
          .select(lit(s"X$i").as("series"), col("t"),
            floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _).localCheckpoint(false)
      val e = pan.select(col("series").as("effect"), col("t"),
        col("v").as("yv"))
      val ep = pan.select(col("series").as("effect"),
        col("t").as("lag_idx"), col("v").as("pv"))
      val cp = pan.select(col("series").as("cause"),
        col("t").as("lag_idx"), col("v").as("qv"))
      val lagged = lx.join(broadcast(e), Seq("t"))
        .join(broadcast(ep), Seq("effect", "lag_idx"))
        .join(broadcast(cp), Seq("lag_idx"))
        .where(col("cause") =!= col("effect"))
        .select(col("cause"), col("effect"), col("yv"), col("pv"),
          col("qv"))
      graft.metrics.Causal.grangerDecide(
          graft.metrics.Causal.grangerSumsFromLagged(lagged), 422L)
        .withColumn("truth_lag1", expr(ShippedD3TruthCase))
    }),

    // PC skeleton on a SHIPPED missing-data artifact (q325 runs the
    // Granger consumer on this file; the reference's constraint-based
    // consumers run on the same corpus CSVs, 25%+ masked): pairwise-
    // complete Spearman — each series ranks over ITS OWN observed rows
    // and each pair's cross-moments carry their own n, so missingness
    // needs no imputation and no alignment stage. First 200 time
    // indices (q300's rank-moment n⁴ budget); truth_adj = ANY-lag
    // unordered adjacency parsed from the shipped structure txt.
    // Recovers the full 4-edge truth with zero false positives; both
    // non-edges separate at order 1
    "q338_pc_on_shipped" -> ((s, d) =>
      graft.metrics.Causal.pcSkeleton(shippedD3Panel(s))
        .withColumn("truth_adj", expr(ShippedD3AdjCase))),

    // the complete constraint-based consumer on the shipped artifact:
    // q338's pairwise-complete skeleton through the q332 orientation
    // machinery (v-structures from the order-≤1 sepsets + 3 full-Meek
    // rounds), the CPDAG scored orientation-aware — reversals charged —
    // against the DIRECTED truth parsed from the shipped structure txt.
    // This is the reference's end-to-end tetrad-consumer shape
    // (corpus CSV → directed graph → metrics) on real shipped bytes
    "q339_pc_oriented_on_shipped" -> ((s, d) =>
      pcScoreOriented(s,
        // pairwise-complete missing-data panel: a pair that never
        // co-observes inside the window has no moment row, legitimately —
        // pin the documented conservative triple-skip instead of the
        // every-pair-row assertion (which would hard-fail on a data
        // refresh even though the DuckDB oracle silently drops the triple)
        graft.metrics.Causal.pcOrient(
          graft.metrics.Causal.pcSkeleton(shippedD3Panel(s)),
          PcMeekRounds, requirePairRows = false),
        ShippedD3DirectedTruth)),

    // corpus-grain constraint-based discovery capstone: the COMPLETE PC
    // consumer (q338's pairwise-complete Spearman skeleton → q332's
    // v-structures + full-Meek closure) over the whole shipped D3
    // vars4/lag2 cell — 48 configs in ONE glob scan and ONE plan. The
    // config folds into the series AND day keys (q333's fold, extended:
    // cfg-unique days mean cross-config series share no observations,
    // so no cross moment ever forms and one pcSkeleton/pcOrient call
    // carries all 48 disjoint graphs — the pair-row precondition holds
    // per component by construction). First 200 indices per config
    // (q338's rank-moment n⁴ budget — the cell's n5000 members would
    // blow the 10³⁸ product budget unwindowed), milli grain; each
    // config's CPDAG scored orientation-aware against ITS OWN
    // structure-txt truth (any-lag directed X-X edges) via one scoreAll
    // pass. This is the reference's tetrad loop — search per dataset
    // file, metrics per config (py_tetrad_helper.py:51-182,
    // metrics_helper.py:80-138) — as a single distributed job instead
    // of a per-file driver loop: at 100k configs the scan is one
    // parallel read and the panel work stays ≤ p² rows per config
    "q340_pc_corpus_sweep" -> ((s, d) => {
      val pan = shippedD3TreeFoldedPanel(shippedD3TreeIdxed(s))
      // folded pairwise-complete panels pin the conservative triple-skip
      // (q339's rationale, per config): a never-co-observed pair inside
      // some config's 200-obs window is legitimate, not a caller error
      val st = graft.metrics.Causal.pcOrient(
          graft.metrics.Causal.pcSkeleton(pan), PcMeekRounds,
          requirePairRows = false)
        .withColumn("cfg", substring_index(col("a"), "|", 1))
        .localCheckpoint(false)
      def dirEdges(w: Int, src: String, dst: String) =
        st.where(col("dir") === w).select(col("cfg"),
          col(src).as("source"), col(dst).as("target"))
      val pred = dirEdges(1, "a", "b")
        .unionByName(dirEdges(2, "b", "a"))
        .unionByName(dirEdges(0, "a", "b"))
        .unionByName(dirEdges(0, "b", "a"))
        .select(col("cfg").as("graphId"),
          substring_index(col("source"), "|", -1).as("source"),
          substring_index(col("target"), "|", -1).as("target"),
          lit(0).as("lag"))
      import s.implicits._
      val truth = ShippedD3TreeDirectedTruth
        .toDF("graphId", "source", "target").withColumn("lag", lit(0))
      val counts = st.groupBy("cfg")
        .agg(count(lit(1)).as("n_edges"),
          sum(when(col("dir") =!= 0, 1L).otherwise(0L)).as("n_directed"))
      graft.metrics.Metrics.scoreAll(truth, pred)
        .join(broadcast(counts), col("graphId") === col("cfg"),
          "left_outer")
        .select(col("graphId").as("cfg"),
          coalesce(col("n_edges"), lit(0L)).as("n_edges"),
          coalesce(col("n_directed"), lit(0L)).as("n_directed"),
          col("tp"), col("fp"), col("fn"),
          col("shd_structural"), col("shd_xor"),
          expr("case when tp + fn = 0 then 0L " +
            "else (1000 * tp) div (tp + fn) end").as("tpr_permille"),
          expr("case when tp + fp = 0 then 0L " +
            "else (1000 * fp) div (tp + fp) end").as("fdr_permille"))
    }),

    // PC edge SUPPORT via disjoint-block subsampling (q342 asks "is the
    // edge a threshold artifact?"; this asks "is it a sampling
    // artifact?" — together they are the StARS stability pair): the
    // shipped file's FULL 1000 rows split into 5 disjoint 200-obs
    // windows — each inside the rank-moment n⁴ budget that forced
    // q338's single 200-cut — with the block index folded into the
    // series/day keys, so ONE pcSkeleton call decides all 5 windows
    // independently (the q340 fold with time blocks as the graphs).
    // Per unordered pair: in how many of the 5 windows does the edge
    // survive order ≤ 1 — the support count a practitioner reads as
    // edge confidence, with truth_adj alongside
    "q343_pc_edge_support" -> ((s, d) => {
      val idxed = graft.generate.Sinks.readWideCsv(s,
          s"$ShippedD3Base" + "_missing.csv")
        .withColumn("t",
          (row_number().over(Window.orderBy("time")) - 1).cast("long"))
        .withColumn("blk", expr("t div 200"))
        // one CSV read + one global sort for all four series branches
        .localCheckpoint(false)
      val pan = (1 to 4).map(i =>
        idxed.where(col(s"X$i").isNotNull)
          .select(concat(col("blk"), lit(s"|X$i")).as("series"),
            concat(col("blk"), lit("|"),
              lpad((col("t") % 200).cast("string"), 3, "0")).as("day"),
            floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      graft.metrics.Causal.pcSkeleton(pan)
        .groupBy(substring_index(col("a"), "|", -1).as("a"),
          substring_index(col("b"), "|", -1).as("b"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(col("edge")).cast("long").as("support"))
        .withColumn("support_permille",
          expr("(1000 * support) div n_blocks"))
        .withColumn("truth_adj", expr(ShippedD3AdjCase))
    }),

    // PC threshold-STABILITY sweep on the shipped artifact (the
    // StARS-style sensitivity analysis a practitioner runs before
    // trusting q338's graph): the rank cross-moments are τ-free, so ONE
    // moment pass feeds the order-≤1 decision stage at six τ² rungs
    // (25..900 bp ⇒ τ = 0.05..0.30). Decisions are monotone in τ
    // (keep0 only drops, separating sets only appear), so the per-τ
    // edge sets are NESTED — an edge that dies at τ = 0.1 is a
    // threshold artifact, one alive at τ = 0.3 is structural; spec pins
    // the nesting. truth_adj rides along so each rung reads as a
    // recovery row. Fact-scale cost is unchanged from q338: the sweep
    // multiplies only the ≤ p²-row decision frames
    "q342_pc_tau_stability" -> ((s, d) =>
      graft.metrics.Causal.pcSkeletonTauSweep(shippedD3Panel(s),
          PcTauSweepBps)
        .withColumn("truth_adj", expr(ShippedD3AdjCase))),

    // cross-METHOD agreement census at corpus grain: the engine's two
    // discovery consumers — predictive (q333's nearest-lag lag-1
    // Granger) and constraint-based (q340's pairwise-complete PC
    // skeleton fold) — over the SAME 48 shipped configs in one plan,
    // each config reporting how far the two UNORDERED adjacency sets
    // agree: n_granger / n_pc / n_both / n_union and Jaccard permille
    // (truncating div, 0 at empty union). The reference's consumer
    // suite runs multiple algorithms over one corpus and compares their
    // metrics; this is that comparison as a first-class query — the
    // low-agreement configs are where a practitioner looks first. One
    // glob scan feeds both pipelines; the agreement join and census are
    // panel-grain (≤ 48·C(4,2) rows)
    "q341_method_agreement" -> ((s, d) => {
      val idxed = shippedD3TreeIdxed(s)
      def unfold(folded: org.apache.spark.sql.Column) =
        substring_index(folded, "|", -1)
      val gp = shippedD3TreeGrangerOut(s, idxed)
        .where(col("granger") === 1)
        .select(substring_index(col("cause"), "|", 1).as("cfg"),
          least(unfold(col("cause")), unfold(col("effect"))).as("u"),
          greatest(unfold(col("cause")), unfold(col("effect"))).as("v"))
        .distinct()
      val pp = graft.metrics.Causal
        .pcSkeleton(shippedD3TreeFoldedPanel(idxed))
        .where(col("edge") === 1)
        // skeleton rows have a < b with a shared cfg prefix, so the
        // unfolded (u, v) pair is already canonical
        .select(substring_index(col("a"), "|", 1).as("cfg"),
          unfold(col("a")).as("u"), unfold(col("b")).as("v"))
      val ag = gp.withColumn("g", lit(1))
        .join(pp.withColumn("p", lit(1)),
          Seq("cfg", "u", "v"), "full_outer")
        .groupBy("cfg")
        .agg(sum(coalesce(col("g"), lit(0))).cast("long").as("n_granger"),
          sum(coalesce(col("p"), lit(0))).cast("long").as("n_pc"),
          sum(when(col("g").isNotNull && col("p").isNotNull, 1L)
            .otherwise(0L)).as("n_both"),
          count(lit(1)).as("n_union"))
      // every config reports, including the (0,0,0,0) all-quiet ones
      idxed.select(col("cfg")).distinct()
        .join(ag, Seq("cfg"), "left_outer")
        .select(col("cfg"),
          coalesce(col("n_granger"), lit(0L)).as("n_granger"),
          coalesce(col("n_pc"), lit(0L)).as("n_pc"),
          coalesce(col("n_both"), lit(0L)).as("n_both"),
          coalesce(col("n_union"), lit(0L)).as("n_union"))
        .withColumn("jaccard_permille",
          expr("case when n_union = 0 then 0L " +
            "else (1000 * n_both) div n_union end"))
    }),

    // STREAMING causal monitoring — Granger edge decisions that update
    // as data arrives: the lagged pair tuples of a generated A1 panel
    // stream in TWO time-ordered micro-batches (days <200, then the
    // rest) through a transformWithState processor whose per-pair state
    // is the 10-sum moment matrix (fixed-size, mergeable — O(pairs)
    // state however long the stream runs); each batch emits each
    // touched pair's PREFIX sums and the decision arithmetic stays in
    // the ONE shared Causal.grangerDecide, so the emission log reads as
    // "the causal graph as of each batch" (n=199 prefix rows, then
    // n=399 full rows — 24 rows, decisions comparable across time).
    // The oracle replays the emission model with the q183 batch-fold
    // (bb <= i, a per-batch touched semijoin pinning update-mode's
    // emit-only-touched-keys rule) and the q333 key fold (batch id
    // inside the pair key), reusing the shared Granger decide CTEs
    // verbatim
    "q344_stream_granger" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 500 && c.nVars == 4 && c.maxLag == 2 &&
          c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q344_gen",
        Generate.wideFast(s, Seq(cfg)).where(col("t") < 400)
          .select(col("t") +: (1 to 4).map(i => col(s"X$i")): _*))
      val panel = (1 to 4).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      // the EXACT batch alignment, shared: grangerSums = this + sums
      val tuples = graft.metrics.Causal.grangerLagged(panel)
        .where(col("pv").isNotNull)
        .select(concat(col("cause"), lit("|"), col("effect")).as("pair"),
          col("yv"), col("pv"), col("qv"), col("day"))
      // split cache keyed on the DUMP's file identity (the events-path
      // discipline): dumpGen rewrites q344_gen every run, so a kernel or
      // grid change invalidates the splits by construction instead of by
      // a hand-bumped version tag
      val dumpSig = Option(new java.io.File(s"$genDir/q344_gen")
          .listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length()}:${f.lastModified()}")
        .mkString(";")
      val log = graft.streaming.StatefulOps.grangerSumsTws(s, tuples,
        "day", 200L, s"$genDir/q344_granger_split", s"q344:$dumpSig",
        s"graft_stream_granger_${System.nanoTime()}")
      val sums = log.select(
        substring_index(col("pair"), "|", 1).as("cause"),
        substring_index(col("pair"), "|", -1).as("effect"),
        col("n").cast("decimal(38,0)").as("n"),
        col("sy").cast("decimal(38,0)").as("sy"),
        col("sp").cast("decimal(38,0)").as("sp"),
        col("sq").cast("decimal(38,0)").as("sq"),
        col("syy").cast("decimal(38,0)").as("syy"),
        col("spp").cast("decimal(38,0)").as("spp"),
        col("sqq").cast("decimal(38,0)").as("sqq"),
        col("syp").cast("decimal(38,0)").as("syp"),
        col("syq").cast("decimal(38,0)").as("syq"),
        col("spq").cast("decimal(38,0)").as("spq"))
      graft.metrics.Causal.grangerDecide(sums, 422L)
        .withColumn("truth_lag1", expr(GrangerGenTruthCase))
    }),

    // strict-mode kernel digest (SURVEY §2.4's optional "fixed" mode as a
    // first-class oracle entry): q178 pins HOW MANY rows strict changes vs
    // compat, but the strict VALUES themselves had no CORRECTNESS row —
    // the one shipped behavior the DuckDB gate never hashed. Same q30
    // pattern on a strict A1/B2 pair: the strict kernel dump is written
    // once and both engines aggregate it to exact micro sums, covering
    // the three §2.4 corrections at once — B2's retained cubic links
    // (value sums), the strict contemporaneous evaluation order (X6
    // sums), and the min-gap irregular timestamps (time sums)
    "q345_strict_kernel_digest" -> ((s, d) => {
      val cfgs = Seq("A1", "B2").map(f =>
        Grid.forFamily(f).find(c =>
          c.nPoints == 1000 && c.nVars == 6 && c.maxLag == 2).get)
      // ±1e6 clamp before quantizing (the sweepDigest discipline): strict
      // B2 retains the cubic links the compat parser drops, so values can
      // legitimately diverge — least/greatest treat Inf and NaN
      // identically on both engines where floor(Inf·1e6) has no integer
      def cl(c: Column) = greatest(least(c, lit(1e6)), lit(-1e6))
      dumpGen(s, "q345_strict_wide",
          Generate.wideFast(s, cfgs, strict = true))
        .groupBy("family")
        .agg(count(lit(1)).as("n_rows"),
          ExactStats.sumMicro(cl(col("X1"))).as("sum_x1c_micro"),
          ExactStats.sumMicro(cl(col("X4"))).as("sum_x4c_micro"),
          ExactStats.sumMicro(cl(col("X6"))).as("sum_x6c_micro"),
          ExactStats.sumMicro(col("time")).as("sum_time_micro"))
    }),

    // PC at deployment WIDTH as a correctness row (the pcwide bench
    // rung's bitwise twin): q336/q337 gate the order-2 machinery at 6
    // series; this gates it at 32 — the width where a candidate-
    // enumeration divergence between the Spark moment-driven stage and
    // the SQL twin's series-enumeration stage would actually surface,
    // and where the Meek fixpoint early-exit must still agree with the
    // oracle's fully-unrolled round chain. The deterministic chain-MA
    // panel (Bench.widePanel — pure hash arithmetic, no RNG) is dumped
    // once; both engines run the complete order-2 skeleton + cofactor +
    // v-structure + Meek pipeline on it and the full 496-pair dir
    // census hashes bitwise.
    "q346_pc_wide_oriented" -> ((s, d) => {
      val pan = dumpGen(s, "q346_panel", Bench.widePanel(s, 32, 200))
      graft.metrics.Causal.pcOrient2(
          graft.metrics.Causal.pcSkeleton2(pan, PcOrientTauSqBp),
          PcMeekRounds)
        .select(col("a"), col("b"), col("dir"))
    }),

    // PC-STABLE at deployment width (q346's adjacency-restricted twin,
    // Colombo & Maathuis 2014): conditioning candidates come from the
    // adjacency surviving the previous order instead of every
    // co-observed series — the O(E·d²)-not-O(p⁴) form a 100-TB-wide
    // sensor panel needs, and a genuinely different estimator (a
    // non-neighbor separation the unrestricted variant accepts is NOT
    // a PC-stable separation; its edge set is a superset by
    // construction, pinned by PcStableSpec). Same dumped panel family
    // as q346 (own dump dir — Verify runs queries concurrently), full
    // skeleton + cofactor + v-structure + Meek-to-fixpoint pipeline,
    // 496-pair dir census hashed bitwise against the SQL twin's
    // adjacency-CTE chain
    "q347_pc_stable_wide" -> ((s, d) => {
      val pan = dumpGen(s, "q347_panel", Bench.widePanel(s, 32, 200))
      graft.metrics.Causal.pcOrient2(
          graft.metrics.Causal.pcSkeleton2Stable(pan, PcOrientTauSqBp),
          PcStableMeekRounds)
        .select(col("a"), col("b"), col("dir"))
    }),

    // the conditioning ladder's third rung (q347 + one more order):
    // order-2 survivors tested against every triple {z,w,u} drawn
    // wholly from one endpoint's order-2 neighborhood, via 4×4-minor
    // cofactors over the 5×5 normalized moment matrix — the SAME
    // generated determinant text evaluated by both engines, so parity
    // is by construction, not by parallel re-derivation. The adjacency
    // restriction is what makes a third order affordable at all
    // (unrestricted would be O(p⁵) per graph); the integer budget
    // tightens to n ≤ ~300 obs (Causal.pcSkeleton3Stable scaladoc),
    // which the 200-obs contract respects. Dataset: the BLOCK panel
    // (Bench.widePanel3 — q346/q347's chain panel has NO order-3
    // separations at any τ, probe-verified, so it cannot gate this
    // stage): 8 independent 5-series cells whose A-B pair separates
    // exactly on its source triple — 8 real order-3 removals, 8
    // three-element sepsets flowing into orientation, 40-series width
    "q348_pc_stable_order3_wide" -> ((s, d) => {
      val pan = dumpGen(s, "q348_panel", Bench.widePanel3(s, 8, 200))
      graft.metrics.Causal.pcOrient3(
          graft.metrics.Causal.pcSkeleton3Stable(pan, PcOrientTauSqBp),
          PcStableMeekRounds)
        .select(col("a"), col("b"), col("dir"))
    }),

    // candidate-volume census: the O(E·d^k)-vs-O(p^(k+2)) claim behind
    // the whole PC-stable ladder, pinned as DATA instead of asserted in
    // comments. Per conditioning order: the stable candidate count
    // (distinct tuples the adjacency restriction actually enumerates,
    // re-derived from the skeleton's own keep0/edge/edge2 columns with
    // the implementation's exact side-set semantics) next to the
    // unrestricted twin's closed-form volume (survivors × C(S-2, k)).
    // On the 8-cell block panel the cand3 ratio alone is ~3 orders of
    // magnitude — the census row IS the scale argument, hash-checked
    // bitwise in both engines
    "q349_pc_stage_census" -> ((s, d) => {
      val pan = dumpGen(s, "q349_panel", Bench.widePanel3(s, 8, 200))
      val sk = graft.metrics.Causal.pcSkeleton3Stable(pan, PcOrientTauSqBp)
        .select(col("a"), col("b"), col("keep0"), col("edge"),
          col("edge2"), col("edge3"))
        .localCheckpoint()
      def sym(f: DataFrame): DataFrame = f
        .unionByName(f.select(col("b").as("a"), col("a").as("b")))
        .select(col("a").as("x"), col("b").as("y"))
      val k0 = sk.where(col("keep0") === 1).select(col("a"), col("b"))
      val e1 = sk.where(col("edge") === 1).select(col("a"), col("b"))
      val e2 = sk.where(col("edge2") === 1).select(col("a"), col("b"))
      val adj0 = sym(k0); val adj1 = sym(e1); val adj2 = sym(e2)
      def sideCands(pairsF: DataFrame, adj: DataFrame, k: Int)
          : DataFrame = {
        val conds = Seq("z", "w", "u").take(k)
        def side(key: String, other: String): DataFrame =
          conds.foldLeft(pairsF) { (df, cn) =>
            df.join(broadcast(adj.select(col("x").as(key),
              col("y").as(cn))), Seq(key))
          }.where(conds.map(cn => col(cn) =!= col(other))
              .reduce(_ && _) &&
            conds.zip(conds.tail).map { case (p, q) => col(p) < col(q) }
              .foldLeft(lit(true))(_ && _))
            .select((Seq("a", "b") ++ conds).map(col): _*)
        side("a", "b").unionByName(side("b", "a")).distinct()
      }
      def cnt(name: String, variant: String, f: DataFrame): DataFrame =
        f.agg(count(lit(1)).cast("long").as("n"))
          .select(lit(name).as("stage"), lit(variant).as("variant"),
            col("n"))
      val ser = sk.select(col("a").as("sn"))
        .unionByName(sk.select(col("b").as("sn"))).distinct()
        .agg(count(lit(1)).cast("long").as("sc"))
      def unres(name: String, survivors: DataFrame, k: Int): DataFrame =
        survivors.agg(count(lit(1)).cast("long").as("c")).crossJoin(ser)
          .select(lit(name).as("stage"), lit("unrestricted").as("variant"),
            expr(k match {
              case 1 => "c * (sc - 2)"
              case 2 => "c * ((sc - 2) * (sc - 3) div 2)"
              case 3 => "c * ((sc - 2) * (sc - 3) * (sc - 4) div 6)"
            }).cast("long").as("n"))
      cnt("pairs", "both", sk)
        .unionByName(cnt("keep0", "both", k0))
        .unionByName(cnt("cand1", "stable", sideCands(k0, adj0, 1)))
        .unionByName(unres("cand1", k0, 1))
        .unionByName(cnt("edge1", "both", e1))
        .unionByName(cnt("cand2", "stable", sideCands(e1, adj1, 2)))
        .unionByName(unres("cand2", e1, 2))
        .unionByName(cnt("edge2", "both", e2))
        .unionByName(cnt("cand3", "stable", sideCands(e2, adj2, 3)))
        .unionByName(unres("cand3", e2, 3))
        .unionByName(cnt("edge3", "both",
          sk.where(col("edge3") === 1)))
    }),

    // width-adaptive thresholding (the multiple-testing control the
    // q349 census motivates): a fixed τ under width growth admits
    // spurious order-0 adjacencies as P(|ρ̂|>τ)·C(p,2), so the
    // operator's knob is τ(p,n) = Φ⁻¹(1−α/2m)/√(n−1) — Bonferroni over
    // the m = C(p,2) tests, computed ONCE on the driver
    // (Causal.tauSqBpForWidth, Acklam Φ⁻¹) and shared as one integer
    // by both engines. This query pins BOTH sides of the tradeoff as
    // data on a 160-series/32-cell block panel: per τ the keep0/edge
    // ladder counts — fixed τ=0.1 keeps the spurious-adjacency bulge,
    // adaptive τ≈0.33 collapses it AND prunes the true edges whose
    // partials sit near 0.2-0.3 (the documented power price at n=200)
    "q350_pc_width_adaptive" -> ((s, d) => {
      val pan = dumpGen(s, "q350_panel", Bench.widePanel3(s, 32, 200))
      def census(tau: Long): DataFrame = {
        val sk = graft.metrics.Causal.pcSkeleton3Stable(pan, tau)
          .select(col("keep0"), col("edge"), col("edge2"), col("edge3"))
          .localCheckpoint()
        def cnt(stage: String, c: Column): DataFrame =
          sk.where(c === 1).agg(count(lit(1)).cast("long").as("n"))
            .select(lit(tau).as("tau_sq_bp"), lit(stage).as("stage"),
              col("n"))
        cnt("keep0", col("keep0"))
          .unionByName(cnt("edge1", col("edge")))
          .unionByName(cnt("edge2", col("edge2")))
          .unionByName(cnt("edge3", col("edge3")))
      }
      census(PcOrientTauSqBp)
        .unionByName(census(
          graft.metrics.Causal.tauSqBpForWidth(160, 200)))
    }),

    // structural edge-WEIGHT recovery (the estimation step after
    // discovery — the q332/q339 consumers stop at edge DECISIONS; the
    // catalog declares coefficients, CausalLink.coef, that no prior
    // query reads back from data): per-link OLS betas by Cramer's rule
    // over centered lagged cross-moments (Causal.laggedCrossMoments +
    // structuralBetas, all integer, bitwise vs the oracle), scored
    // against BOTH the declared ppm truth and the EFFECTIVE one
    // (Parser.effectiveLinks). The A1 6-var cell is chosen because it
    // carries a 2-parent target (X4 ← X1@2 + X5@1 — the k=2 Cramer
    // branch) AND a §2.4-2 dead link (X5→X6@0 declares 0.85 but the
    // EqReverse kernel reads the zero cell): the estimator recovers
    // every live coefficient to ~1% of scale and measures the dead
    // link at ≈0 — quirk detection from generated bytes alone.
    // Fact-scale cost: one lagged self-join + one moment aggregation.
    "q351_struct_betas" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 5000 && c.nVars == 6 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q351_gen",
        Generate.wideFast(s, Seq(cfg))
          .select(col("t") +: (1 to 6).map(i => col(s"X$i")): _*))
      val panel = (1 to 6).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      val links = weightLinks("", "A1", 6, 2)
      val mom = graft.metrics.Causal.laggedCrossMoments(
        panel, weightSpecs(links), col("t").between(2, 4999))
      graft.metrics.Causal.structuralBetas(mom, weightLinksDf(s, links))
        .withColumn("r2_permille", expr(
          """(1000 * sum(cast(beta_ppm as decimal(38,0)) * cjy)
            |  over (partition by target))
            |div (1000000 * cast(cyy as decimal(38,0)))""".stripMargin)
          .cast("long"))
        .select(col("target"), col("source"), col("lag"), col("beta_ppm"),
          col("declared_ppm"), col("effective_ppm"),
          abs(col("beta_ppm") - col("effective_ppm")).as("abs_err_ppm"),
          col("r2_permille"))
    }),

    // weight-recovery CENSUS at corpus grain (q351's fold, the q340
    // discipline): the full A1+A1C gaussian n=5000 cell — 18 configs,
    // 3 widths × 3 lags × {unconfounded, U-confounded} — generated,
    // folded into series AND day keys, and pushed through ONE
    // laggedCrossMoments pass (shuffle join, broadcastB=false: the
    // megarow fold must take the cluster shape) + ONE Cramer stage.
    // Scored per config vs the EFFECTIVE truth: the dead-contemporaneous
    // cells (A1 widths 6/8) recover their live links and measure their
    // dead ones at ≈0 (n_dead counts them); A1C's U confounder is WHITE
    // and contemporaneous-only, so it inflates residuals without biasing
    // any lagged or toposort-resolved coefficient — mean_abs_err stays
    // at quantization grain across all 18 graphs, and that claim is the
    // hash-checked row, not a comment. At 100k configs nothing here
    // widens: moments stay |specs|² per config, the fold is one scan.
    "q352_weight_recovery_census" -> ((s, d) => {
      val cfgs = Grid.all().filter(c =>
        (c.family == "A1" || c.family == "A1C") && c.nPoints == 5000
          && c.noiseType == "gaussian")
      val gen = dumpGen(s, "q352_gen",
        Generate.wideFast(s, cfgs)
          .select(Seq(col("configId"), col("t")) ++
            (1 to 8).map(i => col(s"X$i")): _*))
      val panel = (1 to 8).map(i =>
        gen.where(col(s"X$i").isNotNull)
          .select(concat(col("configId"), lit(s"|X$i")).as("series"),
            (col("configId") * 8192 + col("t")).as("day"),
            floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      val links = cfgs.flatMap(c =>
        weightLinks(c.configId.toString, c.family, c.nVars, c.maxLag))
      val mom = graft.metrics.Causal.laggedCrossMoments(
        panel, weightSpecs(links),
        expr("t % 8192 BETWEEN 4 AND 4999"), broadcastB = false)
      graft.metrics.Causal.structuralBetas(mom, weightLinksDf(s, links))
        .groupBy("family", "n_vars", "max_lag")
        .agg(count(lit(1)).as("n_links"),
          sum(when(col("effective_ppm") === 0, 1L).otherwise(0L))
            .as("n_dead"),
          expr("sum(abs(beta_ppm - effective_ppm)) div count(1)")
            .as("mean_abs_err_ppm"),
          max(abs(col("beta_ppm") - col("effective_ppm")))
            .as("max_abs_err_ppm"))
    }),

    // default-vs-STRICT kernel contrast through the estimator (closing
    // the q345 arc: the strict kernel's digest is oracle-gated, but no
    // query showed strict mode CHANGING an inference): the same A1
    // 6-var cell generated both ways, both panels through the same
    // moment+Cramer machinery, one row per link with both betas side by
    // side. The dead X5→X6 link reads β≈0 under the default kernel and
    // β≈850000 ppm under strict — the §2.4-2 quirk and its §2.4 fix,
    // pinned as data. All other links agree across kernels (X6 feeds
    // nothing downstream in this cell, so only its own row moves).
    "q353_strict_recovery_contrast" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 5000 && c.nVars == 6 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      val links = weightLinks("", "A1", 6, 2)
      def betasFrom(dump: String, strict: Boolean): DataFrame = {
        val gen = dumpGen(s, dump,
          Generate.wideFast(s, Seq(cfg), strict = strict)
            .select(col("t") +: (1 to 6).map(i => col(s"X$i")): _*))
        val panel = (1 to 6).map(i =>
          gen.select(lit(s"X$i").as("series"), col("t").as("day"),
            floor(col(s"X$i") * 1000).cast("long").as("v")))
          .reduce(_ unionByName _)
        graft.metrics.Causal.structuralBetas(
          graft.metrics.Causal.laggedCrossMoments(
            panel, weightSpecs(links), col("t").between(2, 4999)),
          weightLinksDf(s, links))
      }
      betasFrom("q353_gen_default", strict = false)
        .select(col("target"), col("source"), col("lag"),
          col("declared_ppm"), col("effective_ppm"),
          col("beta_ppm").as("beta_default_ppm"))
        .join(betasFrom("q353_gen_strict", strict = true)
            .select(col("target"), col("source"), col("lag"),
              col("beta_ppm").as("beta_strict_ppm")),
          Seq("target", "source", "lag"))
    }),

    // NOISE-SCALE recovery (the third leg of full model recovery:
    // structure — the PC suite; weights — q351; this reads back the
    // generator's declared noise amplitude): per target, the exact
    // integer residual variance σ̂² = (10⁶·C_yy − Σβ_ppm·C_jy) div
    // (10⁶·n²) in milli² units — the grid's gaussian noiseScale 0.1
    // means every target's truth is EXACTLY 10⁴ (population-n²
    // normalization; the k≤2 dof correction is <0.1% at n=4998, inside
    // quantization grain), and the per-target R² alongside gives the
    // full variance decomposition: upstream-signal share vs noise
    // floor. X6's row is the quirk read a third way — its declared
    // 0.85 parent contributes nothing, so r2≈0 while σ̂² still lands
    // on 10⁴ (the dead link leaves pure noise, not excess variance).
    "q354_noise_recovery" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 5000 && c.nVars == 6 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q354_gen",
        Generate.wideFast(s, Seq(cfg))
          .select(col("t") +: (1 to 6).map(i => col(s"X$i")): _*))
      val panel = (1 to 6).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      val links = weightLinks("", "A1", 6, 2)
      val mom = graft.metrics.Causal.laggedCrossMoments(
        panel, weightSpecs(links), col("t").between(2, 4999))
      graft.metrics.Causal.structuralBetas(mom, weightLinksDf(s, links))
        .groupBy("target")
        .agg(count(lit(1)).as("n_parents"),
          expr("""(1000 * sum(cast(beta_ppm as decimal(38,0)) * cjy))
                 |div (1000000 * max(cast(cyy as decimal(38,0))))"""
            .stripMargin).cast("long").as("r2_permille"),
          expr("""(1000000 * max(cast(cyy as decimal(38,0)))
                 |  - sum(cast(beta_ppm as decimal(38,0)) * cjy))
                 |div (1000000 * max(cast(n as decimal(38,0))) * max(n))"""
            .stripMargin).cast("long").as("sigma2_v"))
        .withColumn("sigma2_truth_v", lit(10000L))
        .withColumn("sigma2_err_v",
          abs(col("sigma2_v") - col("sigma2_truth_v")))
    }),

    // NONLINEAR-term weight recovery (the B-family extension of q351:
    // B1's equations are c·x² − c'·x³ + e, and the §2.4-1 quirk — the
    // '+'-split extractor silently drops the minus-signed cubic — is a
    // COEFFICIENT fact this estimator reads straight off the data): the
    // regressors are power-transformed virtual series (X1² / X1³ at the
    // link lag — same double-then-floor quantization contract both
    // engines share bitwise), so the SAME k=2 Cramer machinery fits the
    // quadratic and cubic terms jointly. x² is even and x³ odd in a
    // near-symmetric series, so the two regressors separate cleanly.
    // One row per strict term with BOTH kernels' betas: default reads
    // β₂ ≈ declared quadratic / β₃ ≈ 0 (the dropped cubic, measured —
    // and the first NEGATIVE-beta surface for the signed-div parity);
    // strict reads β₃ ≈ the declared negative cubic. Dataset is the
    // grid cell SENSITIVITY-BOOSTED (the q348 purpose-built-dataset
    // precedent): at the catalog's σ=0.1 the power terms are
    // statistically invisible (std(x³)≈0.004 → se(β₃)≈0.4 at any grid
    // n — measured, double-OLS agrees with the integer pipeline to
    // 1e-3), so the probe regenerates the SAME equations at σ=0.3 and
    // n=50,000 where se(β₃)≈0.013 — the quirk becomes a 4-15σ read.
    "q355_power_recovery_contrast" -> ((s, d) => {
      val cfg = Grid.forFamily("B1").find(c =>
        c.nPoints == 5000 && c.nVars == 4 && c.maxLag == 2
          && c.noiseType == "gaussian").get
        .copy(nPoints = 50000, noiseScale = 0.3)
      def betasFrom(dump: String, strict: Boolean): DataFrame = {
        val gen = dumpGen(s, dump,
          Generate.wideFast(s, Seq(cfg), strict = strict)
            .select(col("t") +: (1 to 4).map(i => col(s"X$i")): _*))
        val panel = (1 to 4).flatMap(i => Seq(
            gen.select(lit(s"X$i").as("series"), col("t").as("day"),
              floor(col(s"X$i") * 1000).cast("long").as("v")),
            gen.select(lit(s"X${i}p2").as("series"), col("t").as("day"),
              floor(col(s"X$i") * col(s"X$i") * 1000).cast("long")
                .as("v")),
            gen.select(lit(s"X${i}p3").as("series"), col("t").as("day"),
              floor(col(s"X$i") * col(s"X$i") * col(s"X$i") * 1000)
                .cast("long").as("v"))))
          .reduce(_ unionByName _)
        graft.metrics.Causal.structuralBetas(
          graft.metrics.Causal.laggedCrossMoments(panel, b1PowerSpecs(),
            col("t").between(2, 49999)),
          b1PowerLinksDf(s))
      }
      betasFrom("q355_gen_default", strict = false)
        .select(col("target"), col("source"), col("lag"), col("pow"),
          col("declared_ppm"), col("effective_ppm"),
          col("beta_ppm").as("beta_default_ppm"))
        .join(betasFrom("q355_gen_strict", strict = true)
            .select(col("target"), col("source"), col("lag"), col("pow"),
              col("beta_ppm").as("beta_strict_ppm")),
          Seq("target", "source", "lag", "pow"))
    }),

    // MISSING-DATA recovery census + the D1 shadow quirk as an
    // estimator read (completing effectiveLinks over all six
    // evaluation strategies): D1's two-pass shadowing records each
    // pass-1 equation's last dep SOURCE in var_values, so pass 2 skips
    // the X1/X3 equations — those series are EXACTLY 0 — and the
    // surviving pass-1 targets read only zeroed sources; every link in
    // the 4-var cell is therefore effectively dead, and the integer
    // pipeline proves it the strongest way available: max |beta| = 0
    // EXACTLY per config (zero channels hit the Cjj=0 / Cjy=0 guards,
    // not a tolerance). The fold carries the three MCAR rates in one
    // plan over PAIRWISE-COMPLETE moments — masked cells drop out of
    // the panel before the virtual expansion, so each pair carries its
    // own n, and the published min/max pair n per config reads the
    // 10/20/30% missingness straight off the moment matrix.
    "q362_shadow_census" -> ((s, d) => {
      val cfgs = Grid.all().filter(c =>
        c.family == "D1" && c.nVars == 4 && c.maxLag == 2
          && c.nPoints == 5000 && c.noiseType == "gaussian")
      val gen = dumpGen(s, "q362_gen",
        Generate.wideFast(s, cfgs)
          .select(Seq(col("configId"), col("t")) ++
            (1 to 4).map(i => col(s"X$i")) :+ col("maskBits"): _*))
      val pan = (1 to 4).map(i =>
        gen.where(col("maskBits").bitwiseAND(lit(1 << (i - 1))) === 0)
          .select(concat(col("configId"), lit(s"|X$i")).as("series"),
            (col("configId") * 8192 + col("t")).as("day"),
            floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      val wlinks = cfgs.flatMap(c =>
        weightLinks(c.configId.toString, "D1", 4, 2))
      val mcarOf = cfgs.map(c =>
        c.configId.toString -> math.round(c.mcarProb * 1000)).toMap
      import s.implicits._
      val linksDf = wlinks.map(l => (l.g, mcarOf(l.g), l.target, l.source,
          l.lag, l.y, l.x, l.sib, l.declaredPpm, l.effectivePpm))
        .toDF("g", "mcar_permille", "target", "source", "lag", "y", "x",
          "sib", "declared_ppm", "effective_ppm")
      // lower bound 4, not 2: the first max_lag rows are pure noise
      // (SURVEY quirk) and a lag-2 virtual channel at t=2 reads day 0 —
      // two leaked noise rows would turn the exact-zero dead channels
      // into unstable tiny-moment ratios (measured: 1.57M ppm at 10%
      // MCAR with bound 2, exactly 0 at bound 4)
      val mom = graft.metrics.Causal.laggedCrossMoments(
        pan, weightSpecs(wlinks),
        expr("t % 8192 BETWEEN 4 AND 4999"), broadcastB = false)
      graft.metrics.Causal.structuralBetas(mom, linksDf)
        .groupBy("mcar_permille")
        .agg(count(lit(1)).as("n_links"),
          sum(when(col("effective_ppm") === 0, 1L).otherwise(0L))
            .as("n_dead"),
          max(abs(col("beta_ppm"))).as("max_abs_beta_ppm"),
          min(col("n")).as("min_pair_n"), max(col("n")).as("max_pair_n"))
    }),

    // LARGE-SCALE MULTIPLE TESTING with Benjamini-Hochberg FDR control
    // (the operation a 100-TB deployment actually runs: thousands of
    // simultaneous edge hypotheses, not seven): 585 candidate pairs of
    // the deterministic 64-series chain panel — distance-1/2/3 pairs
    // are REAL effects of graded strength (the 4-ancestor MA window
    // makes ρ ≈ 0.56 / 0.24 / 0.024 and exactly 0 beyond distance 3),
    // distance-4..10 pairs are 399 EXACT nulls — each tested by the
    // k=1 Wald t² from pair-restricted sparse moments, then the BH
    // step-up executed entirely on the t² scale: rank by t² desc and
    // compare against the driver-shared χ²₁ quantile ladder
    // Q(1−α·k/m) (Causal.chi2InvMilliLadder — no p-value column ever
    // materializes), k* = max passing rank, discoveries = ranks ≤ k*.
    // The census publishes per-distance discovery counts plus the
    // REALIZED false-discovery rate (false = distance ≥ 4) and k* —
    // multiplicity control as hash-checked rows. The inference here is
    // row-local k=1 (each pair its own regression), so the windowed
    // structuralInference is deliberately NOT used — its per-target
    // window would pool unrelated hypotheses sharing a series.
    "q370_bh_fdr" -> ((s, d) => {
      val pan = dumpGen(s, "q370_panel", Bench.widePanel(s, 64, 20000))
      import s.implicits._
      def nm(i: Int) = f"X$i%02d"
      val cands = for { dd <- 1 to 10; i <- 0 until 64 - dd }
        yield (nm(i), nm(i + dd), dd)
      val linksDf = cands.map { case (a, b, dist) =>
        (s"$a<$b", dist, s"$b@0", s"$a@0", None: Option[String]) }
        .toDF("pair", "dist", "y", "x", "sib")
      val wanted = cands.flatMap { case (a, b, _) =>
        Seq((s"$a@0", s"$a@0"), (s"$b@0", s"$b@0"), (s"$a@0", s"$b@0")) }
        .distinct.toDF("na", "nb")
      val virt = pan.select(concat(col("series"), lit("@0")).as("vs"),
        col("day").as("t"), col("v"))
      val mom = graft.metrics.Causal.virtualCrossMomentsSparse(virt,
        wanted, col("t").between(0, 19999))
      val inf = graft.metrics.Causal.waldK1(
        graft.metrics.Causal.structuralBetas(mom, linksDf))
      val lutDf = graft.metrics.Causal.chi2InvMilliLadder(cands.size)
        .zipWithIndex.map { case (q, i) => (i + 1, q) }
        .toDF("rk", "q_milli")
      val ranked = inf
        .withColumn("rk", expr(
          "row_number() over (order by coalesce(t2_milli, -1) desc, pair)"))
        .join(broadcast(lutDf), Seq("rk"))
        .withColumn("k_star", expr(
          """max(case when t2_milli >= q_milli then rk end)
            |  over ()""".stripMargin))
        .withColumn("disc",
          (col("rk") <= coalesce(col("k_star"), lit(0L))).cast("int"))
      val summary = ranked.agg(
        max(col("k_star")).cast("long").as("k_star"),
        sum(col("disc")).as("n_disc_total"),
        sum(when(col("disc") === 1 && col("dist") >= 4, 1L)
          .otherwise(0L)).as("n_false_disc"))
        .withColumn("fdr_permille", expr(
          """case when n_disc_total = 0 then 0
            |else (1000 * n_false_disc) div n_disc_total end"""
            .stripMargin))
      ranked.groupBy("dist")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("disc")).as("n_disc"),
          min(col("t2_milli")).as("min_t2_milli"),
          max(col("t2_milli")).as("max_t2_milli"))
        .crossJoin(broadcast(summary))
    }),

    // BLIND deterministic-component estimation (q361/q369 SUBTRACT the
    // kernel's KNOWN trend/season; this ESTIMATES them from data — the
    // step a real deployment cannot skip): per series, the trend slope
    // by k=1 OLS on the index and each of the four period-12 harmonic
    // coefficients by k=2 OLS (harmonic + index — the index is the one
    // real confounder; the harmonics are mutually orthogonal over the
    // 41 whole periods the window keeps, so each can be read alone).
    // Truth is driver-computable from the kernel's season expansion:
    // seasonalStrength·(sin(ωt+φ) + 0.5·cos(2ωt+φ)) decomposes onto
    // the sin/cos basis as a_s1 = 0.5cosφ, a_c1 = 0.5sinφ,
    // a_s2 = −0.25sinφ, a_c2 = 0.25cosφ (φ_i = 2πi/8), and the trend
    // as 10⁹·0.005·(i+1) in milli-per-index ppm. The in_model flag is
    // the MODEL-CLASS read: series whose own struct term is cos/sin
    // (bounded, chirp-like from trending parents — nearly orthogonal
    // to period-12) estimate every component within ~4% of declared
    // truth; series whose struct term is a POWER of a trending parent
    // (X1 = 0.4·X2³, X3 = 0.35·X4²) carry polynomial trend the
    // linear+harmonic basis cannot represent, and the trend read
    // absorbs it (X1's slope estimate lands 19× truth) — blind
    // adjustment honest about where its model class ends, as data.
    // The basis columns are dumped once (kernel expression order) and
    // both engines read shared bytes.
    "q372_harmonic_estimation" -> ((s, d) => {
      val cfg = Grid.forFamily("C1").find(c =>
        c.nPoints == 500 && c.nVars == 6 && c.maxLag == 2).get
      val gen = dumpGen(s, "q372_gen",
        Generate.wideFast(s, Seq(cfg)).select(
          Seq(col("t")) ++ (1 to 6).map(i => col(s"X$i")) ++ Seq(
            sin(lit(2.0 * math.Pi) * col("t") / lit(12.0)).as("s1"),
            cos(lit(2.0 * math.Pi) * col("t") / lit(12.0)).as("c1"),
            sin(lit(4.0 * math.Pi) * col("t") / lit(12.0)).as("s2"),
            cos(lit(4.0 * math.Pi) * col("t") / lit(12.0)).as("c2")): _*))
      val targets = (1 to 6).map(i =>
        gen.select(lit(s"X$i@0").as("vs"), col("t"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
      val tChan = gen.select(lit("tt@0").as("vs"), col("t"),
        col("t").cast("long").as("v"))
      val basis = Seq("s1", "c1", "s2", "c2").map(b =>
        gen.select(lit(s"$b@0").as("vs"), col("t"),
          floor(col(b) * 1000).cast("long").as("v")))
      val virt = (targets ++ Seq(tChan) ++ basis).reduce(_ unionByName _)
      val mom = graft.metrics.Causal.virtualCrossMoments(virt,
        col("t").between(0, 491))
      val links = harmonicLinks()
      import s.implicits._
      val linksDf = links.toDF("series", "component", "y", "x", "sib",
        "truth_ppm", "in_model")
      graft.metrics.Causal.structuralBetas(mom, linksDf)
        .select(col("series"), col("component"), col("in_model"),
          col("beta_ppm").as("est_ppm"), col("truth_ppm"),
          abs(col("beta_ppm") - col("truth_ppm")).as("abs_err_ppm"))
    }),

    // BLIND-ADJUSTED recovery — the q372 arc closed end-to-end:
    // estimate the deterministic components (q372's 30 regressions),
    // subtract the ESTIMATES (integer channel arithmetic from the
    // stage-1 betas — no known-truth constant enters the blind path),
    // then recover the func-link weights on the blindly adjusted
    // targets, side by side with the KNOWN-detrending twin from the
    // SAME moment pass. Measured: the in-model targets' blind betas
    // track the known ones with a drift that mirrors their stage-1
    // trend misestimate — X2's link to 0.9%, X4/X5's links to 10-17%
    // (q372 put their slope reads 2-4% off; the residual trend left in
    // the blind channel attenuates the func betas) — while the two
    // power-term targets (X1, X3) inherit the absorbed polynomial
    // trend and collapse by ≥ 300k ppm. The full pipeline (estimate →
    // adjust → recover) works without being told anything, and the
    // known-twin column prices each adjustment error per link.
    "q373_blind_adjusted_recovery" -> ((s, d) => {
      val cfg = Grid.forFamily("C1").find(c =>
        c.nPoints == 500 && c.nVars == 6 && c.maxLag == 2).get
      val links = c1Links()
      def trendC(i: Int): Column = lit(0.01 * (i + 1) * 0.5) * col("t")
      def seasonC(i: Int): Column = {
        val phase = 2.0 * math.Pi * i / 8.0
        lit(0.5) * (sin(lit(2.0 * math.Pi) * col("t") / lit(12.0)
            + lit(phase))
          + lit(0.5) * cos(lit(4.0 * math.Pi) * col("t") / lit(12.0)
            + lit(phase)))
      }
      val halfPi = math.Pi / 2.0
      val gen = dumpGen(s, "q373_gen",
        Generate.wideFast(s, Seq(cfg)).select(
          Seq(col("t")) ++
            (1 to 6).map(i => col(s"X$i")) ++
            (1 to 6).map(i => (col(s"X$i") - trendC(i - 1) -
              seasonC(i - 1)).as(s"X${i}t")) ++
            Seq(
              sin(lit(2.0 * math.Pi) * col("t") / lit(12.0)).as("s1"),
              cos(lit(2.0 * math.Pi) * col("t") / lit(12.0)).as("c1"),
              sin(lit(4.0 * math.Pi) * col("t") / lit(12.0)).as("s2"),
              cos(lit(4.0 * math.Pi) * col("t") / lit(12.0)).as("c2")) ++
            (1 to 6).flatMap(i => Seq(
              cos(col(s"X$i") * lit(halfPi)).as(s"cX$i"),
              sin(col(s"X$i") * lit(halfPi)).as(s"sX$i"),
              (col(s"X$i") * col(s"X$i")).as(s"p2X$i"),
              (col(s"X$i") * col(s"X$i") * col(s"X$i"))
                .as(s"p3X$i"))): _*))
      // ---- stage 1: q372's component estimation on THIS dump ----
      val targets1 = (1 to 6).map(i =>
        gen.select(lit(s"X$i@0").as("vs"), col("t"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
      val tChan = gen.select(lit("tt@0").as("vs"), col("t"),
        col("t").cast("long").as("v"))
      val basis = Seq("s1", "c1", "s2", "c2").map(b =>
        gen.select(lit(s"$b@0").as("vs"), col("t"),
          floor(col(b) * 1000).cast("long").as("v")))
      val mom1 = graft.metrics.Causal.virtualCrossMoments(
        (targets1 ++ Seq(tChan) ++ basis).reduce(_ unionByName _),
        col("t").between(0, 491))
      import s.implicits._
      val hLinksDf = harmonicLinks().toDF("series", "component", "y",
        "x", "sib", "truth_ppm", "in_model")
      val comps = graft.metrics.Causal.structuralBetas(mom1, hLinksDf)
        .groupBy("series")
        .agg(
          max(when(col("component") === "trend", col("beta_ppm")))
            .as("bt"),
          max(when(col("component") === "s1", col("beta_ppm")))
            .as("bs1"),
          max(when(col("component") === "c1", col("beta_ppm")))
            .as("bc1"),
          max(when(col("component") === "s2", col("beta_ppm")))
            .as("bs2"),
          max(when(col("component") === "c2", col("beta_ppm")))
            .as("bc2"))
        .localCheckpoint()
      // ---- stage 2: blind + known target channels, func regressors ----
      def m(c: String): Column = floor(col(c) * 1000).cast("long")
      val blind = (1 to 6).map { i =>
        gen.crossJoin(broadcast(comps.where(col("series") === s"X$i")
            .drop("series")))
          .select(lit(s"X$i^@0").as("vs"), col("t"),
            expr(s"""(1000000 * ${s"floor(X$i * 1000)"}
              |  - bt * t
              |  - bs1 * floor(s1 * 1000) - bc1 * floor(c1 * 1000)
              |  - bs2 * floor(s2 * 1000) - bc2 * floor(c2 * 1000))
              |div 1000000""".stripMargin).cast("long").as("v"))
      }
      val known = (1 to 6).map(i =>
        gen.select(lit(s"X$i~@0").as("vs"), col("t"),
          m(s"X${i}t").as("v")))
      val regs = links.map(l => (l._5.split("@")(0), l._5, l._3))
        .distinct.map { case (series, vs, lag) =>
          gen.select(lit(vs).as("vs"), (col("t") + lag).as("t"),
            m(series).as("v")) }
      val mom2 = graft.metrics.Causal.virtualCrossMoments(
        (blind ++ known ++ regs).reduce(_ unionByName _),
        col("t").between(2, 491))
      val inModel = graft.core.Parser.truthLinks("C1", 6, 2)
        .filter(_.source != "U")
        .map(l => l.target -> (if (Set("cos", "sin")(l.func)) 1 else 0))
        .toMap
      def linksDf(blindY: Boolean): DataFrame = links.map { l =>
        val y = if (blindY) s"${l._1}^@0" else l._6
        (l._1, l._2, l._3, l._4, y, l._5, l._7, l._9, inModel(l._1))
      }.toDF("target", "source", "lag", "func", "y", "x", "sib",
        "effective_ppm", "in_model")
      val kn = graft.metrics.Causal.structuralBetas(mom2, linksDf(false))
        .select(col("target"), col("source"), col("lag"), col("func"),
          col("in_model"), col("effective_ppm"),
          col("beta_ppm").as("beta_known_ppm"))
      val bl = graft.metrics.Causal.structuralBetas(mom2, linksDf(true))
        .select(col("target"), col("source"), col("lag"),
          col("beta_ppm").as("beta_blind_ppm"))
      kn.join(bl, Seq("target", "source", "lag"))
        .withColumn("blind_vs_known_ppm",
          abs(col("beta_blind_ppm") - col("beta_known_ppm")))
    }),

    // FDR vs FWER — the two multiplicity regimes measured head-to-head
    // on block-structured truth (q370 proved BH controls its rate;
    // this measures what that control COSTS relative to Bonferroni,
    // which is exactly the width-adaptive PC rule's regime): the
    // 32-block panel (160 series; within a block the two aggregates
    // correlate with each source at ρ = 0.5 and with each other at
    // 0.75, sources mutually null, everything cross-block null) at
    // n = 60 — chosen so the 192 aggregate-source pairs sit on the
    // DETECTION BOUNDARY (t² ≈ 19 vs thresholds ≈ 15) while the 32
    // A-B pairs are far above it. 1,395 windowed pair hypotheses, one
    // Wald t² frame, BOTH rules read from the same χ²₁ ladder — BH as
    // the step-up against Q(1−α·k/m), Bonferroni as the fixed rank-1
    // cut Q(1−α/m). The census rows are the tradeoff as data: per
    // rule, discoveries split by tier (ab / as / null), realized FDR,
    // and boundary-tier power — BH buys its extra power on the
    // borderline tier at a bounded, published false-discovery price.
    "q371_fdr_vs_fwer" -> ((s, d) => {
      val pan = dumpGen(s, "q371_panel", Bench.widePanel3(s, 32, 60))
      import s.implicits._
      def snm(i: Int) = s"G${"%02d".format(i / 5)}X${i % 5}"
      val cands = for { dd <- 1 to 9; i <- 0 until 160 - dd } yield {
        val (a, b) = (snm(i), snm(i + dd))
        val tier =
          if (i / 5 != (i + dd) / 5) "null"
          else if (i % 5 >= 3 && (i + dd) % 5 >= 3) "ab"
          else if (i % 5 >= 3 || (i + dd) % 5 >= 3) "as"
          else "null"
        (s"$a<$b", tier, s"$b@0", s"$a@0", None: Option[String])
      }
      val linksDf = cands.toDF("pair", "tier", "y", "x", "sib")
      val wanted = cands.flatMap { case (_, _, y, x, _) =>
        val (a, b) = if (x <= y) (x, y) else (y, x)
        Seq((x, x), (y, y), (a, b))
      }.distinct.toDF("na", "nb")
      val virt = pan.select(concat(col("series"), lit("@0")).as("vs"),
        col("day").as("t"), col("v"))
      val mom = graft.metrics.Causal.virtualCrossMomentsSparse(virt,
        wanted, col("t").between(0, 59))
      val lutDf = graft.metrics.Causal.chi2InvMilliLadder(cands.size)
        .zipWithIndex.map { case (q, i) => (i + 1, q) }
        .toDF("rk", "q_milli")
      val bonfMilli = graft.metrics.Causal.chi2InvMilliLadder(cands.size)
        .head
      val scored = graft.metrics.Causal.waldK1(
          graft.metrics.Causal.structuralBetas(mom, linksDf))
        .withColumn("rk", expr(
          """row_number() over (
            |  order by coalesce(t2_milli, -1) desc, pair)""".stripMargin))
        .join(broadcast(lutDf), Seq("rk"))
        .withColumn("k_star", expr(
          "max(case when t2_milli >= q_milli then rk end) over ()"))
        .withColumn("disc_bh",
          (col("rk") <= coalesce(col("k_star"), lit(0L))).cast("int"))
        .withColumn("disc_bonf",
          (col("t2_milli") >= lit(bonfMilli)).cast("int"))
        .localCheckpoint()
      def ruleAgg(rule: String, disc: Column): DataFrame = scored.agg(
        lit(rule).as("rule"),
        count(lit(1)).as("n_hyp"),
        sum(disc).as("n_disc"),
        sum(when(disc === 1 && col("tier") === "ab", 1L).otherwise(0L))
          .as("n_disc_ab"),
        sum(when(disc === 1 && col("tier") === "as", 1L).otherwise(0L))
          .as("n_disc_as"),
        sum(when(disc === 1 && col("tier") === "null", 1L).otherwise(0L))
          .as("n_false"),
        sum(when(col("tier") === "ab", 1L).otherwise(0L)).as("n_ab"),
        sum(when(col("tier") === "as", 1L).otherwise(0L)).as("n_as"))
        .withColumn("fdr_permille", expr(
          """case when n_disc = 0 then 0
            |else (1000 * n_false) div n_disc end""".stripMargin))
        .withColumn("power_as_permille",
          expr("(1000 * n_disc_as) div n_as"))
      ruleAgg("bh", col("disc_bh"))
        .unionByName(ruleAgg("bonferroni", col("disc_bonf")))
    }),

    // MAXIMAL-FAMILY recovery census — D3/D3C, every generative
    // mechanism the catalog owns COMPOSED in one estimator pass:
    // func-transformed links (cos/sin/x²/x³) × trend + CONTINUOUS-time
    // season (evaluated at the irregular timestamps, not the index —
    // the C2 rule) × nearest-lag alignment × MCAR∪block masking ×
    // mixed gaussian/t(3) noise. The kernel's KNOWN deterministic
    // parts are subtracted at dump time with the same JVM Math calls
    // and expression order the kernel uses, func regressors are dumped
    // alongside (both engines read shared bytes — no transcendental is
    // ever recomputed cross-engine), masked cells drop before the
    // fused 4-lag alignment, and the estimator is COMPLETE-CASE with a
    // PER-CONFIG expected-channel count (8 for lag-2 cells, 9 for
    // lag-3/4 — unlike q365's uniform 10). At n=500 with 20-50%
    // per-variable missingness the surviving complete_n runs 48-259,
    // so the census publishes the q365 calibration pair: raw error
    // AND the worst per-link Wald distance from effective truth —
    // thin-n cells are honest about their width instead of claiming
    // tight recovery. 24 graphs (3 lags × 2 MCAR × 2 block rates ×
    // {D3, D3C}) in ONE moment pass.
    "q369_maximal_recovery" -> ((s, d) => {
      val cfgs = Grid.all().filter(c =>
        (c.family == "D3" || c.family == "D3C") && c.nVars == 4
          && c.nPoints == 500 && c.mixRatio == 0.5)
      // kernel formulas (Kernel.scala trend/season precompute): trend =
      // trendStrength·(i+1)·0.5·t; season = seasonalStrength·(sin(2π·
      // τ/12 + φ_i) + 0.5·cos(4π·τ/12 + φ_i)), φ_i = 2πi/8, τ = TIME
      // (continuousSeason). All 24 cells carry trend 0.01 / seasonal
      // 0.5 (grid-pinned); same multiply/divide order as the kernel.
      def trendC(i: Int): Column = lit(0.01 * (i + 1) * 0.5) * col("t")
      def seasonC(i: Int): Column = {
        val phase = 2.0 * math.Pi * i / 8.0
        lit(0.5) * (sin(lit(2.0 * math.Pi) * col("time") / lit(12.0)
            + lit(phase))
          + lit(0.5) * cos(lit(4.0 * math.Pi) * col("time") / lit(12.0)
            + lit(phase)))
      }
      val gen = dumpGen(s, "q369_gen",
        Generate.wideFast(s, cfgs).select(
          Seq(col("configId"), col("t"), col("time"), col("maskBits")) ++
            (1 to 4).map(i =>
              (col(s"X$i") - trendC(i - 1) - seasonC(i - 1))
                .as(s"X${i}t")) ++
            Seq(cos(col("X1") * lit(math.Pi / 2)).as("cX1"),
              cos(col("X2") * lit(math.Pi / 2)).as("cX2"),
              sin(col("X3") * lit(math.Pi / 2)).as("sX3"),
              (col("X4") * col("X4")).as("p2X4"),
              (col("X2") * col("X2") * col("X2")).as("p3X2")): _*))
      val spine = gen.select(col("configId"), col("t"), col("time"))
      val lx = graft.ops.Lagged.nearestLagIndicesView(spine, "t", "time",
        Seq("configId"), Seq(1, 2, 3, 4)).localCheckpoint(false)
      def idsAt(lags: Int*): Seq[Long] =
        cfgs.filter(c => lags.contains(c.maxLag)).map(_.configId)
      def chan(vsName: String, valueCol: String, maskVar: Int, lag: Int,
          cfgIds: Seq[Long]): DataFrame = {
        val base = gen
          .where(col("maskBits").bitwiseAND(lit(1 << (maskVar - 1))) === 0)
          .where(if (cfgIds == null) lit(true)
            else col("configId").isin(cfgIds: _*))
        if (lag == 0)
          base.select(
            concat(col("configId"), lit(s"|$vsName@0")).as("vs"),
            (col("configId") * 8192 + col("t")).as("t"),
            floor(col(valueCol) * 1000).cast("long").as("v"))
        else lx.where(col("lag_mult") === lag).drop("lag_mult")
          .join(base.select(col("configId"), col("t").as("lag_idx"),
            col(valueCol)), Seq("configId", "lag_idx"))
          .select(
            concat(col("configId"), lit(s"|$vsName@$lag")).as("vs"),
            (col("configId") * 8192 + col("t")).as("t"),
            floor(col(valueCol) * 1000).cast("long").as("v"))
      }
      val virtAll = ((1 to 4).map(i =>
          chan(s"X$i~", s"X${i}t", i, 0, null)) ++ Seq(
          chan("p2X4", "p2X4", 4, 0, null),
          chan("p3X2", "p3X2", 2, 0, null),
          chan("sX3", "sX3", 3, 1, null),
          chan("cX1", "cX1", 1, 2, idsAt(2, 3)),
          chan("cX2", "cX2", 2, 3, idsAt(3, 4)),
          chan("cX1", "cX1", 1, 4, idsAt(4))))
        .reduce(_ unionByName _).localCheckpoint(false)
      import s.implicits._
      val expDf = cfgs.map(c =>
        (c.configId, if (c.maxLag == 2) 8L else 9L)).toDF("cfgid", "exp")
      val completeT = virtAll.groupBy("t")
        .agg(count(lit(1)).as("nch"))
        .join(broadcast(expDf), expr("t div 8192") === col("cfgid"))
        .where(col("nch") === col("exp"))
        .select("t")
      val virt = virtAll.join(completeT, Seq("t"))
      val links = d3Links(cfgs)
      val linksDf = links.toDF("g", "family", "max_lag", "mcar_permille",
        "block_permille", "target", "source", "lag", "func", "y", "x",
        "sib", "declared_ppm", "effective_ppm")
      val mom = graft.metrics.Causal.virtualCrossMoments(virt,
        expr("t % 8192 BETWEEN 4 AND 499"), broadcastB = false)
      val diffT2 = expr(
        """case when se2_ppm2 is null or se2_ppm2 <= 0 then null
          |else (1000 * cast(beta_ppm - effective_ppm as decimal(38,0))
          |  * (beta_ppm - effective_ppm)) div se2_ppm2 end""".stripMargin)
      graft.metrics.Causal.structuralInference(
          graft.metrics.Causal.structuralBetas(mom, linksDf))
        .groupBy("family", "max_lag", "mcar_permille", "block_permille")
        .agg(count(lit(1)).as("n_links"),
          expr("sum(abs(beta_ppm - effective_ppm)) div count(1)")
            .as("mean_abs_err_ppm"),
          max(abs(col("beta_ppm") - col("effective_ppm")))
            .as("max_abs_err_ppm"),
          max(diffT2).as("max_diff_t2_milli"),
          min(col("n")).as("complete_n"))
    }),

    // BLOCK-MISSING irregular NONLINEAR recovery census (the LIVE-link
    // missing-data counterpart of q362's all-dead D1 shadow: D2's
    // 4-var cells keep every declared coefficient effective, so this
    // is the census that RECOVERS weights under missingness rather
    // than proving them dead — and D2 is the full composition: block
    // masking × irregular clock × B-family quadratic equations with
    // the §2.4-1 dropped cubic). Regressors are SQUARED nearest-lag
    // channels (the compat kernel applies coef·x² only — d2.py's
    // '+'-split extractor keeps the leading quadratic and silently
    // drops the minus-signed cubic, the same quirk q355 measures on
    // B1); masked cells drop out of BOTH channel kinds BEFORE the
    // per-config alignment, while the alignment spine keeps every t —
    // the generator computes on the full irregular clock and masks at
    // OUTPUT, so lag resolution must read the unmasked grid. The
    // estimator is COMPLETE-CASE: only folded t's where all 10
    // channels co-observe enter the moments, because the Cramer
    // ratios are only n-free when every moment shares ONE window —
    // naive pairwise-complete moments mix n_jy ≈ (1−p)²N with n_jj ≈
    // (1−p)N and attenuate β by ≈(1−p) (measured before the fix:
    // 13-22% mean error GROWING with block rate; complete-case
    // restores it to sampling noise). The published complete_n per
    // config is the honest cost of that choice, and it exposes a real
    // phenomenon: the irregular nearest-lag offset is heavy-tailed
    // (median ~10 indices at this density), so a lag read often lands
    // in the ADJACENT block — whether that block is masked is
    // per-config phase luck (measured: P(source masked at lag idx |
    // row complete) = 86% for one block-0.2 cell vs 5% for its
    // block-0.1 neighbor), collapsing some cells' complete_n from
    // ~19k to ~500. The census therefore publishes BOTH the raw error
    // and max_diff_t2_milli — the worst per-link Wald distance from
    // effective truth under q363's integer inference — pinning that
    // the error is exactly the size the surviving n predicts, not
    // bias. Cells are the 18 D2+D2C gaussian grid cells SENSITIVITY-
    // BOOSTED per the q355 precedent (same equations at n=50,000,
    // σ=0.3: at the catalog's σ=0.1 the x² signal is ~2.5% of the
    // noise sd and statistically invisible). Only squared channels
    // the link set names are emitted, so the moment fan stays ~10
    // channels per config, not 4·(1+lags).
    "q365_block_missing_recovery" -> ((s, d) => {
      val cfgs = Grid.all().filter(c =>
        (c.family == "D2" || c.family == "D2C") && c.nVars == 4
          && c.nPoints == 5000 && c.noiseType == "gaussian")
        .map(_.copy(nPoints = 50000, noiseScale = 0.3))
      val gen = dumpGen(s, "q365_gen",
        Generate.wideFast(s, cfgs)
          .select(Seq(col("configId"), col("t"), col("time")) ++
            (1 to 4).map(i => col(s"X$i")) :+ col("maskBits"): _*))
      def pan(sq: Boolean): DataFrame = (1 to 4).map { i =>
        val v = if (sq) col(s"X$i") * col(s"X$i") else col(s"X$i")
        gen.where(col("maskBits").bitwiseAND(lit(1 << (i - 1))) === 0)
          .select(col("configId"),
            lit(s"X$i" + (if (sq) "p2" else "")).as("series"), col("t"),
            floor(v * 1000).cast("long").as("v"))
      }.reduce(_ unionByName _)
      val panLin = pan(sq = false)
      val panSq = pan(sq = true).localCheckpoint(false)
      val spine = gen.select(col("configId"), col("t"), col("time"))
      val links = cfgs.flatMap(c =>
        weightLinks(c.configId.toString, c.family, 4, c.maxLag))
      val blockOf = cfgs.map(c =>
        c.configId.toString -> math.round(c.blockProb * 1000)).toMap
      def p2(v: String): String = v.replace("@", "p2@")
      import s.implicits._
      val linksDf = links.map(l => (l.g, l.family, l.maxLag,
          blockOf(l.g), l.target, l.source, l.lag, l.y, p2(l.x),
          l.sib.map(p2), l.declaredPpm, l.effectivePpm))
        .toDF("g", "family", "max_lag", "block_permille", "target",
          "source", "lag", "y", "x", "sib", "declared_ppm",
          "effective_ppm")
      // squared channels only where a link reads them: lag -> sources
      val srcByLag = links.map(l => (l.lag, s"${l.source}p2")).distinct
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val virtT = panLin.select(
        concat(col("configId"), lit("|"), col("series"), lit("@0"))
          .as("vs"),
        (col("configId") * 65536L + col("t")).as("t"), col("v"))
      val virtSq0 = panSq
        .where(col("series").isin(srcByLag.getOrElse(0, Nil): _*))
        .select(concat(col("configId"), lit("|"), col("series"),
            lit("@0")).as("vs"),
          (col("configId") * 65536L + col("t")).as("t"), col("v"))
      val lagsK = srcByLag.keys.filter(_ > 0).toSeq.sorted
      // ONE fused alignment pass for all four lags (the per-lag calls
      // each re-sorted the same 900k-row spine)
      val lx = graft.ops.Lagged.nearestLagIndicesView(spine, "t", "time",
        Seq("configId"), lagsK).localCheckpoint(false)
      val virtL = lagsK.map { k =>
        lx.where(col("lag_mult") === k).drop("lag_mult")
          .join(panSq
            .where(col("series").isin(srcByLag(k): _*))
            .select(col("configId"), col("series"),
              col("t").as("lag_idx"), col("v")), Seq("configId", "lag_idx"))
          .select(concat(col("configId"), lit("|"), col("series"),
              lit(s"@$k")).as("vs"),
            (col("configId") * 65536L + col("t")).as("t"), col("v"))
      }
      // checkpoint the union ONCE: both the completeness cut and the
      // moment pass read it, and recomputing it means re-running the
      // alignment joins twice
      val virtAll = (Seq(virtT, virtSq0) ++ virtL).reduce(_ unionByName _)
        .localCheckpoint(false)
      // complete-case cut: the folded t key encodes the config, so one
      // groupBy finds the t's where the full 10-channel frame co-observes
      val completeT = virtAll.groupBy("t")
        .agg(count(lit(1)).as("nch")).where(col("nch") === 10)
        .select("t")
      val virt = virtAll.join(completeT, Seq("t"))
      val mom = graft.metrics.Causal.virtualCrossMoments(virt,
        expr("t % 65536 BETWEEN 4 AND 49999"), broadcastB = false)
      val diffT2 = expr(
        """case when se2_ppm2 is null or se2_ppm2 <= 0 then null
          |else (1000 * cast(beta_ppm - effective_ppm as decimal(38,0))
          |  * (beta_ppm - effective_ppm)) div se2_ppm2 end""".stripMargin)
      graft.metrics.Causal.structuralInference(
          graft.metrics.Causal.structuralBetas(mom, linksDf))
        .groupBy("family", "max_lag", "block_permille")
        .agg(count(lit(1)).as("n_links"),
          expr("sum(abs(beta_ppm - effective_ppm)) div count(1)")
            .as("mean_abs_err_ppm"),
          max(abs(col("beta_ppm") - col("effective_ppm")))
            .as("max_abs_err_ppm"),
          max(diffT2).as("max_diff_t2_milli"),
          min(col("n")).as("complete_n"))
    }),

    // STREAMING INFERENCE (q358's weight monitor upgraded to a
    // significance monitor: the 10th running sum — syy — closes C_yy,
    // hence RSS, σ̂², se² and the Wald verdict, ALL per link per
    // micro-batch from one fixed-size state row; the monitor's
    // emission log is "which edges are statistically real as of each
    // batch"): the A1 n=500 design tuples stream in THREE time-ordered
    // batches (prefix n = 48 / 198 / 398) and the verdicts SHARPEN as
    // evidence arrives — at n=48 only the two strongest links (t² ≈
    // 7.7-10.7) clear the bar, the weakest (X1@2→X4, β = 0.25) flips
    // to significant only at the full n=398, and the §2.4-2 dead
    // X5→X6 link stays non-significant at EVERY prefix while its se²
    // column shrinks ∝1/n — evidence accumulation as hash-checked
    // rows. The
    // oracle replays the batch prefixes and the same from-sums
    // arithmetic (Causal.structuralInferenceFromSums, the streaming
    // twin of q363's operator; stream ≡ batch pinned by spec).
    "q368_stream_inference" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 500 && c.nVars == 6 && c.maxLag == 2 &&
          c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q368_gen",
        Generate.wideFast(s, Seq(cfg)).where(col("t") < 400)
          .select(col("t") +: (1 to 6).map(i => col(s"X$i")): _*))
      val gl = gen
        .join(gen.select(col("t").as("t1") +:
            (1 to 6).map(i => col(s"X$i").as(s"L1X$i")): _*),
          col("t1") === col("t") - 1)
        .join(gen.select(col("t").as("t2") +:
            (1 to 6).map(i => col(s"X$i").as(s"L2X$i")): _*),
          col("t2") === col("t") - 2)
        .where(col("t").between(2, 399))
      def q(series: String, lag: Int): Column =
        floor((if (lag == 0) col(series) else col(s"L$lag$series"))
          * 1000).cast("long")
      val tuples = streamWeightLinks().map { case (k, tgt, src, lag, hs,
          sibSeries, sibLag, _) =>
        gl.select(lit(k).as("link"), q(tgt, 0).as("yv"),
          q(src, lag).as("xv"),
          (if (hs == 1) q(sibSeries, sibLag) else lit(0L)).as("sv"),
          col("t"))
      }.reduce(_ unionByName _)
      val dumpSig = Option(new java.io.File(s"$genDir/q368_gen")
          .listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length()}:${f.lastModified()}")
        .mkString(";")
      val log = graft.streaming.StatefulOps.weightSums2Tws(s, tuples,
        "t", Seq(50L, 200L), s"$genDir/q368_weight_split",
        s"q368:$dumpSig", s"graft_stream_inference_${System.nanoTime()}")
      import s.implicits._
      val linksDf = streamWeightLinks()
        .map(l => (l._1, l._2, l._3, l._4, l._5, l._8))
        .toDF("link", "target", "source", "lag", "has_sib",
          "effective_ppm")
      graft.metrics.Causal.structuralInferenceFromSums(
          graft.metrics.Causal.structuralBetasFromSums(
            log.join(broadcast(linksDf), Seq("link"))))
        .select(col("target"), col("source"), col("lag"), col("n"),
          col("beta_ppm"), col("se2_ppm2"), col("t2_milli"),
          (col("t2_milli") > lit(3841L)).cast("int").as("significant"),
          col("effective_ppm"))
    }),

    // OUT-OF-SAMPLE FORECAST CALIBRATION (the prediction leg of model
    // recovery — every prior query measures the FIT; this measures
    // whether the fitted model's uncertainty is honest out of sample):
    // betas, intercept (via train channel means) and σ̂² are estimated
    // on the FIRST half of the A1 6-var cell, then every second-half
    // row gets a one-step-ahead prediction ŷ = ȳ + Σβ(x−x̄) from REAL
    // lagged values and a 95% interval verdict — all exact integers:
    // D = 10⁶·n·(y−ŷ) and the sqrt-free coverage test
    // 10⁴·D²·(n−k−1) ≤ 38416·10⁶·n·rss keeps every product inside
    // DECIMAL(38,0)/HUGEINT with NO division at all. Per target, 2,500
    // test decisions → cover_permille ≈ 950 on every row INCLUDING the
    // dead-link target X6 (its fitted model is a tiny spurious beta +
    // intercept, and the interval still calibrates because σ̂ absorbed
    // the full noise floor). q357 checks aggregate holdout variance;
    // this is row-level interval calibration with a train-frozen
    // intercept — genuinely out of sample.
    "q367_forecast_calibration" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 5000 && c.nVars == 6 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q367_gen",
        Generate.wideFast(s, Seq(cfg))
          .select(col("t") +: (1 to 6).map(i => col(s"X$i")): _*))
      val panel = (1 to 6).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      val links = weightLinks("", "A1", 6, 2)
      val specs = weightSpecs(links)
      val virt = specs.map { case (series, k) =>
        panel.where(col("series") === series)
          .select(lit(s"$series@$k").as("vs"),
            (col("day") + k).as("t"), col("v"))
      }.reduce(_ unionByName _)
      val momTr = graft.metrics.Causal.virtualCrossMoments(virt,
        col("t").between(2, 2499))
      val binf = graft.metrics.Causal.structuralInference(
        graft.metrics.Causal.structuralBetas(momTr,
          weightLinksDf(s, links)))
      val stats = virt.where(col("t").between(2, 2499))
        .groupBy("vs").agg(count(lit(1)).as("cn"),
          sum(col("v")).as("cs"))
      val test = virt.where(col("t").between(2500, 4999))
      val contrib = binf
        .select(col("target"), col("y"), col("x"), col("beta_ppm"),
          col("k_parents"), col("rss_scaled"), col("n").as("ntr"))
        .join(broadcast(stats.select(col("vs").as("x"),
          col("cn").as("nx"), col("cs").as("sx"))), Seq("x"))
        .join(test.select(col("vs").as("x"), col("t"),
          col("v").as("xv")), Seq("x"))
        .withColumn("dx", expr(
          "cast(beta_ppm as decimal(38,0)) * (nx * xv - sx)"))
        .groupBy("target", "y", "t")
        .agg(sum(col("dx")).as("sdx"), max(col("k_parents")).as("kp"),
          max(col("rss_scaled")).as("rss"), max(col("ntr")).as("ntr"))
      contrib
        .join(broadcast(stats.select(col("vs").as("y"),
          col("cn").as("ny"), col("cs").as("sy"))), Seq("y"))
        .join(test.select(col("vs").as("y"), col("t"),
          col("v").as("yv")), Seq("y", "t"))
        .withColumn("dnum", expr(
          "1000000 * (cast(ny as decimal(38,0)) * yv - sy) - sdx"))
        .withColumn("cover", expr(
          """case when 10000 * dnum * dnum * (ntr - kp - 1)
            |  <= 38416000000 * cast(ntr as decimal(38,0)) * rss
            |then 1L else 0L end""".stripMargin))
        .groupBy("target")
        .agg(max(col("kp")).as("n_parents"),
          count(lit(1)).as("n_test"), sum(col("cover")).as("n_cover"))
        .withColumn("cover_permille",
          expr("(1000 * n_cover) div n_test"))
    }),

    // LAG IDENTIFICATION by integer RSS sweep (model selection on the
    // lag axis — the one structural coordinate no previous query
    // recovers from data: PC finds the skeleton, q351 the weights at
    // the DECLARED lag; this reads the lag itself): for every A1
    // 6-var link, the regressor lag is swept over candidates 0..4
    // with the sibling pinned at its true lag, each variant fit by
    // the same k≤2 Cramer stage, and the variant RSS (10⁶·C_yy −
    // Σβ·C_jy, exact integers) ranked — argmin is the identified lag,
    // ties to the smaller candidate. Every LIVE link identifies its
    // true lag exactly, with the published gap_permille (RSS rise of
    // the runner-up) measuring HOW decisively — 75-207‰ here; the
    // §2.4-2 dead X5→X6 link is the negative control: its RSS profile
    // is flat (gap_permille = 0 — its best_lag is just the tie-break
    // landing on the smallest candidate), so "no identifiable lag" is
    // itself a data read, the deadness surfaced a FIFTH way.
    "q366_lag_identification" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 5000 && c.nVars == 6 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q366_gen",
        Generate.wideFast(s, Seq(cfg))
          .select(col("t") +: (1 to 6).map(i => col(s"X$i")): _*))
      val panel = (1 to 6).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      val links = weightLinks("", "A1", 6, 2)
      val cands = 0 to 4
      val specs = (links.map(l => (l.target, 0)) ++
        links.flatMap(l => cands.map(c => (l.source, c)))).distinct
      import s.implicits._
      val rows = links.flatMap { l =>
        cands.flatMap { c =>
          val vk = s"${l.target}<${l.source}|$c"
          val swept = (vk, l.target, l.source, l.lag, c,
            l.effectivePpm, 1, l.y, s"${l.source}@$c", l.sib)
          val sib = l.sib.map(sv => (vk, l.target, l.source, l.lag, c,
            l.effectivePpm, 0, l.y, sv, Some(s"${l.source}@$c")))
          Seq(swept) ++ sib
        }
      }
      val linksDf = rows.toDF("vk", "target", "source", "true_lag",
        "cand", "effective_ppm", "swept", "y", "x", "sib")
      val mom = graft.metrics.Causal.laggedCrossMoments(
        panel, specs, col("t").between(4, 4999))
      val betas = graft.metrics.Causal.structuralBetas(mom, linksDf)
        .withColumn("rss_scaled", expr(
          """1000000 * cast(cyy as decimal(38,0))
            |  - sum(cast(beta_ppm as decimal(38,0)) * cjy)
            |      over (partition by vk)""".stripMargin))
        .where(col("swept") === 1)
      betas
        .withColumn("rk", expr(
          """row_number() over (partition by target, source
            |  order by rss_scaled, cand)""".stripMargin))
        .withColumn("next_rss", expr(
          """lead(rss_scaled, 1) over (partition by target, source
            |  order by rss_scaled, cand)""".stripMargin))
        .where(col("rk") === 1)
        .select(col("target"), col("source"), col("true_lag"),
          col("effective_ppm"), col("cand").as("best_lag"),
          (col("cand") === col("true_lag")).cast("int").as("identified"),
          expr("((next_rss - rss_scaled) * 1000 div rss_scaled)")
            .cast("long").as("gap_permille"))
    }),

    // COEFFICIENT-LEVEL INFERENCE (the fourth leg of model recovery:
    // structure — the PC suite; weights — q351; noise scale — q354;
    // this adds the Wald test that says which recovered weights are
    // STATISTICALLY real): exact-integer standard errors and t² per
    // link from the SAME six centered moments — no second data pass,
    // every division the shared truncating div, so both engines agree
    // bitwise (Causal.structuralInference / structuralInferenceSqlCtes).
    // On the A1 6-var cell the live links separate from the §2.4-2 dead
    // X5→X6 link (declared 0.85, never applied) by orders of magnitude
    // in t², and the published `significant` flag is the 5% Wald verdict
    // (t² > 3.841) — the quirk surfaced a fourth way: as a hypothesis-
    // test decision, not just a small beta.
    "q363_beta_ttest" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 5000 && c.nVars == 6 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q363_gen",
        Generate.wideFast(s, Seq(cfg))
          .select(col("t") +: (1 to 6).map(i => col(s"X$i")): _*))
      val panel = (1 to 6).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      val links = weightLinks("", "A1", 6, 2)
      val mom = graft.metrics.Causal.laggedCrossMoments(
        panel, weightSpecs(links), col("t").between(2, 4999))
      graft.metrics.Causal.structuralInference(
          graft.metrics.Causal.structuralBetas(mom,
            weightLinksDf(s, links)))
        .select(col("target"), col("source"), col("lag"), col("beta_ppm"),
          col("effective_ppm"), col("k_parents"), col("se2_ppm2"),
          col("t2_milli"),
          (col("t2_milli") > lit(3841L)).cast("int").as("significant"))
    }),

    // inference census at CORPUS grain (q352's 18-graph fold through the
    // Wald readout): the full A1+A1C gaussian n=5000 cell in ONE moment
    // pass, each link's t² thresholded at the 5% critical value and
    // scored per config against the EFFECTIVE truth as a STRUCTURE
    // decision — live links should test significant, §2.4-2-dead ones
    // should not. Measured: 18/18 configs classify every link correctly
    // (n_sig_live = n_live, n_sig_dead = 0; min live t² ≥ 42× the
    // critical value, max dead t² below it), U-confounded A1C cells
    // included (U is white and contemporaneous-only: it widens se²
    // without manufacturing dead-link significance). n_cover is the
    // companion CALIBRATION read — the sqrt-free 95% Wald interval
    // covers the effective truth on 154/163 links ≈ 94.5%, right at
    // nominal. Structure recovery by hypothesis testing alone, as
    // hash-checked rows.
    "q364_inference_census" -> ((s, d) => {
      val cfgs = Grid.all().filter(c =>
        (c.family == "A1" || c.family == "A1C") && c.nPoints == 5000
          && c.noiseType == "gaussian")
      val gen = dumpGen(s, "q364_gen",
        Generate.wideFast(s, cfgs)
          .select(Seq(col("configId"), col("t")) ++
            (1 to 8).map(i => col(s"X$i")): _*))
      val panel = (1 to 8).map(i =>
        gen.where(col(s"X$i").isNotNull)
          .select(concat(col("configId"), lit(s"|X$i")).as("series"),
            (col("configId") * 8192 + col("t")).as("day"),
            floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      val links = cfgs.flatMap(c =>
        weightLinks(c.configId.toString, c.family, c.nVars, c.maxLag))
      val mom = graft.metrics.Causal.laggedCrossMoments(
        panel, weightSpecs(links),
        expr("t % 8192 BETWEEN 4 AND 4999"), broadcastB = false)
      val live = col("effective_ppm") =!= 0
      val sig = col("t2_milli") > lit(3841L)
      // CI calibration read the sqrt-free way: the 95% Wald interval
      // covers the effective truth iff the diff's own Wald statistic
      // (1000·(β−eff)² div se²) stays at or under the same critical
      // value — integer arithmetic only, shared by both engines
      val cover = col("se2_ppm2").isNotNull && col("se2_ppm2") > 0 &&
        expr("""(1000 * cast(beta_ppm - effective_ppm as decimal(38,0))
               |  * (beta_ppm - effective_ppm)) div se2_ppm2"""
          .stripMargin) <= lit(3841L)
      graft.metrics.Causal.structuralInference(
          graft.metrics.Causal.structuralBetas(mom,
            weightLinksDf(s, links)))
        .groupBy("family", "n_vars", "max_lag")
        .agg(count(lit(1)).as("n_links"),
          sum(when(live, 1L).otherwise(0L)).as("n_live"),
          sum(when(live && sig, 1L).otherwise(0L)).as("n_sig_live"),
          sum(when(!live && sig, 1L).otherwise(0L)).as("n_sig_dead"),
          sum(when(cover, 1L).otherwise(0L)).as("n_cover"),
          min(when(live, col("t2_milli"))).as("min_live_t2_milli"),
          max(when(!live, col("t2_milli"))).as("max_dead_t2_milli"))
    }),

    // SEASONAL/NONLINEAR weight recovery with deterministic-component
    // adjustment (the C-family member — trend + season + cos/sin/power
    // links, the full generative vocabulary through one estimator):
    // the kernel's KNOWN deterministic parts (trend_i = 0.01·(i+1)·
    // 0.5·t; season_i = 0.5·(sin(2πt/12+φ_i)+0.5·cos(4πt/12+φ_i)),
    // φ_i = 2πi/8 — same JVM Math calls as the kernel) are subtracted
    // AT DUMP TIME alongside the func-transformed regressors, so the
    // oracle reads shared bytes and never recomputes a transcendental.
    // One moment pass carries BOTH target variants: the detrended
    // betas recover every live coefficient (cos/sin/x²/x³ alike) and
    // read the ListOrder-dead X5→X6 link (declared 0.85, its sin term
    // evaluated before X5 exists) at ≈0 — the one dead-rule the corr
    // audit cannot pin (the shared trend correlates all C series);
    // the NAIVE twin regressed on raw targets shows what skipping the
    // adjustment costs, per link, as data. n=500 cell: the trending
    // power channels (X4² ≈ 256 max here) keep every moment inside
    // the LONG/decimal budget that n=5000's t²-grown values would blow.
    "q361_seasonal_recovery_contrast" -> ((s, d) => {
      val cfg = Grid.forFamily("C1").find(c =>
        c.nPoints == 500 && c.nVars == 6 && c.maxLag == 2).get
      val links = c1Links()
      def trendC(i: Int): Column = lit(0.01 * (i + 1) * 0.5) * col("t")
      def seasonC(i: Int): Column = {
        val phase = 2.0 * math.Pi * i / 8.0
        lit(0.5) * (sin(lit(2.0 * math.Pi) * col("t") / lit(12.0)
            + lit(phase))
          + lit(0.5) * cos(lit(4.0 * math.Pi) * col("t") / lit(12.0)
            + lit(phase)))
      }
      val halfPi = math.Pi / 2.0
      val gen = dumpGen(s, "q361_gen",
        Generate.wideFast(s, Seq(cfg)).select(
          Seq(col("t")) ++
            (1 to 6).map(i => col(s"X$i")) ++
            (1 to 6).map(i => (col(s"X$i") - trendC(i - 1) -
              seasonC(i - 1)).as(s"X${i}t")) ++
            (1 to 6).flatMap(i => Seq(
              cos(col(s"X$i") * lit(halfPi)).as(s"cX$i"),
              sin(col(s"X$i") * lit(halfPi)).as(s"sX$i"),
              (col(s"X$i") * col(s"X$i")).as(s"p2X$i"),
              (col(s"X$i") * col(s"X$i") * col(s"X$i")).as(s"p3X$i"))): _*))
      // virtual channels: detrended + naive targets at lag 0, transformed
      // regressors at their link lags — one moment pass for both variants
      def ch(colName: String, vs: String, lag: Int): DataFrame =
        gen.select(lit(vs).as("vs"), (col("t") + lag).as("t"),
          floor(col(colName) * 1000).cast("long").as("v"))
      val targets = (1 to 6).flatMap(i => Seq(
        ch(s"X${i}t", s"X$i~@0", 0), ch(s"X$i", s"X$i@0", 0)))
      val regs = links.map(l => (l._5.split("@")(0), l._5, l._3))
        .distinct.map { case (series, vs, lag) => ch(series, vs, lag) }
      val virt = (targets ++ regs).reduce(_ unionByName _)
      val mom = graft.metrics.Causal.virtualCrossMoments(virt,
        col("t").between(2, 499))
      import s.implicits._
      def linksDf(naive: Boolean): DataFrame = links.map { l =>
        val y = if (naive) s"${l._1}@0" else l._6
        (l._1, l._2, l._3, l._4, y, l._5, l._7, l._8, l._9)
      }.toDF("target", "source", "lag", "func", "y", "x", "sib",
        "declared_ppm", "effective_ppm")
      val det = graft.metrics.Causal.structuralBetas(mom, linksDf(false))
        .select(col("target"), col("source"), col("lag"), col("func"),
          col("declared_ppm"), col("effective_ppm"),
          col("beta_ppm").as("beta_detrended_ppm"))
      val nai = graft.metrics.Causal.structuralBetas(mom, linksDf(true))
        .select(col("target"), col("source"), col("lag"),
          col("beta_ppm").as("beta_naive_ppm"))
      det.join(nai, Seq("target", "source", "lag"))
    }),

    // IRREGULAR weight recovery at CORPUS grain (q356's fold, q352's
    // discipline, per-config nearest-lag alignment): A2's 4-var
    // gaussian cells (3 lags) plus ALL NINE A2C gaussian cells — the
    // reference's most extreme quirk read through the estimator: A2C's
    // extractor drops every link ('e' in rhs, a2c.py:226-251), so the
    // family generates PURE NOISE while its truth dict declares edges;
    // Parser.effectiveLinks' compiled-dep presence rule zeroes them
    // all, and the census shows n_dead = n_links with betas at noise
    // grain for every A2C config. The alignment is per config:
    // nearestLagIndexView(partitionCols = configId, lagMult = k) for
    // every link lag, each config's own meanDiff — then ONE folded
    // moment pass (shuffle path) + ONE Cramer stage. A2 6/8-var cells
    // are deliberately excluded: their value-≠0 rule CASCADES the dead
    // X5→X6 link into constant-zero X6/X7 series whose lagged reads
    // leak only the first max_lag noise rows — a ratio-of-tiny-moments
    // regime documented here rather than published as a stable census.
    "q360_irregular_recovery_census" -> ((s, d) => {
      val cfgs = Grid.all().filter(c =>
        ((c.family == "A2" && c.nVars == 4) || c.family == "A2C")
          && c.nPoints == 5000 && c.noiseType == "gaussian")
      val gen = dumpGen(s, "q360_gen",
        Generate.wideFast(s, cfgs)
          .select(Seq(col("configId"), col("t"), col("time")) ++
            (1 to 8).map(i => col(s"X$i")): _*))
      val pan = (1 to 8).map(i =>
        gen.where(col(s"X$i").isNotNull)
          .select(col("configId"), lit(s"X$i").as("series"), col("t"),
            floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _).localCheckpoint(false)
      val spine = gen.select(col("configId"), col("t"), col("time"))
      val links = cfgs.flatMap(c =>
        weightLinks(c.configId.toString, c.family, c.nVars, c.maxLag))
      val lagsNeeded = links.map(_.lag).filter(_ > 0).distinct.sorted
      val virtT = pan.select(
        concat(col("configId"), lit("|"), col("series"), lit("@0"))
          .as("vs"),
        (col("configId") * 8192 + col("t")).as("t"), col("v"))
      // ONE fused alignment pass for all lags (the per-lag calls each
      // re-sorted the same spine — the q365 lesson applied here too)
      val lxAll = graft.ops.Lagged.nearestLagIndicesView(spine, "t",
        "time", Seq("configId"), lagsNeeded).localCheckpoint(false)
      val virtL = lagsNeeded.map { k =>
        lxAll.where(col("lag_mult") === k).drop("lag_mult")
          .join(pan.select(col("configId"), col("series"),
            col("t").as("lag_idx"), col("v")), Seq("configId", "lag_idx"))
          .select(concat(col("configId"), lit("|"), col("series"),
              lit(s"@$k")).as("vs"),
            (col("configId") * 8192 + col("t")).as("t"), col("v"))
      }
      val virt = (virtT +: virtL).reduce(_ unionByName _)
      val mom = graft.metrics.Causal.virtualCrossMoments(virt,
        expr("t % 8192 BETWEEN 4 AND 4999"), broadcastB = false)
      graft.metrics.Causal.structuralBetas(mom, weightLinksDf(s, links))
        .groupBy("family", "n_vars", "max_lag")
        .agg(count(lit(1)).as("n_links"),
          sum(when(col("effective_ppm") === 0, 1L).otherwise(0L))
            .as("n_dead"),
          expr("sum(abs(beta_ppm - effective_ppm)) div count(1)")
            .as("mean_abs_err_ppm"),
          max(abs(col("beta_ppm") - col("effective_ppm")))
            .as("max_abs_err_ppm"))
    }),

    // weight recovery at deployment WIDTH through the PAIR-RESTRICTED
    // moment path (the O(links)-not-O(p²) form): 63 chain links over
    // the 64-series wide panel (q346's dataset family), where the
    // dense Gram would fan every t out 64² ways to feed a k=1 Cramer
    // stage that reads 127 pairs — virtualCrossMomentsSparse routes
    // the wanted-pair frame into the join BEFORE aggregation, and the
    // weightwide bench pair measures the dense-vs-sparse gap at
    // p=256. Output is the full 63-link contemporaneous beta census,
    // bitwise against the oracle's identical sparse CTE chain; the
    // spec pins sparse ≡ dense-restricted on shared inputs.
    "q359_weight_recovery_wide" -> ((s, d) => {
      val pan = dumpGen(s, "q359_panel", Bench.widePanel(s, 64, 10000))
      import s.implicits._
      def nm(i: Int) = f"X$i%02d"
      val links = (1 until 64).map(i => (nm(i), nm(i - 1), 0,
        s"${nm(i)}@0", s"${nm(i - 1)}@0", None: Option[String]))
      val linksDf = links
        .toDF("target", "source", "lag", "y", "x", "sib")
      val virt = pan.select(concat(col("series"), lit("@0")).as("vs"),
        col("day").as("t"), col("v"))
      val wanted = links.flatMap { l =>
        val (a, b) = if (l._5 <= l._4) (l._5, l._4) else (l._4, l._5)
        Seq((l._4, l._4), (l._5, l._5), (a, b))
      }.distinct.toDF("na", "nb")
      graft.metrics.Causal.structuralBetas(
          graft.metrics.Causal.virtualCrossMomentsSparse(virt, wanted,
            col("t").between(0, 9999)),
          linksDf)
        .select(col("target"), col("source"), col("beta_ppm"))
    }),

    // STREAMING weight recovery (the estimation sibling of q344's
    // streaming Granger monitor: edge WEIGHTS that update as data
    // arrives): the A1 6-var cell's design tuples — per link (y at t,
    // x at t−lag, sibling at its own lag, 0 when none) — stream in 2
    // time-ordered micro-batches through transformWithState whose
    // per-link state is the 9 mergeable design sums; each batch emits
    // prefix sums and the beta stays in the ONE shared
    // Causal.structuralBetasFromSums, so the emission log is "the edge
    // weights as of each batch" (n=198 prefix rows, then n=398 full
    // rows — 14 rows, estimates visibly tightening toward the
    // effective truth as evidence accumulates). Oracle replays the
    // emission model with q344's batch-prefix fold and the same shared
    // beta CTE; spec pins stream ≡ batch against laggedCrossMoments +
    // structuralBetas on the full window.
    "q358_stream_weight_recovery" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 500 && c.nVars == 6 && c.maxLag == 2 &&
          c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q358_gen",
        Generate.wideFast(s, Seq(cfg)).where(col("t") < 400)
          .select(col("t") +: (1 to 6).map(i => col(s"X$i")): _*))
      val gl = gen
        .join(gen.select(col("t").as("t1") +:
            (1 to 6).map(i => col(s"X$i").as(s"L1X$i")): _*),
          col("t1") === col("t") - 1)
        .join(gen.select(col("t").as("t2") +:
            (1 to 6).map(i => col(s"X$i").as(s"L2X$i")): _*),
          col("t2") === col("t") - 2)
        .where(col("t").between(2, 399))
      def q(series: String, lag: Int): Column =
        floor((if (lag == 0) col(series) else col(s"L$lag$series"))
          * 1000).cast("long")
      val tuples = streamWeightLinks().map { case (k, tgt, src, lag, hs,
          sibSeries, sibLag, _) =>
        gl.select(lit(k).as("link"), q(tgt, 0).as("yv"),
          q(src, lag).as("xv"),
          (if (hs == 1) q(sibSeries, sibLag) else lit(0L)).as("sv"),
          col("t"))
      }.reduce(_ unionByName _)
      val dumpSig = Option(new java.io.File(s"$genDir/q358_gen")
          .listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length()}:${f.lastModified()}")
        .mkString(";")
      val log = graft.streaming.StatefulOps.weightSumsTws(s, tuples,
        "t", 200L, s"$genDir/q358_weight_split", s"q358:$dumpSig",
        s"graft_stream_weights_${System.nanoTime()}")
      import s.implicits._
      val linksDf = streamWeightLinks()
        .map(l => (l._1, l._2, l._3, l._4, l._5, l._8))
        .toDF("link", "target", "source", "lag", "has_sib",
          "effective_ppm")
      graft.metrics.Causal.structuralBetasFromSums(
          log.join(broadcast(linksDf), Seq("link")))
        .select(col("target"), col("source"), col("lag"), col("n"),
          col("beta_ppm"), col("effective_ppm"))
    }),

    // HOLDOUT-validated weight recovery (the train/test discipline the
    // text pipeline applies to samplers — q93's leakage-safe split —
    // applied to the estimation layer): betas fit on the clock's FIRST
    // half only, then scored on the SECOND half via the exact quadratic
    // form over TEST-window moments — SSE_test = C_yy + Σ_j [β_j²·C_jj
    // + β_j·β_sib·C_j,sib − 2·β_j·C_jy] (each link row contributes its
    // own square and its half of the single cross term, so the k=2 sum
    // closes without a dedicated pair stage) — everything integer with
    // declared truncation points, both engines bitwise. The pinned
    // claim: σ̂²_test/σ̂²_train stays within a few percent of 1000‰ on
    // every target (k ≤ 2 on n=2500 cannot overfit) AND both halves sit
    // on the generator's exact 10⁴ noise floor — the estimator
    // GENERALIZES, it does not memorize its window.
    "q357_weight_recovery_holdout" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 5000 && c.nVars == 6 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q357_gen",
        Generate.wideFast(s, Seq(cfg))
          .select(col("t") +: (1 to 6).map(i => col(s"X$i")): _*))
      val panel = (1 to 6).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      val links = weightLinks("", "A1", 6, 2)
      val momTr = graft.metrics.Causal.laggedCrossMoments(
        panel, weightSpecs(links), col("t").between(2, 2499))
      val momTe = graft.metrics.Causal.laggedCrossMoments(
        panel, weightSpecs(links), col("t").between(2500, 4999))
      val bt = graft.metrics.Causal.structuralBetas(
          momTr, weightLinksDf(s, links))
        .select(col("target"), col("y"), col("x"), col("sib"),
          col("beta_ppm"), col("n").as("ntr"), col("cyy").as("cyytr"),
          col("cjy").as("cjytr"))
      val bsib = bt.join(
        bt.select(col("target").as("target2"), col("x").as("sib2"),
          col("beta_ppm").as("beta_sib0")),
        col("target2") === col("target") && col("sib2") === col("sib"),
        "left").drop("target2", "sib2")
        .withColumn("beta_sib", coalesce(col("beta_sib0"), lit(0L)))
      def lookTe(df: DataFrame, k1: String, k2: String, out: String,
          withN: Boolean = false): DataFrame = {
        val cols = (if (withN) Seq(col("n").as("nte")) else Nil) :+
          col("c").as(out)
        df.join(broadcast(momTe.select(col("na") +: col("nb") +: cols: _*)),
          least(col(k1), col(k2)) === col("na") &&
            greatest(col(k1), col(k2)) === col("nb"), "left")
          .drop("na", "nb")
      }
      val tj = lookTe(lookTe(lookTe(lookTe(bsib,
        "y", "y", "cyyte", withN = true), "x", "x", "cjjte"),
        "x", "y", "cjyte"), "x", "sib", "cjste")
      tj.groupBy("target")
        .agg(count(lit(1)).as("n_parents"),
          expr("""(1000000 * max(cast(cyytr as decimal(38,0)))
                 |  - sum(cast(beta_ppm as decimal(38,0)) * cjytr))
                 |div (1000000 * max(cast(ntr as decimal(38,0))) * max(ntr))"""
            .stripMargin).cast("long").as("sigma2_train_v"),
          expr("""(max(cast(cyyte as decimal(38,0)))
                 |  + sum(
                 |    (cast(beta_ppm as decimal(38,0)) * beta_ppm * cjjte)
                 |      div 1000000000000
                 |    + (cast(beta_ppm as decimal(38,0)) * beta_sib
                 |        * coalesce(cjste, 0)) div 1000000000000
                 |    - (2 * cast(beta_ppm as decimal(38,0)) * cjyte)
                 |      div 1000000))
                 |div (max(cast(nte as decimal(38,0))) * max(nte))"""
            .stripMargin).cast("long").as("sigma2_test_v"))
        .withColumn("ratio_permille", expr(
          """case when sigma2_train_v = 0 then 0
            |else (1000 * sigma2_test_v) div sigma2_train_v end"""
            .stripMargin).cast("long"))
    }),

    // weight recovery under IRREGULAR sampling (the A2 member of the
    // recovery suite — and a semantic trap made into a test: A2's
    // kernel resolves lags by NEAREST-index-to-(t_now − k·meanDiff)
    // over past rows, a2.py:162-167, NOT by as-of/backward lookup, so
    // an estimator aligned any other way is misspecified by
    // construction). The design matrix is built with the generator's
    // own rule — Lagged.nearestLagIndexView at lagMult 1 and 2, q314's
    // operator — feeding the SAME moment+Cramer machinery through the
    // virtualCrossMoments split (the grangerSumsFromLagged discipline).
    // All four links recover their declared coefficients; the two
    // contemporaneous ones need no alignment at all and pin that the
    // lag-0 path is untouched by the irregular clock.
    "q356_weight_recovery_irregular" -> ((s, d) => {
      val cfg = Grid.forFamily("A2").find(c =>
        c.nPoints == 5000 && c.nVars == 4 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q356_gen",
        Generate.wideFast(s, Seq(cfg))
          .select(col("t") +: col("time") +:
            (1 to 4).map(i => col(s"X$i")): _*))
      val pan = (1 to 4).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _).localCheckpoint(false)
      val spine = gen.select(col("t"), col("time"))
      val virtTargets = pan.select(
        concat(col("series"), lit("@0")).as("vs"), col("t"), col("v"))
      val virtLags = Seq(1, 2).map { k =>
        // snap the union+sort alignment lineage (q314's rationale)
        val lx = graft.ops.Lagged.nearestLagIndexView(
          spine, "t", "time", lagMult = k).localCheckpoint(false)
        lx.join(broadcast(pan.select(col("series"),
            col("t").as("lag_idx"), col("v"))), Seq("lag_idx"))
          .select(concat(col("series"), lit(s"@$k")).as("vs"), col("t"),
            col("v"))
      }
      val virt = (virtTargets +: virtLags).reduce(_ unionByName _)
      val links = weightLinks("", "A2", 4, 2)
      graft.metrics.Causal.structuralBetas(
          graft.metrics.Causal.virtualCrossMoments(virt,
            col("t").between(2, 4999)),
          weightLinksDf(s, links))
        .select(col("target"), col("source"), col("lag"), col("beta_ppm"),
          col("declared_ppm"), col("effective_ppm"),
          abs(col("beta_ppm") - col("effective_ppm")).as("abs_err_ppm"))
    }),

    // one-way ANOVA across the event-type series (the k-group member of
    // the two-sample test family q280/q156): between/within sums of
    // squares from per-group integer moments — B = Σ_g (S_g·N − S·n_g)²
    // div n_g (N²-scaled SSB) and W = Σ_g (n_g·Q_g − S_g²) div n_g
    // (exact SSW up to the declared per-group div), F decision
    // cross-multiplied at the 5% F(4,∞) value 2.372:
    // 1000·(N−k)·B > 2372·(k−1)·W·N². Panel-grain only — magnitudes are
    // corpus-scale-invariant (the daily-means rule)
    "q326_anova_oneway" -> ((s, d) =>
      graft.metrics.Causal.anovaOneWay(
        graft.metrics.Causal.dailyMeanPanel(events(s, d)))),

    // Kruskal-Wallis rank test (q326's distribution-free sibling, the
    // k-group extension of ranked two-sample comparisons): global panel
    // ranks via one row_number with the (v, series, day) total
    // tie-break, per-group rank sums, H cross-multiplied against χ²₄ at
    // 5% (9.488): 1000·(12·Σ(R_g² div n_g) − 3·(N+1)²·N) >
    // 9488·N·(N+1). Rank magnitudes are bounded by the panel day count
    // — every product is small-LONG at any corpus scale
    "q327_kruskal_wallis" -> ((s, d) =>
      graft.metrics.Causal.kruskalWallis(
        graft.metrics.Causal.dailyMeanPanel(events(s, d)))),

    // Nelson-Aalen cumulative hazard (the estimator dual of q292's
    // Kaplan-Meier survival curve, same cohort contract): per event time
    // the ppm hazard increment (d·1e6) div n_risk, accumulated by one
    // cumulative window — no product fold needed, so unlike KM the curve
    // is a plain running sum. Shares the at-risk derivation verbatim
    "q328_nelson_aalen" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"),
        col("event_type"))
      val horizon = ev.agg(max("day").as("hz"))
      val users = ev.groupBy("user_id")
        .agg(min("day").as("origin"),
          min(when(col("event_type") === "purchase", col("day")))
            .as("pday"))
        .crossJoin(broadcast(horizon))
        .select(
          coalesce(col("pday") - col("origin"),
            col("hz") - col("origin")).as("t"),
          col("pday").isNotNull.cast("int").as("ev"))
      val times = users.groupBy("t")
        .agg(sum("ev").as("d"), count(lit(1)).as("c"))
      val wt = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
      val tot = users.agg(count(lit(1)).as("ntot"))
      val wc = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      times.crossJoin(broadcast(tot))
        .select(col("t"), col("d"),
          (col("ntot") - coalesce(sum("c").over(wt), lit(0L)))
            .as("n_risk"))
        .where(col("d") > 0)
        .select(col("t"), col("n_risk"), col("d"),
          sum(expr("(d * 1000000) div n_risk")).over(wc)
            .as("cum_hazard_ppm"))
    }),

    // PC skeleton under a HIDDEN confounder (q300's A1C sibling and
    // q313's undirected dual): generate A1C but observe only X1..X4 —
    // U's contemporaneous fan-in leaves extra dependence the skeleton
    // cannot separate, so `edge` flags surface against truth_adj = 0
    // rows built from the catalog's X-X adjacencies alone. Same 200-obs
    // window (the rank-moment n⁴ cap) and shared PC CTEs as q300
    "q329_pc_confounded" -> ((s, d) => {
      val cfg = Grid.forFamily("A1C").find(c =>
        c.nPoints == 500 && c.nVars == 4 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q329_gen",
        Generate.wideFast(s, Seq(cfg)).where(col("t") < 200)
          .select(col("t"), col("X1"), col("X2"), col("X3"), col("X4")))
      val panel = (1 to 4).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      graft.metrics.Causal.pcSkeleton(panel)
        .withColumn("truth_adj", expr(pcTruthCase("A1C")))
    }),

    // multi-lag generation→discovery capstone (the r8 verdict's "next
    // rung": q269/q313/q314 test Granger at lag 1 only, while the
    // catalog declares effects at lags up to 4, a1.py:310-313): A1
    // 4-var lag-4 panel, ORDER-4 Granger — y_t on 4 own lags vs + 4
    // cause lags, 8 sequential Frisch-Waugh eliminations over the 9×9
    // centered-moment integer matrix, joint F(4, n−9) decided
    // cross-multiplied. truth_any flags pairs with a declared X-edge at
    // ANY lag 1..4 — the cells a lag-1-only test structurally misses
    "q330_granger_multilag" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 5000 && c.nVars == 4 && c.maxLag == 4
          && c.noiseType == "gaussian").get
      val gen = dumpGen(s, "q330_gen",
        Generate.wideFast(s, Seq(cfg))
          .select(col("t"), col("X1"), col("X2"), col("X3"), col("X4")))
      val panel = (1 to 4).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      graft.metrics.Causal.grangerMulti(panel, 4)
        .withColumn("truth_any",
          expr(grangerTruthCaseAnyLag("A1", 4, 4)))
    }),

    // full 64×64 centered-covariance census of the embedding table — the
    // wide-k dataset variant of q88's 3-column CovMatrix (a 64-dim matrix
    // via q88's per-pair agg expressions would be the 2,145-expression
    // driver explosion q317 retired): ONE CovVec.suffStats typed
    // aggregate (single sufficient-statistics row over the wire), cells
    // decoded through a 2,080-row broadcast index, reported at the
    // scale-stable n²-normalized grain c div n² (micro² units, ≤~1e12 —
    // BIGINT-safe at any corpus size where raw c is not)
    "q331_embedding_covariance" -> ((s, d) => {
      pcaCovCells(s, d)
        .select(col("da").cast("long").as("da"),
          col("db").cast("long").as("db"),
          expr("cast(c div (n * n) as long)").as("cov_n2"))
    }),

    // spectral summary of the embedding covariance (the dimensionality-
    // choice statistic a curation pipeline reads before projecting):
    // top-eigenvalue estimate as the exact-integer Rayleigh quotient
    // λ₁ = (wᵀCw) div (wᵀw) of q317's converged ppm component over
    // q331's n²-normalized cells, the total variance as the trace, and
    // the explained-variance ratio in permille. Normalizing each cell by
    // n² BEFORE the w products keeps every term ≤ ~1e24 and the 4,096-
    // cell sum ≤ ~4e27 at ANY corpus size (the raw-c formulation would
    // pass 10³⁸ near sf1); all panel-grain arithmetic on broadcast
    // frames — the fact passes are the two shared PCA aggregates
    "q335_pca_spectrum" -> ((s, d) => {
      // ONE combined aggregate pass (CovVec.statsAndComponentRow) yields
      // the matrix AND the component — the separate q317/q331 helpers
      // would each scan the fact table, doubling the only fact-scale cost
      val row = graft.ops.CovVec.statsAndComponentRow(
        embeddings(s, d), pcaQuant, 64, PcaIters).localCheckpoint(false)
      val w = row.select(posexplode(col("warr")).as(Seq("dim", "w")))
      val cells = covCellsFrom(s,
          row.select(posexplode(col("ss")).as(Seq("pos", "v")))
            .select(col("pos"), col("v").cast("decimal(38,0)").as("v")))
        .select(col("da"), col("db"), expr("c div (n * n)").as("cn2"))
      val rq = cells
        .join(broadcast(w.select(col("dim").as("da"), col("w").as("wa"))),
          Seq("da"))
        .join(broadcast(w.select(col("dim").as("db"), col("w").as("wb"))),
          Seq("db"))
        // cn2 is LONG (`div` output) — widen BEFORE the two w products
        // (≤1e12·1e6·1e6 = 1e24 > LONG); DuckDB's `//` is already HUGEINT
        .agg(sum(expr("cast(cn2 as decimal(38,0)) * wa * wb")).as("num"))
      val den = w.agg(sum(expr("w * w")).as("den"))
      val tr = cells.where(col("da") === col("db"))
        .agg(sum(col("cn2")).as("trace_n2"))
      rq.crossJoin(broadcast(den)).crossJoin(broadcast(tr))
        .select(col("trace_n2").cast("long").as("trace_n2"),
          expr("num div den").cast("long").as("lambda1_n2"),
          expr("case when trace_n2 = 0 then 0 else " +
            "(1000 * (num div den)) div trace_n2 end").cast("long")
            .as("explained_permille"))
    }),

    // PC with the ORIENTATION phase (q300's skeleton stops at the
    // undirected graph; the reference's consumers emit directed graphs
    // and its structural SHD charges reversals): v-structures from the
    // skeleton's own order-≤1 sepset decisions + 3 full-Meek rounds
    // (rules 1-3 — complete absent background knowledge, Meek 1995;
    // Causal.pcOrient, conflict-cancel pinned), the resulting CPDAG
    // expanded to directed edge rows (undirected → both directions) and
    // scored orientation-aware against the catalog's declared A1 edges
    // through the SAME Metrics.scoreAll one-pass join the 1M-graph panel
    // path uses — fact-scale work is only the skeleton's rank moments
    "q332_pc_orientation_scored" -> ((s, d) => {
      val cfg = Grid.forFamily("A1").find(c =>
        c.nPoints == 500 && c.nVars == 4 && c.maxLag == 2
          && c.noiseType == "gaussian").get
      // same 200-point cut as q300 (the rank-moment n⁴ cap: the order-1
      // CI test squares products of ~n⁴ C-statistics, so n = 500 would
      // pass the 10³⁸ budget in BOTH engines) but τ = 0.1 instead of
      // q300's 0.25: the denser skeleton admits shared-node triples, so
      // the v-structure + Meek stages decide real orientations here
      val gen = dumpGen(s, "q332_gen",
        Generate.wideFast(s, Seq(cfg)).where(col("t") < 200)
          .select(col("t"), col("X1"), col("X2"), col("X3"), col("X4")))
      val panel = (1 to 4).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
        .reduce(_ unionByName _)
      pcScoreOriented(s,
        graft.metrics.Causal.pcOrient(
          graft.metrics.Causal.pcSkeleton(panel, PcOrientTauSqBp),
          PcMeekRounds),
        PcDirectedTruth)
    }),

    // PC skeleton to conditioning ORDER 2 (q300/q332 stop at order 1;
    // the reference's PC consumers condition to higher orders, and a
    // 6-var A1 cell — cycle X1→X4→X3→X2→X1 plus X4↔X5 feedback —
    // leaves chained spurious pairs that no SINGLE conditioner
    // separates): Causal.pcSkeleton2's cofactor identity
    // ρ²_ab·{z,w} = cof_ab²/(cof_aa·cof_bb) on n²-normalized rank
    // moments, exact integers end-to-end, every order-2 structure
    // panel-grain on broadcast frames — the one fact-scale pass is the
    // shared rank cross-moment aggregate
    "q336_pc_order2_scored" -> ((s, d) =>
      graft.metrics.Causal.pcSkeleton2(pcOrder2Panel(s), Pc2TauSqBp)
        .select(col("a"), col("b"), col("edge"), col("sepset"),
          col("sepset2"), col("edge2"))
        .withColumn("truth_adj", expr(PcTruth6Case))),

    // the COMPLETE constraint-based pipeline at order 2: q336's
    // 6-var order-2 skeleton oriented by the SAME v-structure +
    // full-Meek machinery q332 pins (pcOrient2 folds the order-2
    // sepset pair into the shared ~-membership collider test), the
    // CPDAG scored orientation-aware against the 6-var catalog truth.
    // One fact-scale pass (the rank cross-moments); skeleton,
    // cofactors, orientation and scoring all panel-grain broadcasts
    "q337_pc_order2_oriented" -> ((s, d) =>
      pcScoreOriented(s,
        graft.metrics.Causal.pcOrient2(
          graft.metrics.Causal.pcSkeleton2(pcOrder2Panel(s), Pc2TauSqBp),
          PcMeekRounds2),
        PcDirectedTruth6)),

    // whole-tree shipped-artifact scoring capstone (q325 proved ONE
    // shipped D3 file end-to-end; this runs the consumer loop at CORPUS
    // grain): every D3 vars4/lag2 *_missing.csv — 48 files, 4 sizes × 12
    // mask/noise combos — in ONE glob scan with file identity from
    // input_file_name, per-config nearest-lag alignment on the shared
    // irregular spine (partitioned AsOf carries, no per-row probe),
    // Granger census per config (config rides inside the cause/effect
    // key, so the shared sums→decision contract applies untouched), and
    // per-config TPR/FDR + SHD through Metrics.scoreAll against truth
    // parsed from each config's OWN shipped structure txt. At 100 TB this
    // is the real shape of "score a generated corpus": one multi-file
    // columnar scan, per-file keys, a single keyed aggregate per stage
    "q333_shipped_tree_scored" -> ((s, d) => {
      val gout = shippedD3TreeGrangerOut(s, shippedD3TreeIdxed(s))
      val pred = gout.where(col("granger") === 1)
        .select(substring_index(col("cause"), "|", 1).as("graphId"),
          substring_index(col("cause"), "|", -1).as("source"),
          substring_index(col("effect"), "|", -1).as("target"),
          lit(1).as("lag"))
      import s.implicits._
      val truth = ShippedD3TreeTruth.toDF("graphId", "source", "target")
        .withColumn("lag", lit(1))
      graft.metrics.Metrics.scoreAll(truth, pred)
        .select(col("graphId").as("cfg"), col("tp"), col("fp"), col("fn"),
          col("shd_structural"), col("shd_xor"),
          expr("case when tp + fn = 0 then 0L " +
            "else (1000 * tp) div (tp + fn) end").as("tpr_permille"),
          expr("case when tp + fp = 0 then 0L " +
            "else (1000 * fp) div (tp + fp) end").as("fdr_permille"))
    }),

    // order-2 Granger on the IRREGULAR path (q330 runs order-L on the
    // regular A1 clock; q314 runs the irregular path at lag 1 only): a
    // B2 kernel dump — irregular exponential-gap spine, mixed noise —
    // aligned by TWO nearest-lag passes (lagMult 1 and 2 over the
    // spine, the a2.py lookup), then the SAME grangerMulti
    // sufficient-stats + Frisch-Waugh elimination contract as q330 at
    // L=2. B2's cubic-dropped quirk leaves PURE even-power links
    // (X4 = 0.25·X1[t−2]²…), which a linear regressor cannot see at all
    // (corr(X, X²) = 0 for a symmetric series) — so the tested cause
    // lags enter SQUARED (second-moment Granger; own-effect lags stay
    // linear), recovering the declared lag-2 X1→X4 edge the lag-1 test
    // cannot. Centi quantization keeps v² ≤ ~1e4 and every elimination
    // product inside the 10³⁸ budget. F crit 300 centi = F(2,∞) at 5%
    "q334_granger_multilag_irregular" -> ((s, d) => {
      val cfg = Grid.forFamily("B2").find(c =>
        c.nPoints == 5000 && c.nVars == 4 && c.maxLag == 2 &&
          c.mixRatio == 0.5).get
      val gen = dumpGen(s, "q334_gen",
        Generate.wideFast(s, Seq(cfg)).select(
          col("t"), col("time"), col("X1"), col("X2"), col("X3"),
          col("X4")))
      val spine = gen.select(col("t"), col("time"))
      val lx1 = graft.ops.Lagged.nearestLagIndexView(spine, "t", "time",
          Nil, 1).withColumnRenamed("lag_idx", "li1").localCheckpoint(false)
      val lx2 = graft.ops.Lagged.nearestLagIndexView(spine, "t", "time",
          Nil, 2).withColumnRenamed("lag_idx", "li2").localCheckpoint(false)
      val pan = (1 to 4).map(i =>
        gen.select(lit(s"X$i").as("series"), col("t"),
            floor(col(s"X$i") * 100).cast("long").as("v")))
        .reduce(_ unionByName _).localCheckpoint(false)
      val y = pan.select(col("series").as("effect"), col("t"),
        col("v").as("y"))
      val ep1 = pan.select(col("series").as("effect"),
        col("t").as("li1"), col("v").as("p1"))
      val ep2 = pan.select(col("series").as("effect"),
        col("t").as("li2"), col("v").as("p2"))
      val cq1 = pan.select(col("series").as("cause"),
        col("t").as("li1"), (col("v") * col("v")).as("q1"))
      val cq2 = pan.select(col("series").as("cause"),
        col("t").as("li2"), (col("v") * col("v")).as("q2"))
      val lagged = lx1.join(lx2, Seq("t"))
        .join(broadcast(y), Seq("t"))
        .join(broadcast(ep1), Seq("effect", "li1"))
        .join(broadcast(ep2), Seq("effect", "li2"))
        .join(broadcast(cq1), Seq("li1"))
        .join(broadcast(cq2), Seq("cause", "li2"))
        .where(col("cause") =!= col("effect"))
        .select(col("cause"), col("effect"), col("y"),
          col("p1"), col("p2"), col("q1"), col("q2"))
      graft.metrics.Causal.grangerMultiDecide(
          graft.metrics.Causal.grangerMultiSums(lagged, 2), 2, 300L)
        .withColumn("truth_any", expr(grangerTruthCaseAnyLag("B2", 4, 2)))
    }),

    // TF-IDF top-keyword extraction: per-document argmax of
    // tf·idf_bits with the BM25 family's bit-length idf
    // (length(bin(n_docs div df)) — the shared quantized log), argmax
    // tie-broken lexicographically-last via one max(struct) aggregate
    // (no per-doc window sort); census of how often each keyword tops a
    // document, bounded top-20
    "q310_tfidf_keywords" -> ((s, d) => {
      val tok = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val nd = documents(s, d).agg(count(lit(1)).as("n_docs"))
      val top = tf.join(df, Seq("tok")).crossJoin(broadcast(nd))
        .withColumn("score",
          expr("tf * length(bin(n_docs div df))"))
        .groupBy("doc_id")
        .agg(max(struct(col("score"), col("tok"))).as("t"))
        .select(col("t.tok").as("keyword"))
      top.groupBy("keyword").agg(count(lit(1)).as("n_docs_top"))
        .orderBy(col("n_docs_top").desc, col("keyword")).limit(20)
    }),

    // Ljung-Box whiteness audit per series (k = 1..3): autocovariances on
    // EXACT scaled deviations d_t = n·v_t − Σv (no truncated mean ever
    // enters), Q compared cross-multiplied against χ²₃ at 5% —
    // 1000·n·(n+2)·Σ_k c_k²·Π_{j≠k}(n−j) > 7815·Π_k(n−k)·c₀² — the
    // residual-diagnostics companion to the q301 stationarity audit
    "q306_ljung_box" -> ((s, d) => {
      val p = graft.metrics.Causal.dailyMeanPanel(events(s, d))
      val w = Window.partitionBy("series").orderBy("day")
      val st = p.groupBy("series").agg(count(lit(1)).as("n"),
        sum("v").as("sv"))
      val dev = p.join(broadcast(st), Seq("series"))
        .select(col("series"), col("n"), col("day"),
          (col("n") * col("v") - col("sv")).as("dt"))
      val lagd = dev.select(col("series"), col("n"), col("dt"),
        lag("dt", 1).over(w).as("d1"), lag("dt", 2).over(w).as("d2"),
        lag("dt", 3).over(w).as("d3"))
      lagd.groupBy("series", "n").agg(
          sum((col("dt") * col("dt")).cast("decimal(38,0)")).as("c0"),
          sum((col("dt") * col("d1")).cast("decimal(38,0)")).as("c1"),
          sum((col("dt") * col("d2")).cast("decimal(38,0)")).as("c2"),
          sum((col("dt") * col("d3")).cast("decimal(38,0)")).as("c3"))
        .select(col("series"), col("n"),
          col("c0").cast("long").as("c0"),
          col("c1").cast("long").as("c1"),
          col("c2").cast("long").as("c2"),
          col("c3").cast("long").as("c3"),
          expr("""case when 1000 * n * (n + 2) *
                 |    (cast(c1 as decimal(38,0)) * c1 * (n-2) * (n-3)
                 |      + cast(c2 as decimal(38,0)) * c2 * (n-1) * (n-3)
                 |      + cast(c3 as decimal(38,0)) * c3 * (n-1) * (n-2))
                 |  > 7815 * (n-1) * (n-2) * (n-3)
                 |    * cast(c0 as decimal(38,0)) * c0
                 |then 0 else 1 end""".stripMargin).as("white"))
    })
  )

  /** O'Brien-Fleming z² boundaries in basis points ×1e4: c²·K/k with
    * c = 2.004, K = 3 looks — one Scala constant in both engines.
    */
  private val ObfBoundBp: IndexedSeq[Long] =
    (1 to 3).map(k => Math.round(2.004 * 2.004 * 3.0 / k * 1e4))

  /** The catalog's A1 4-var lag-2 ANY-lag unordered adjacency as a CASE
    * flag over (a, b) with a < b — shared by q300 and its oracle.
    */
  /** Declared X-X adjacencies of a (family, nVars, lag-2) cell as a CASE
    * flag over unordered pairs — U-incident links are excluded because
    * the PC capstones observe only the X panel (q329's point: the hidden
    * confounder's footprint shows in `edge` against truth_adj = 0 rows).
    */
  /** One X-parent link row for the structural-OLS queries (q351-q353):
    * `g` is the fold prefix ("" single-graph, configId for q352's
    * corpus fold), `y`/`x`/`sib` the virtual lagged-series names
    * Causal.structuralBetas joins on (sib = the target's OTHER X parent,
    * None for single-parent targets), and the two ppm truths — declared
    * (CausalLink.coef) and effective (Parser.effectiveLinks, §2.4-2 dead
    * contemporaneous links zeroed). ONE driver-side list feeds BOTH the
    * Spark frame (weightLinksDf) and the oracle's VALUES rendering
    * (weightLinksValuesSql), so the two engines share the spec by
    * construction.
    */
  private[graft] final case class WeightLink(g: String, family: String,
      nVars: Int, maxLag: Int, target: String, source: String, lag: Int,
      y: String, x: String, sib: Option[String],
      declaredPpm: Long, effectivePpm: Long)

  private[graft] def weightLinks(g: String, family: String, nVars: Int,
      maxLag: Int): Seq[WeightLink] = {
    val declared = graft.core.Parser.truthLinks(family, nVars, maxLag)
      .filter(_.source != "U")
    val effective = graft.core.Parser.effectiveLinks(family, nVars, maxLag)
      .filter(_.source != "U")
      .map(l => ((l.source, l.lag, l.target), l.coef)).toMap
    val pre = if (g.isEmpty) "" else s"$g|"
    val byTarget = declared.groupBy(_.target)
    declared.map { l =>
      val sibs = byTarget(l.target)
        .filterNot(o => o.source == l.source && o.lag == l.lag)
      require(sibs.size <= 1,
        s"structuralBetas is Cramer k<=2: ${l.target} has " +
          s"${sibs.size + 1} X parents in $family/$nVars/$maxLag")
      WeightLink(g, family, nVars, maxLag, l.target, l.source, l.lag,
        s"$pre${l.target}@0", s"$pre${l.source}@${l.lag}",
        sibs.headOption.map(o => s"$pre${o.source}@${o.lag}"),
        math.round(l.coef * 1e6),
        math.round(effective((l.source, l.lag, l.target)) * 1e6))
    }
  }

  /** B1 power-term link rows (q355): one row per STRICT equation term of
    * the B1 4-var lag-2 cell — regressors are POWER-TRANSFORMED virtual
    * series ("X1p2@2" = X1² lagged 2), so the same k=2 Cramer machinery
    * estimates nonlinear-term weights. declared = the strict coefficient
    * (cubic terms NEGATIVE — b1 equations are c·x² − c'·x³ + e);
    * effective = what the COMPAT kernel actually applies (§2.4-1: the
    * '+'-split extractor keeps only the quadratic, so pow-3 terms carry
    * effective 0). Columns mirror weightLinksDf plus `pow`.
    */
  private def b1PowerLinks(): Seq[(String, String, Int, Int, String,
      String, String, Long, Long)] = {
    val strict = graft.core.Parser.strictLinks("B1", 4, 2)
    val compat = graft.core.Parser.truthLinks("B1", 4, 2)
      .map(l => ((l.source, l.lag, l.target), l.coef)).toMap
    val byTarget = strict.groupBy(_.target)
    def vn(o: graft.core.Parser.StrictLink) =
      s"${o.source}p${o.power}@${o.lag}"
    strict.map { sl =>
      val sibs = byTarget(sl.target).filterNot(_ == sl)
      require(sibs.size == 1,
        s"b1PowerLinks expects 2 terms per target, got ${sibs.size + 1}")
      (sl.target, sl.source, sl.lag, sl.power, s"${sl.target}@0",
        vn(sl), vn(sibs.head), math.round(sl.coef * 1e6),
        if (sl.power == 2)
          math.round(compat((sl.source, sl.lag, sl.target)) * 1e6)
        else 0L)
    }
  }

  private def b1PowerLinksDf(s: SparkSession): DataFrame = {
    import s.implicits._
    b1PowerLinks().toDF("target", "source", "lag", "pow", "y", "x", "sib",
      "declared_ppm", "effective_ppm")
  }

  private def b1PowerLinksValuesSql(): String =
    "(VALUES " + b1PowerLinks().map { case (t, src, lag, pow, y, x, sib,
        dp, ep) =>
      s"('$t','$src',$lag,$pow,'$y','$x','$sib',$dp,$ep)"
    }.mkString(",\n    ") +
      ") AS l(target, source, lag, pow, y, x, sib, declared_ppm," +
      " effective_ppm)"

  /** Specs + panel columns for q355: targets linear at lag 0, regressors
    * as power-transformed series at their link lags.
    */
  private def b1PowerSpecs(): Seq[(String, Int)] =
    b1PowerLinks().flatMap { l =>
      Seq((l._1, 0), (l._6.split("@")(0), l._3))
    }.distinct

  /** q361's C1 link rows: one per X link of the 6-var lag-2 cell, with
    * FUNC-TRANSFORMED regressor virtual names ("cX1@2" = cos(X1·π/2)
    * lagged 2; prefixes c/s/p2/p3 for cos/sin/x²/x³) and BOTH target
    * variants — detrended ("X4~@0", the kernel's deterministic trend +
    * season subtracted at dump time) and naive raw ("X4@0"). One list
    * feeds the Spark frames and the oracle VALUES twin.
    */
  private def c1Links(): Seq[(String, String, Int, String, String, String,
      Option[String], Long, Long)] = {
    val declared = graft.core.Parser.truthLinks("C1", 6, 2)
      .filter(_.source != "U")
    val effective = graft.core.Parser.effectiveLinks("C1", 6, 2)
      .filter(_.source != "U")
      .map(l => ((l.source, l.lag, l.target), l.coef)).toMap
    def pre(func: String): String = func match {
      case "cos" => "c"
      case "sin" => "s"
      case "power2" => "p2"
      case "power3" => "p3"
      case other => throw new IllegalStateException(s"C1 func $other")
    }
    val byTarget = declared.groupBy(_.target)
    declared.map { l =>
      val sibs = byTarget(l.target)
        .filterNot(o => o.source == l.source && o.lag == l.lag)
      require(sibs.size <= 1, s"C1 k>2 at ${l.target}")
      (l.target, l.source, l.lag, l.func,
        s"${pre(l.func)}${l.source}@${l.lag}",
        s"${l.target}~@0",
        sibs.headOption.map(o => s"${pre(o.func)}${o.source}@${o.lag}"),
        math.round(l.coef * 1e6),
        math.round(effective((l.source, l.lag, l.target)) * 1e6))
    }
  }

  /** q369's D3/D3C link rows: one per X link of a folded 4-var cell,
    * with FUNC-TRANSFORMED regressor virtual names (q361's c/s/p2/p3
    * prefix scheme) and the DETRENDED target ("g|X4~@0"). One list
    * feeds the Spark frame and the oracle VALUES twin.
    */
  private def d3Links(cfgs: Seq[graft.core.GenConfig]): Seq[(String,
      String, Int, Long, Long, String, String, Int, String, String,
      String, Option[String], Long, Long)] = cfgs.flatMap { c =>
    val declared = graft.core.Parser.truthLinks(c.family, 4, c.maxLag)
      .filter(_.source != "U")
    val effective = graft.core.Parser.effectiveLinks(c.family, 4,
        c.maxLag).filter(_.source != "U")
      .map(l => ((l.source, l.lag, l.target), l.coef)).toMap
    def pre(func: String): String = func match {
      case "cos" => "c"
      case "sin" => "s"
      case "power2" => "p2"
      case "power3" => "p3"
      case other => throw new IllegalStateException(s"D3 func $other")
    }
    val g = c.configId.toString
    val byT = declared.groupBy(_.target)
    declared.map { l =>
      val sibs = byT(l.target)
        .filterNot(o => o.source == l.source && o.lag == l.lag)
      require(sibs.size <= 1, s"D3 k>2 at ${l.target}")
      (g, c.family, c.maxLag, math.round(c.mcarProb * 1000),
        math.round(c.blockProb * 1000), l.target, l.source, l.lag,
        l.func, s"$g|${l.target}~@0",
        s"$g|${pre(l.func)}${l.source}@${l.lag}",
        sibs.headOption.map(o =>
          s"$g|${pre(o.func)}${o.source}@${o.lag}"),
        math.round(l.coef * 1e6),
        math.round(effective((l.source, l.lag, l.target)) * 1e6))
    }
  }

  /** q372's estimation rows: (series, component, y, x, sib, truth_ppm)
    * — one per (series × {trend, s1, c1, s2, c2}), truth from the
    * kernel's season expansion and trend formula (one list feeding the
    * Spark frame and the oracle VALUES twin).
    */
  private def harmonicLinks(): Seq[(String, String, String, String,
      Option[String], Long, Int)] = {
    // a series' own struct term decides whether the linear+harmonic
    // model CONTAINS its truth: cos/sin terms are bounded (in_model=1);
    // power terms of TRENDING parents inject polynomial trend the
    // basis cannot represent (in_model=0 — the mis-specification read)
    val funcOf = graft.core.Parser.truthLinks("C1", 6, 2)
      .filter(_.source != "U").map(l => l.target -> l.func).toMap
    (1 to 6).flatMap { i =>
      val phase = 2.0 * math.Pi * (i - 1) / 8.0
      val y = s"X$i@0"
      val ok = if (Set("cos", "sin")(funcOf(s"X$i"))) 1 else 0
      Seq(
        (s"X$i", "trend", y, "tt@0", None: Option[String],
          math.round(1e9 * 0.01 * i * 0.5), ok),
        (s"X$i", "s1", y, "s1@0", Some("tt@0"),
          math.round(1e6 * 0.5 * math.cos(phase)), ok),
        (s"X$i", "c1", y, "c1@0", Some("tt@0"),
          math.round(1e6 * 0.5 * math.sin(phase)), ok),
        (s"X$i", "s2", y, "s2@0", Some("tt@0"),
          math.round(1e6 * -0.25 * math.sin(phase)), ok),
        (s"X$i", "c2", y, "c2@0", Some("tt@0"),
          math.round(1e6 * 0.25 * math.cos(phase)), ok))
    }
  }

  private def harmonicLinksValuesSql(): String =
    "(VALUES " + harmonicLinks().map { case (ser, comp, y, x, sib, tp,
        ok) =>
      s"('$ser','$comp','$y','$x'," +
        sib.map(v => s"'$v'").getOrElse("NULL::VARCHAR") + s",$tp,$ok)"
    }.mkString(",\n    ") +
      ") AS l(series, component, y, x, sib, truth_ppm, in_model)"

  /** q358's per-link stream rows: (link key, target, source, lag,
    * has_sib, sib series/lag, effective ppm) — ONE list feeding the
    * Spark design-tuple builder, the broadcast decode join, and the
    * oracle VALUES twin.
    */
  private def streamWeightLinks(): Seq[(String, String, String, Int, Int,
      String, Int, Long)] =
    weightLinks("", "A1", 6, 2).map { l =>
      val (sibSeries, sibLag) = l.sib match {
        case Some(v) => val p = v.split("@"); (p(0), p(1).toInt)
        case None => ("", 0)
      }
      (s"${l.target}<${l.source}@${l.lag}", l.target, l.source, l.lag,
        if (l.sib.isDefined) 1 else 0, sibSeries, sibLag, l.effectivePpm)
    }

  private def streamWeightLinksValuesSql(): String =
    "(VALUES " + streamWeightLinks().map { case (k, t, src, lag, hs, _, _,
        ep) =>
      s"('$k','$t','$src',$lag,$hs,$ep)"
    }.mkString(",\n    ") +
      ") AS l(link, target, source, lag, has_sib, effective_ppm)"

  /** The (series, lag) virtual-series specs a link list needs: every
    * target at lag 0 plus every parent at its link lag, fold-prefixed.
    */
  private[graft] def weightSpecs(links: Seq[WeightLink]): Seq[(String, Int)] =
    links.flatMap { l =>
      val pre = if (l.g.isEmpty) "" else s"${l.g}|"
      Seq((s"$pre${l.target}", 0), (s"$pre${l.source}", l.lag))
    }.distinct

  private[graft] def weightLinksDf(s: SparkSession,
      links: Seq[WeightLink]): DataFrame = {
    import s.implicits._
    links.map(l => (l.g, l.family, l.nVars, l.maxLag, l.target, l.source,
        l.lag, l.y, l.x, l.sib, l.declaredPpm, l.effectivePpm))
      .toDF("g", "family", "n_vars", "max_lag", "target", "source", "lag",
        "y", "x", "sib", "declared_ppm", "effective_ppm")
  }

  /** The same links as a DuckDB VALUES CTE body (alias column names match
    * weightLinksDf exactly — structuralBetasSqlCtes passes l.* through).
    */
  private def weightLinksValuesSql(links: Seq[WeightLink]): String =
    "(VALUES " + links.map(l =>
      s"('${l.g}','${l.family}',${l.nVars},${l.maxLag},'${l.target}'," +
        s"'${l.source}',${l.lag},'${l.y}','${l.x}'," +
        l.sib.map(x => s"'$x'").getOrElse("NULL::VARCHAR") +
        s",${l.declaredPpm},${l.effectivePpm})").mkString(",\n    ") +
      ") AS l(g, family, n_vars, max_lag, target, source, lag, y, x," +
      " sib, declared_ppm, effective_ppm)"

  private def weightSpecsValuesSql(links: Seq[WeightLink]): String =
    "(VALUES " + weightSpecs(links).map { case (series, lag) =>
      s"('$series',$lag)" }.mkString(",\n    ") + ") AS s(series, lag)"

  private def pcTruthCase(family: String, nVars: Int = 4): String = {
    val pairs = graft.core.Parser.truthLinks(family, nVars, 2)
      .filter(l => l.source != "U" && l.target != "U")
      .map(l => if (l.source < l.target) (l.source, l.target)
        else (l.target, l.source))
      .filter(p => p._1 != p._2).distinct
    if (pairs.isEmpty) "0"
    else "CASE " + pairs.map { case (x, y) =>
      s"WHEN a = '$x' AND b = '$y' THEN 1"
    }.mkString(" ") + " ELSE 0 END"
  }
  private val PcGenTruthCase: String = pcTruthCase("A1")

  /** q336's truth: the A1 6-var lag-2 adjacency (the 6_2 cell carries the
    * X1→X4→X3→X2→X1 cycle plus the X4↔X5 feedback — dense enough that
    * order-1 conditioning leaves chained spurious pairs for the order-2
    * cofactor test to separate).
    */
  private val PcTruth6Case: String = pcTruthCase("A1", 6)

  /** q332's full-Meek (R1+R2+R3) round count — one Scala constant driving
    * both the Spark loop and the generated DuckDB CTE chain.
    */
  private val PcMeekRounds = 3
  /** q342's τ² ladder in basis points — the shared
    * [[graft.metrics.Causal.TauSweepBps]] constant (Bench's catalog
    * sweep rung reads the same value, so the benched ladder can never
    * drift from this correctness-gated one).
    */
  private val PcTauSweepBps = graft.metrics.Causal.TauSweepBps

  /** q337's round count: one more than q332's — the 6-var order-2 graph
    * can chain an orientation across more hops, and rounds are unrolled
    * (each is one fixed CTE block), so the extra round is one cheap
    * panel-grain stage that buys fixpoint headroom.
    */
  private val PcMeekRounds2 = 4

  /** q347's round count: the PC-STABLE skeleton keeps a SUPERSET of the
    * unrestricted variant's edges (candidate-subset ⇒ edge-superset),
    * so its undirected chains run longer and Meek propagation needs the
    * 4th round on the 32-wide panel (measured: round 4 still orients;
    * PcStableSpec pins round 5 as a no-op). The Spark loop exits at the
    * fixpoint anyway — the constant only sizes the oracle's unrolled
    * CTE chain.
    */
  private val PcStableMeekRounds = 4

  /** q332's skeleton threshold τ² in basis points (τ = 0.1 — denser than
    * q300's default 0.25 so triples exist to orient).
    */
  private val PcOrientTauSqBp = 100L

  /** q336's threshold τ² in basis points (τ = 0.03): tight enough that
    * the A1 6-var chained correlations survive orders 0-1 — at τ = 0.1
    * the skeleton is already 3 edges and order 2 has nothing to decide —
    * and the order-2 stage demonstrably separates X4–X6 (the X4↔X5
    * feedback holds every ORDER-1 partial above τ; only a conditioning
    * PAIR breaks the path).
    */
  private val Pc2TauSqBp = 9L

  /** q332's directed truth: the catalog's declared A1 4-var lag-2 X→X
    * edges (any lag, distinct ordered pairs, self-loops excluded — PC is
    * lag-free and the skeleton never proposes self edges). One Parser
    * call rendered into the Spark literal AND the oracle VALUES.
    */
  private def pcDirectedTruthFor(nVars: Int): Seq[(String, String)] =
    graft.core.Parser.truthLinks("A1", nVars, 2)
      .filter(l => l.source != "U" && l.target != "U"
        && l.source != l.target)
      .map(l => (l.source, l.target)).distinct
  private lazy val PcDirectedTruth: Seq[(String, String)] =
    pcDirectedTruthFor(4)
  private lazy val PcDirectedTruth6: Seq[(String, String)] =
    pcDirectedTruthFor(6)
  private def pcTruthValuesSql(truth: Seq[(String, String)]): String =
    if (truth.isEmpty)
      // zero-row relation, not "(VALUES )" (a parse error): the scoring
      // tail then charges every predicted edge as a false positive
      "(SELECT NULL::VARCHAR, NULL::VARCHAR WHERE 1 = 0) t(source, target)"
    else truth.map { case (s0, t0) => s"('$s0', '$t0')" }
      .mkString("(VALUES ", ", ", ") t(source, target)")

  /** The orientation-aware scoring tail shared by q332/q337/q339: CPDAG
    * rows from `pc_st$rounds` expanded to directed edges (undirected →
    * both), fwd/rev flags per unordered pair on BOTH sides, reversal
    * charged 1 — the `Metrics.scoreAll` structural-SHD contract — plus
    * edge/direction counts. One generator, three oracles.
    */
  private def pcScoringSqlTail(rounds: Int, truthValues: String): String =
    s"""pc_pred AS (
       |  SELECT a AS source, b AS target FROM pc_st$rounds
       |  WHERE dir = 1
       |  UNION ALL SELECT b, a FROM pc_st$rounds WHERE dir = 2
       |  UNION ALL SELECT a, b FROM pc_st$rounds WHERE dir = 0
       |  UNION ALL SELECT b, a FROM pc_st$rounds WHERE dir = 0),
       |pc_truth AS (SELECT * FROM $truthValues),
       |pc_ct AS (
       |  SELECT least(source, target) AS u, greatest(source, target) AS v,
       |    max(CASE WHEN source <= target THEN 1 ELSE 0 END) AS t_fwd,
       |    max(CASE WHEN source > target THEN 1 ELSE 0 END) AS t_rev
       |  FROM pc_truth GROUP BY 1, 2),
       |pc_cp AS (
       |  SELECT least(source, target) AS u, greatest(source, target) AS v,
       |    max(CASE WHEN source <= target THEN 1 ELSE 0 END) AS p_fwd,
       |    max(CASE WHEN source > target THEN 1 ELSE 0 END) AS p_rev
       |  FROM pc_pred GROUP BY 1, 2),
       |pc_j AS (
       |  SELECT coalesce(t.t_fwd, 0) AS t_fwd, coalesce(t.t_rev, 0) AS t_rev,
       |    coalesce(p.p_fwd, 0) AS p_fwd, coalesce(p.p_rev, 0) AS p_rev
       |  FROM pc_ct t FULL JOIN pc_cp p ON p.u = t.u AND p.v = t.v),
       |pc_sc AS (
       |  SELECT sum(t_fwd * p_fwd + t_rev * p_rev) AS tp,
       |    sum(p_fwd * (1 - t_fwd) + p_rev * (1 - t_rev)) AS fp,
       |    sum(t_fwd * (1 - p_fwd) + t_rev * (1 - p_rev)) AS fn,
       |    sum(CASE WHEN t_fwd + t_rev = 1 AND p_fwd + p_rev = 1
       |          AND t_fwd <> p_fwd THEN 1
       |        ELSE abs(t_fwd - p_fwd) + abs(t_rev - p_rev) END)
       |      AS shd_structural
       |  FROM pc_j),
       |pc_cnt AS (SELECT count(*) AS n_edges,
       |    coalesce(sum(CASE WHEN dir <> 0 THEN 1 ELSE 0 END), 0)
       |      AS n_directed
       |  FROM pc_st$rounds)
       |SELECT c.n_edges::BIGINT AS n_edges,
       |  c.n_directed::BIGINT AS n_directed,
       |  s.tp::BIGINT AS tp, s.fp::BIGINT AS fp, s.fn::BIGINT AS fn,
       |  s.shd_structural::BIGINT AS shd_structural,
       |  (s.fp + s.fn)::BIGINT AS shd_xor
       |FROM pc_cnt c, pc_sc s""".stripMargin

  /** q338/q339's shared oracle CTE block: the shipped CSV indexed and
    * unpivoted to the 200-cut pairwise-complete `panel(series, day, v)`.
    */
  private def shippedD3PanelCtes: String =
    s"""csv AS (
       |  SELECT X1, X2, X3, X4,
       |    row_number() OVER (ORDER BY "time") - 1 AS t
       |  FROM read_csv('$ShippedD3Base${"_missing.csv"}', header=true,
       |    columns={'X1': 'DOUBLE', 'X2': 'DOUBLE', 'X3': 'DOUBLE',
       |      'X4': 'DOUBLE', 'time': 'DOUBLE'})),
       |panel AS (
       |  SELECT series, day, v FROM (
       |    SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
       |    FROM csv WHERE X1 IS NOT NULL
       |    UNION ALL SELECT 'X2', t, floor(X2 * 1000)::BIGINT FROM csv
       |    WHERE X2 IS NOT NULL
       |    UNION ALL SELECT 'X3', t, floor(X3 * 1000)::BIGINT FROM csv
       |    WHERE X3 IS NOT NULL
       |    UNION ALL SELECT 'X4', t, floor(X4 * 1000)::BIGINT FROM csv
       |    WHERE X4 IS NOT NULL) u(series, day, v)
       |  WHERE day < 200)""".stripMargin
  private def pcDirectedTruthValuesSql: String =
    pcTruthValuesSql(PcDirectedTruth)

  private def GroupByAllSql(table: String): String =
    s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       |  cast(sum(cast(floor(o_totalprice * 100) as bigint)) as bigint)
       |    AS cents
       |FROM $table GROUP BY ALL""".stripMargin

  /** The catalog's declared lag-1 edges for a (family, 4-var, lag-2) grid
    * cell as a CASE flag — built from the SAME Parser.truthLinks the
    * generator uses, rendered identically into the Spark expression and
    * the DuckDB oracle. A1C's confounder edges are lag 0, so its CASE
    * stays X-only — the capstone's point is that Granger flags the
    * U-induced spurious edges the truth column does NOT declare.
    */
  private def grangerTruthCase(family: String): String = {
    val edges = graft.core.Parser.truthLinks(family, 4, 2)
      .filter(_.lag == 1).map(l => (l.source, l.target)).distinct
    if (edges.isEmpty) "0"
    else "CASE " + edges.map { case (a, b) =>
      s"WHEN cause = '$a' AND effect = '$b' THEN 1"
    }.mkString(" ") + " ELSE 0 END"
  }
  private val GrangerGenTruthCase: String = grangerTruthCase("A1")

  /** q330's truth cell: a declared X-edge at ANY lag 1..maxLag — the
    * ground truth an order-L joint test answers for (vs the lag-1-only
    * slice grangerTruthCase takes). One Scala value, both engines.
    */
  private def grangerTruthCaseAnyLag(family: String, nVars: Int,
      maxLag: Int): String = {
    val edges = graft.core.Parser.truthLinks(family, nVars, maxLag)
      .filter(l => l.lag >= 1 && l.lag <= maxLag)
      .map(l => (l.source, l.target)).distinct
    if (edges.isEmpty) "0"
    else "CASE " + edges.map { case (a, b) =>
      s"WHEN cause = '$a' AND effect = '$b' THEN 1"
    }.mkString(" ") + " ELSE 0 END"
  }

  /** q325's shipped artifact pair and the truth CASE parsed from the
    * SHIPPED structure txt by the S4-inverse parser — the same string
    * renders into the Spark expression and the DuckDB oracle.
    */
  private val ShippedD3Base: String =
    "/root/reference/Datasets/D3/lag 2/" +
      "nonlinear_ts_n1000_vars4_lag2_noise30_mcar10_block10"
  private lazy val ShippedD3TruthCase: String = {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$ShippedD3Base" + "_structure.txt"))
    val edges = graft.generate.Sinks.parseStructureLinks(txt)
      .filter(_._2 == 1).map(l => (l._1, l._3)).distinct
    if (edges.isEmpty) "0"
    else "CASE " + edges.map { case (a, b) =>
      s"WHEN cause = '$a' AND effect = '$b' THEN 1"
    }.mkString(" ") + " ELSE 0 END"
  }

  /** q336/q337's shared panel: the A1 6-var lag-2 gaussian cell cut at
    * 200 observations, dumped ONCE under `q336_gen` (both queries — and
    * both oracles — read the same dump; `dumpGen` regenerates
    * byte-identically whichever entry runs first).
    */
  private def pcOrder2Panel(s: SparkSession): DataFrame = {
    val cfg = Grid.forFamily("A1").find(c =>
      c.nPoints == 500 && c.nVars == 6 && c.maxLag == 2
        && c.noiseType == "gaussian").get
    val gen = dumpGen(s, "q336_gen",
      Generate.wideFast(s, Seq(cfg)).where(col("t") < 200)
        .select(col("t") +: (1 to 6).map(i => col(s"X$i")): _*))
    (1 to 6).map(i =>
      gen.select(lit(s"X$i").as("series"), col("t").as("day"),
        floor(col(s"X$i") * 1000).cast("long").as("v")))
      .reduce(_ unionByName _)
  }

  /** The Spark twin of [[pcScoringSqlTail]], shared by q332/q337/q339:
    * CPDAG rows (a, b, dir) expanded to directed edges (undirected →
    * both), scored orientation-aware through `Metrics.scoreAll` against
    * a directed truth list, with edge/direction counts alongside.
    */
  private def pcScoreOriented(s: SparkSession, st: DataFrame,
      truthEdges: Seq[(String, String)]): DataFrame = {
    val pred = st.where(col("dir") === 1)
        .select(col("a").as("source"), col("b").as("target"))
      .unionByName(st.where(col("dir") === 2)
        .select(col("b").as("source"), col("a").as("target")))
      .unionByName(st.where(col("dir") === 0)
        .select(col("a").as("source"), col("b").as("target")))
      .unionByName(st.where(col("dir") === 0)
        .select(col("b").as("source"), col("a").as("target")))
      .withColumn("graphId", lit(0L)).withColumn("lag", lit(0))
    import s.implicits._
    val truth = truthEdges.toDF("source", "target")
      .withColumn("graphId", lit(0L)).withColumn("lag", lit(0))
    val counts = st.agg(count(lit(1)).as("n_edges"),
      coalesce(sum(when(col("dir") =!= 0, 1).otherwise(0)), lit(0))
        .as("n_directed"))
    graft.metrics.Metrics.scoreAll(truth, pred)
      .crossJoin(broadcast(counts))
      .select(col("n_edges").cast("long").as("n_edges"),
        col("n_directed").cast("long").as("n_directed"),
        col("tp"), col("fp"), col("fn"),
        col("shd_structural"), col("shd_xor"))
  }

  /** q338/q339's shared panel: the q325 shipped D3 missing-data CSV,
    * first 200 time indices (the rank-moment n⁴ budget), per-series
    * null-dropped milli-quantized rows — pairwise-complete by
    * construction.
    */
  private def shippedD3Panel(s: SparkSession): DataFrame = {
    val idxed = graft.generate.Sinks.readWideCsv(s,
        s"$ShippedD3Base" + "_missing.csv")
      .withColumn("t",
        (row_number().over(Window.orderBy("time")) - 1).cast("long"))
      .where(col("t") < 200)
    (1 to 4).map(i =>
      idxed.where(col(s"X$i").isNotNull)
        .select(lit(s"X$i").as("series"), col("t").as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
      .reduce(_ unionByName _)
  }

  /** q339's truth: the shipped structure txt's ANY-lag DIRECTED X-X
    * edges (distinct ordered pairs, self-loops excluded — the q332
    * contract applied to shipped bytes).
    */
  private lazy val ShippedD3DirectedTruth: Seq[(String, String)] = {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$ShippedD3Base" + "_structure.txt"))
    graft.generate.Sinks.parseStructureLinks(txt)
      .filter(l => l._1 != l._3).map(l => (l._1, l._3)).distinct
  }

  /** q338's truth: the same shipped structure txt as ANY-lag unordered
    * X-X adjacency (PC is lag-free), a CASE over (a, b) with a < b.
    */
  private lazy val ShippedD3AdjCase: String = {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$ShippedD3Base" + "_structure.txt"))
    val pairs = graft.generate.Sinks.parseStructureLinks(txt)
      .map(l => if (l._1 < l._3) (l._1, l._3) else (l._3, l._1))
      .filter(p => p._1 != p._2).distinct
    if (pairs.isEmpty) "0"
    else "CASE " + pairs.map { case (x, y) =>
      s"WHEN a = '$x' AND b = '$y' THEN 1"
    }.mkString(" ") + " ELSE 0 END"
  }

  /** q333's whole-tree shipped cell: every D3 (vars=4, lag=2) *_missing.csv
    * (48 files — 12 noise/mcar/block combos × 4 sizes), read by ONE glob in
    * both engines; truth parsed PER CONFIG from each sibling structure txt
    * by the S4-inverse grammar (lag-1 X→X edges, the q325 contract, at
    * corpus grain).
    */
  private val ShippedD3TreeDir = "/root/reference/Datasets/D3/lag 2"
  private val ShippedD3TreeGlob =
    s"$ShippedD3TreeDir/nonlinear_ts_*_vars4_lag2_*_missing.csv"
  /** Every structure-txt link of the cell, one parse pass: (cfg, src,
    * lag, tgt) — q333 slices the lag-1 Granger truth and q340 the
    * any-lag directed PC truth from this one vector.
    */
  private lazy val ShippedD3TreeLinks: Vector[(String, String, Int, String)] = {
    val files = Option(new java.io.File(ShippedD3TreeDir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.matches("nonlinear_ts_.*_vars4_lag2_.*_missing\\.csv"))
      .sortBy(_.getName)
    files.toVector.flatMap { f =>
      val cfg = f.getName.stripSuffix("_missing.csv")
      val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(
        s"$ShippedD3TreeDir/${cfg}_structure.txt"))
      graft.generate.Sinks.parseStructureLinks(txt)
        .map(l => (cfg, l._1, l._2, l._3))
    }
  }
  private lazy val ShippedD3TreeTruth: Vector[(String, String, String)] =
    ShippedD3TreeLinks.filter(l => l._3 == 1 && l._2 != l._4)
      .map(l => (l._1, l._2, l._4)).distinct
  /** q340's truth: each config's ANY-lag directed X-X edges (the q339
    * contract at corpus grain — PC is lag-free, reversals charged).
    */
  private lazy val ShippedD3TreeDirectedTruth: Vector[(String, String, String)] =
    ShippedD3TreeLinks.filter(l => l._2 != l._4)
      .map(l => (l._1, l._2, l._4)).distinct
  private def shippedD3TreeTruthValuesSql: String =
    ShippedD3TreeTruth.map { case (g, s0, t0) => s"('$g', '$s0', '$t0')" }
      .mkString("(VALUES ", ", ", ") t(graphId, source, target)")
  private def shippedD3TreeDirectedTruthValuesSql: String =
    ShippedD3TreeDirectedTruth
      .map { case (g, s0, t0) => s"('$g', '$s0', '$t0')" }
      .mkString("(VALUES ", ", ", ") t(graphId, source, target)")

  /** The shipped-cell glob scan shared by q333/q340: 48 CSVs in one
    * read, config identity from the file name, per-config observation
    * index from the time column — checkpointed so each consumer reads
    * the files once.
    */
  private def shippedD3TreeIdxed(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType((1 to 4).map(i =>
      StructField(s"X$i", DoubleType, nullable = true)) :+
      StructField("time", DoubleType, nullable = false))
    s.read.option("header", "true").schema(schema)
      .csv(ShippedD3TreeGlob)
      .withColumn("cfg", regexp_extract(input_file_name(),
        "([^/]+)_missing\\.csv$", 1))
      .withColumn("t", (row_number().over(
        Window.partitionBy("cfg").orderBy("time")) - 1).cast("long"))
      .localCheckpoint(false)
  }

  /** q333/q341's shared Granger-per-config pass over the shipped cell:
    * nearest-lag alignment on each config's own irregular spine
    * (partitioned AsOf carries, no per-row probe) + the lag-1 Granger
    * sums→decision contract with the config folded into the
    * cause/effect key, so the shared arithmetic applies untouched.
    * DECI grain, not the milli the single-file q325 uses: the n5000
    * trended configs push milli C-statistics to ~1e20 and their
    * products past the 10^38 budget in BOTH engines; at deci the worst
    * cell is ~2.5e13 and the squared products keep a 1e10 margin
    * (n <= 5000, |v| <= ~1e3). Returns granger_out rows with FOLDED
    * cause/effect.
    */
  private def shippedD3TreeGrangerOut(s: SparkSession,
      idxed: DataFrame): DataFrame = {
    val lx = graft.ops.Lagged.nearestLagIndexView(
      idxed.select(col("cfg"), col("t"), col("time")), "t", "time",
      Seq("cfg")).localCheckpoint(false)
    val pan = (1 to 4).map(i =>
      idxed.where(col(s"X$i").isNotNull)
        .select(col("cfg"), lit(s"X$i").as("series"), col("t"),
          floor(col(s"X$i") * 10).cast("long").as("v")))
      .reduce(_ unionByName _).localCheckpoint(false)
    val e = pan.select(col("cfg"), col("series").as("effect"),
      col("t"), col("v").as("yv"))
    val ep = pan.select(col("cfg"), col("series").as("effect"),
      col("t").as("lag_idx"), col("v").as("pv"))
    val cp = pan.select(col("cfg"), col("series").as("cause"),
      col("t").as("lag_idx"), col("v").as("qv"))
    val lagged = lx.join(e, Seq("cfg", "t"))
      .join(ep, Seq("cfg", "effect", "lag_idx"))
      .join(cp, Seq("cfg", "lag_idx"))
      .where(col("cause") =!= col("effect"))
      .select(concat(col("cfg"), lit("|"), col("cause")).as("cause"),
        concat(col("cfg"), lit("|"), col("effect")).as("effect"),
        col("yv"), col("pv"), col("qv"))
    graft.metrics.Causal.grangerDecide(
      graft.metrics.Causal.grangerSumsFromLagged(lagged), 422L)
  }

  /** q340/q341's shared cfg-folded pairwise-complete panel (milli
    * grain, 200-obs window for the rank-moment n⁴ budget): the config
    * folds into BOTH the series and day keys, so cross-config series
    * share no observation days, no cross moment ever forms, and one
    * pcSkeleton/pcOrient call carries all 48 disjoint graphs.
    */
  private def shippedD3TreeFoldedPanel(idxed: DataFrame): DataFrame =
    (1 to 4).map(i =>
      idxed.where(col(s"X$i").isNotNull && col("t") < 200)
        .select(concat(col("cfg"), lit(s"|X$i")).as("series"),
          concat(col("cfg"), lit("|"),
            lpad(col("t").cast("string"), 3, "0")).as("day"),
          floor(col(s"X$i") * 1000).cast("long").as("v")))
      .reduce(_ unionByName _).localCheckpoint(false)

  /** The shipped-cell glob scan as a CTE (q333/q340/q341 oracles): 48
    * CSVs in one read_csv, config identity from the file name,
    * per-config observation index — the SQL twin of
    * [[shippedD3TreeIdxed]].
    */
  private def shippedD3TreeCsvCte: String =
    s"""csv AS MATERIALIZED (
       |  SELECT X1, X2, X3, X4, "time",
       |    regexp_extract(filename, '([^/]+)_missing\\.csv$$', 1) AS cfg,
       |    row_number() OVER (
       |      PARTITION BY filename ORDER BY "time") - 1 AS t
       |  FROM read_csv('$ShippedD3TreeGlob', header=true, filename=true,
       |    columns={'X1': 'DOUBLE', 'X2': 'DOUBLE', 'X3': 'DOUBLE',
       |      'X4': 'DOUBLE', 'time': 'DOUBLE'}))""".stripMargin

  /** q333/q341's shared Granger CTE block downstream of
    * [[shippedD3TreeCsvCte]] — the SQL twin of
    * [[shippedD3TreeGrangerOut]]; yields `granger_out` with folded
    * cause/effect (deci grain, the n5000 magnitude budget).
    */
  private def shippedD3TreeGrangerSqlCtes: String =
    s"""${graft.ops.Lagged.nearestLagIndexSqlCtes("csv", "\"time\"",
        Seq("cfg"), materialized = true)},
       |pan AS MATERIALIZED (
       |  SELECT cfg, 'X1' AS series, t, floor(X1 * 10)::BIGINT AS v
       |  FROM csv WHERE X1 IS NOT NULL
       |  UNION ALL SELECT cfg, 'X2', t, floor(X2 * 10)::BIGINT FROM csv
       |  WHERE X2 IS NOT NULL
       |  UNION ALL SELECT cfg, 'X3', t, floor(X3 * 10)::BIGINT FROM csv
       |  WHERE X3 IS NOT NULL
       |  UNION ALL SELECT cfg, 'X4', t, floor(X4 * 10)::BIGINT FROM csv
       |  WHERE X4 IS NOT NULL),
       |gl AS (
       |  SELECT lx.cfg || '|' || cp.series AS cause,
       |    lx.cfg || '|' || e.series AS effect,
       |    e.v AS yv, ep.v AS pv, cp.v AS qv
       |  FROM lx
       |  JOIN pan e ON e.cfg = lx.cfg AND e.t = lx.t
       |  JOIN pan ep ON ep.cfg = lx.cfg AND ep.series = e.series
       |    AND ep.t = lx.lag_idx
       |  JOIN pan cp ON cp.cfg = lx.cfg AND cp.t = lx.lag_idx
       |  WHERE cp.series <> e.series),
       |${graft.metrics.Causal.grangerDecideSqlCtes("gl", 422L)}"""
      .stripMargin

  /** q340/q341's shared cfg-folded PC panel + skeleton CTE block
    * downstream of [[shippedD3TreeCsvCte]] — the SQL twin of
    * [[shippedD3TreeFoldedPanel]] + `pcSkeletonSqlCtes`; yields
    * `pc_out` on folded keys (milli grain, 200-obs window).
    */
  private def shippedD3TreePcFoldSqlCtes: String =
    s"""panel AS MATERIALIZED (
       |  SELECT cfg || '|X1' AS series,
       |    cfg || '|' || lpad(t::VARCHAR, 3, '0') AS day,
       |    floor(X1 * 1000)::BIGINT AS v
       |  FROM csv WHERE X1 IS NOT NULL AND t < 200
       |  UNION ALL
       |  SELECT cfg || '|X2', cfg || '|' || lpad(t::VARCHAR, 3, '0'),
       |    floor(X2 * 1000)::BIGINT
       |  FROM csv WHERE X2 IS NOT NULL AND t < 200
       |  UNION ALL
       |  SELECT cfg || '|X3', cfg || '|' || lpad(t::VARCHAR, 3, '0'),
       |    floor(X3 * 1000)::BIGINT
       |  FROM csv WHERE X3 IS NOT NULL AND t < 200
       |  UNION ALL
       |  SELECT cfg || '|X4', cfg || '|' || lpad(t::VARCHAR, 3, '0'),
       |    floor(X4 * 1000)::BIGINT
       |  FROM csv WHERE X4 IS NOT NULL AND t < 200),
       |${graft.metrics.Causal.pcSkeletonSqlCtes("panel")}""".stripMargin

  /** Per-graph orientation-aware scoring CTEs shared by the q333/q340
    * oracles — the `Metrics.scoreAll` contract keyed by graphId: both
    * sides collapse to canonical unordered-pair direction flags, a full
    * join yields per-pair flags, and tp/fp/fn plus the reversal-charging
    * structural SHD reduce per graph. Consumes `$truthCte(graphId,
    * source, target)` and `$predCte(graphId, source, target)`; yields
    * `st_sc(g, tp, fp, fn, shd_structural)`.
    */
  private def scoreByGraphSqlCtes(truthCte: String = "st_truth",
      predCte: String = "st_pred"): String =
    s"""st_ct AS (
       |  SELECT graphId, least(source, target) AS u,
       |    greatest(source, target) AS v,
       |    max(CASE WHEN source <= target THEN 1 ELSE 0 END) AS t_fwd,
       |    max(CASE WHEN source > target THEN 1 ELSE 0 END) AS t_rev
       |  FROM $truthCte GROUP BY 1, 2, 3),
       |st_cp AS (
       |  SELECT graphId, least(source, target) AS u,
       |    greatest(source, target) AS v,
       |    max(CASE WHEN source <= target THEN 1 ELSE 0 END) AS p_fwd,
       |    max(CASE WHEN source > target THEN 1 ELSE 0 END) AS p_rev
       |  FROM $predCte GROUP BY 1, 2, 3),
       |st_j AS (
       |  SELECT coalesce(t.graphId, p.graphId) AS g,
       |    coalesce(t.t_fwd, 0) AS t_fwd, coalesce(t.t_rev, 0) AS t_rev,
       |    coalesce(p.p_fwd, 0) AS p_fwd, coalesce(p.p_rev, 0) AS p_rev
       |  FROM st_ct t FULL JOIN st_cp p
       |    ON p.graphId = t.graphId AND p.u = t.u AND p.v = t.v),
       |st_sc AS (
       |  SELECT g,
       |    sum(t_fwd * p_fwd + t_rev * p_rev) AS tp,
       |    sum(p_fwd * (1 - t_fwd) + p_rev * (1 - t_rev)) AS fp,
       |    sum(t_fwd * (1 - p_fwd) + t_rev * (1 - p_rev)) AS fn,
       |    sum(CASE WHEN t_fwd + t_rev = 1 AND p_fwd + p_rev = 1
       |          AND t_fwd <> p_fwd THEN 1
       |        ELSE abs(t_fwd - p_fwd) + abs(t_rev - p_rev) END)
       |      AS shd_structural
       |  FROM st_j GROUP BY 1)""".stripMargin

  /** q315's truth edge list (A1 4-var lag-2, enumeration-indexed) and cell
    * count — ONE Scala value rendered into both engines (NdcgDisc pattern).
    */
  private val ShdPanelEdges: Vector[(Int, String, Int, String)] =
    graft.core.Parser.truthLinks("A1", 4, 2).zipWithIndex
      .map { case (l, i) => (i, l.source, l.lag, l.target) }.toVector
  private val ShdPanelEdgesSqlValues: String =
    ShdPanelEdges.map { case (i, src, lg, tgt) =>
      s"($i, '$src', $lg, '$tgt')" }.mkString(", ")
  private val ShdPanelTotalCells: Long = 4L * 4L * (2L + 1L)

  /** Quantized log2 in micro units for q320: exact LUT for 1..7, then
    * octave (bit-length) + 4-bit-mantissa LUT — the q319 bucket key
    * doubling as a logarithm, one Scala constant rendered into both
    * engines (the shift spelling is the only dialect difference).
    */
  private def qlog2Expr(v: String, isSpark: Boolean): String = {
    def l2(x: Int) = Math.round(Math.log(x.toDouble) / Math.log(2.0) * 1e6)
    val small = (1 to 7).map(i => s"WHEN $v = $i THEN ${l2(i)}")
      .mkString(" ")
    val hi =
      if (isSpark) s"$v div shiftleft(1L, cast(length(bin($v)) - 4 as int))"
      else s"$v // (1::BIGINT << (length(bin($v)) - 4))"
    val lut = (8 to 15).map(h => s"WHEN $h THEN ${l2(h)}").mkString(" ")
    s"(CASE $small ELSE cast(length(bin($v)) - 4 as bigint) * 1000000 + " +
      s"(CASE $hi $lut ELSE 0 END) END)"
  }

  /** q317's power-iteration count — one Scala constant driving both the
    * Spark loop and the generated DuckDB CTE chain.
    */
  private val PcaIters = 6

  /** q317/q318 shared pipeline: the converged ppm component `w(dim, w)` —
    * exact-integer centered covariance + `PcaIters` unrolled power
    * iterations (see the q317 comment for the magnitude budget).
    *
    * The covariance comes from [[graft.ops.CovVec.suffStats]] over the 64
    * quantized array slots: ONE `TypedImperativeAggregate`-backed pass over
    * the fact rows (n + 64 sums + 2,080 upper-triangle products
    * accumulated in a single primitive-array buffer with BigInteger
    * overflow carry — exact at any row count), map-side combined, so the
    * shuffle carries one sufficient-statistics row, never vector rows.
    * This replaces the r9 [[graft.ops.CovMatrix.pairSums]] encoding of the
    * same shape, whose 2,145 DECIMAL(38,0) agg expressions + 2,016-struct
    * explode cost ~20 s of DRIVER analysis/codegen per query regardless of
    * data size; the data-pass shape (one aggregate, single-row shuffle) is
    * unchanged and the iteration arithmetic stays bit-identical to the
    * oracle's HUGEINT formulation.
    */
  /** The quantized embedding slots both PCA stages aggregate over. */
  private def pcaQuant: Column =
    transform(col("embedding"), v => floor(v * lit(1e6)))

  private[graft] def pcaSuffStats(s: SparkSession, d: String): DataFrame =
    graft.ops.CovVec.suffStats(embeddings(s, d), pcaQuant, 64)

  /** q331's centered covariance cells (da, db, c) decoded from the one
    * sufficient-statistics row — a 2,080-row broadcast index maps pair
    * positions onto (da, db), the strict-upper pairs mirror, and the cell
    * is the numerator n·Σab − Σa·Σb. Everything after the single
    * `CovVec.suffStats` aggregate touches ≤ 4,096 rows.
    */
  private[graft] def pcaCovCells(s: SparkSession, d: String): DataFrame =
    covCellsFrom(s, pcaSuffStats(s, d).localCheckpoint(false))

  /** The decode half of [[pcaCovCells]], reusable over ANY (pos, v)
    * sufficient-statistics frame (q335 feeds it the combined one-pass
    * aggregate's ss array instead of running a second fact scan).
    */
  private def covCellsFrom(s: SparkSession, ex: DataFrame): DataFrame = {
    val k = 64
    import s.implicits._
    val idx = (for { i <- 0 until k; j <- i until k }
      yield (1 + k + i * k - i * (i - 1) / 2 + (j - i), i, j))
      .toDF("pos", "da", "db")
    val nRow = ex.where(col("pos") === 0).select(col("v").as("n"))
    val sums = ex.where(col("pos").between(1, k))
      .select((col("pos") - 1).cast("int").as("dim"), col("v").as("sm"))
    val prods = ex.where(col("pos") > k).join(broadcast(idx), "pos")
      .select(col("da"), col("db"), col("v").as("sab"))
    val both = prods.unionByName(prods.where(col("da") =!= col("db"))
      .select(col("db").as("da"), col("da").as("db"), col("sab")))
    both
      .join(broadcast(sums.select(col("dim").as("da"), col("sm").as("sma"))),
        Seq("da"))
      .join(broadcast(sums.select(col("dim").as("db"), col("sm").as("smb"))),
        Seq("db"))
      .crossJoin(broadcast(nRow))
      .select(col("da"), col("db"),
        (col("n") * col("sab") - col("sma") * col("smb")).as("c"), col("n"))
  }

  /** q317/q318 component as ONE row (warr: 64 ppm longs): a single
    * `CovVec.topComponent` job — the covariance assembly and all
    * `PcaIters` power-iteration rounds run in the aggregate's `finish`
    * (O(k²·iters) exact BigInteger arithmetic on the sufficient-statistics
    * buffer), so the r9 pipeline's six 64-row scheduler round-trips
    * (checkpointed cov + iteration snaps) collapse into the one data pass.
    */
  private def pcaComponentRow(s: SparkSession, d: String): DataFrame =
    graft.ops.CovVec.topComponentArr(embeddings(s, d), pcaQuant, 64, PcaIters)
  private def pcaIterSqlCtes: String = {
    val sb = new StringBuilder
    sb.append("w0 AS (SELECT dim, 1000000::HUGEINT AS w FROM sums)")
    for (k <- 1 to PcaIters) {
      sb.append(s""",
        |i$k AS (
        |  SELECT c.da AS dim, sum(c.c * w.w) AS cw
        |  FROM cov c JOIN w${k - 1} w ON w.dim = c.db GROUP BY 1),
        |w$k AS (
        |  SELECT dim,
        |    CASE WHEN mx = 0 THEN 0 ELSE (cw * 1000000) // mx END AS w
        |  FROM i$k, (SELECT max(abs(cw)) AS mx FROM i$k))""".stripMargin)
    }
    sb.toString
  }

  /** The full q317 pipeline as CTEs (vm → covariance → `w$PcaIters`),
    * shared verbatim by the q317 and q318 oracles.
    */
  private lazy val PcaSqlCtes: String =
    s"""vm AS (
      |  SELECT vec_id, u.d AS dim,
      |    floor(embedding[u.d + 1] * 1e6)::BIGINT AS m
      |  FROM embeddings,
      |  LATERAL (SELECT unnest(range(0, 64)) AS d) u),
      |nn AS (SELECT count(DISTINCT vec_id)::HUGEINT AS n FROM vm),
      |sums AS (SELECT dim, sum(m)::HUGEINT AS sm FROM vm GROUP BY 1),
      |prods AS (
      |  SELECT a.dim AS da, b.dim AS db,
      |    sum(a.m::HUGEINT * b.m) AS sab
      |  FROM vm a JOIN vm b USING (vec_id) GROUP BY 1, 2),
      |cov AS (
      |  SELECT p.da, p.db, n.n * p.sab - sa.sm * sb.sm AS c
      |  FROM prods p
      |  JOIN sums sa ON sa.dim = p.da
      |  JOIN sums sb ON sb.dim = p.db, nn n),
      |$pcaIterSqlCtes""".stripMargin

  /** q286's quantized logistic confidence table over the clamped margin
    * bin: round(1e6 / (1 + e^(−bin/2))), bins −10..10 — one Scala
    * constant rendered into both engines.
    */
  private val SigmoidPpm: Map[Int, Long] =
    (-10 to 10).map(b =>
      b -> Math.round(1e6 / (1.0 + Math.exp(-b / 2.0)))).toMap
  private val SigmoidPpmCase: String =
    "CASE bin " + (-10 to 10).map(b =>
      s"WHEN $b THEN ${SigmoidPpm(b)}L").mkString(" ") + " ELSE 0L END"
  private val SigmoidPpmCaseSql: String =
    "CASE bin " + (-10 to 10).map(b =>
      s"WHEN $b THEN ${SigmoidPpm(b)}").mkString(" ") + " ELSE 0 END"

  /** Quantized trig tables for q283: round(cos/sin(2πk/period)·1e6) keyed
    * by day % period — one Scala constant rendered into both engines.
    */
  private def trigCase(fn: String, period: Int): String = {
    val f: Double => Double =
      if (fn == "cos") Math.cos else Math.sin
    "CASE day % " + period + " " + (0 until period).map { k =>
      s"WHEN $k THEN ${Math.round(f(2 * Math.PI * k / period) * 1e6)}"
    }.mkString(" ") + " ELSE 0 END"
  }

  /** q284's half-life-1-day decay weights, ppm: round(1e6 / 2^age). */
  private val DecayPpmCase: String =
    "CASE age_d " + (0 to 6).map { k =>
      s"WHEN $k THEN ${Math.round(1e6 / Math.pow(2, k))}L"
    }.mkString(" ") + " ELSE 0L END"
  private val DecayPpmCaseSql: String =
    "CASE age_d " + (0 to 6).map { k =>
      s"WHEN $k THEN ${Math.round(1e6 / Math.pow(2, k))}"
    }.mkString(" ") + " ELSE 0 END"

  /** q281's one ANSI text, parameterized only by the table name (Spark
    * runs it over a temp view, DuckDB over the parquet view).
    */
  private def LateralTopnSql(table: String): String =
    s"""SELECT p.prio, t.o_orderkey, t.total_milli
       |FROM (SELECT DISTINCT o_orderpriority AS prio FROM $table) p,
       |LATERAL (
       |  SELECT o_orderkey,
       |    cast(floor(o_totalprice * 1000) as bigint) AS total_milli
       |  FROM $table o
       |  WHERE o.o_orderpriority = p.prio
       |  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t""".stripMargin

  /** Benford expected first-digit frequencies, ppm: round(log10(1+1/d)·1e6)
    * — one Scala constant rendered into both engines' CASE expressions.
    */
  private val BenfordPpm: IndexedSeq[Long] =
    (1 to 9).map(dg => Math.round(Math.log10(1.0 + 1.0 / dg) * 1e6))
  private val BenfordPpmCase: String =
    "CASE digit " + BenfordPpm.zipWithIndex.map { case (v, i) =>
      s"WHEN ${i + 1} THEN cast($v as decimal(38,0))"
    }.mkString(" ") + " END"
  private val BenfordPpmCaseSql: String =
    "CASE digit " + BenfordPpm.zipWithIndex.map { case (v, i) =>
      s"WHEN ${i + 1} THEN $v::HUGEINT"
    }.mkString(" ") + " END"

  /** The q255 planted templates — embedded in both the Spark injection and
    * the DuckDB oracle. Deliberately OUTSIDE the corpus vocabulary (real
    * boilerplate is navigation/license English, not body prose); the
    * boundary grams (template tail × document head) differ per document,
    * so only the four fully-internal 5-grams of each template clear the
    * document-frequency bar.
    */
  private val BoilerTemplate =
    "terms of service apply all rights reserved contact"
  private val BoilerRareTemplate =
    "internal draft do not distribute pending review only"

  /** NDCG@5 integer discount table — 1e6 div bitlen(r+1) per rank and its
    * cumulative ideal prefix — rendered once here and embedded in BOTH the
    * Spark expressions and the DuckDB oracle, the single source of truth
    * for the quantized log.
    */
  private val NdcgDisc: Seq[Long] =
    (1 to 5).map(r => 1000000L / java.lang.Long.toBinaryString(r + 1L).length)
  private val NdcgDiscCase: String =
    "CASE rank " + (1 to 5).map(r => s"WHEN $r THEN ${NdcgDisc(r - 1)}L")
      .mkString(" ") + " END"
  private val NdcgIdealCase: String =
    "CASE nrel " + (1 to 5).map(n =>
      s"WHEN $n THEN ${NdcgDisc.take(n).sum}L").mkString(" ") + " END"

  /** The same two CASE tables without Spark's `L` literal suffix (DuckDB
    * BIGINT literals are bare).
    */
  private val NdcgDiscCaseSql: String = NdcgDiscCase.replace("L ", " ")
  private val NdcgIdealCaseSql: String = NdcgIdealCase.replace("L ", " ")

  /** The q195/q197 dirty-name registry: every customer record plus
    * deterministic mutations — a transposed-prefix duplicate (custkey%3),
    * a dropped-letter duplicate (custkey%5), and a different-entity decoy
    * (custkey%7) — in disjoint id spaces. The mutations only touch the
    * alphabetic prefix, so the digit payload `right(name, 9)` is the
    * blocking key that survives every corruption.
    */
  /** The contracted nation→nation trade graph shared by q86 (PageRank),
    * q254 (HITS), q258 (closeness), q260 (modularity): supplier-nation →
    * customer-nation weighted by lineitem count. The ONLY fact-scale stage
    * of the graph family — the orders⋈lineitem shuffle with broadcast
    * dims; everything downstream runs on ≤ |nations|² rows.
    */
  private def nationTradeEdges(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val ord = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val cust = customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val supp = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    val srcN = nation(s, d).select(col("n_nationkey").as("src_key"),
      col("n_name").as("src"))
    val dstN = nation(s, d).select(col("n_nationkey").as("dst_key"),
      col("n_name").as("dst"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("s_nationkey").as("src_key"),
        col("c_nationkey").as("dst_key"))
      .agg(count(lit(1)).as("w"))
      .join(broadcast(srcN), "src_key").join(broadcast(dstN), "dst_key")
      .select(col("src"), col("dst"), col("w"))
  }

  private def erRegistry(s: SparkSession, d: String): DataFrame = {
    val base = customer(s, d).select(col("c_custkey").as("id"),
      col("c_name").as("name"))
    def variant(mod: Int, offset: Long, to: String) =
      customer(s, d).where(col("c_custkey") % mod === 0)
        .select((col("c_custkey") + offset).as("id"),
          expr(s"replace(c_name, 'Customer#', '$to')").as("name"))
    base
      .unionByName(variant(3, 10000000L, "Custmoer#"))
      .unionByName(variant(5, 20000000L, "Custmer#"))
      .unionByName(variant(7, 30000000L, "Vendor#"))
      .withColumn("blk", expr("right(name, 9)"))
  }

  /** Blocked candidate pairs over [[erRegistry]] with builtin levenshtein
    * attached; id_a < id_b orders each unordered pair once.
    */
  private def erCandidates(s: SparkSession, d: String): DataFrame = {
    val reg = erRegistry(s, d)
    reg.as("a").join(reg.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"),
        expr("levenshtein(a.name, b.name)").cast("long").as("lev"))
  }

  /** Exact-integer correlation block shared by q150/q151: over paired
    * series values (x, y), all five sums are DECIMAL(38,0) (order-
    * insensitive), and cov = n·Σxy−Σx·Σy, varx/vary likewise, stay exact
    * integers. The final slope (milli) and r² (ppm) divide those identical
    * integers as doubles — deterministic under any partition topology and
    * bit-equal to the DuckDB mirror (HUGEINT sums, same formula text).
    * r² carries no sign, so cov_sign is emitted alongside; zero-variance
    * groups yield null slope/r² on both sides.
    */
  private[graft] def pairCorr(pairs: DataFrame, keys: Seq[String]): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    pairs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
      .withColumn("cov",
        expr("cast(n_pairs as decimal(38,0)) * sxy - sx * sy"))
      .withColumn("varx",
        expr("cast(n_pairs as decimal(38,0)) * sxx - sx * sx"))
      .withColumn("vary",
        expr("cast(n_pairs as decimal(38,0)) * syy - sy * sy"))
      .select(keys.map(col) ++ Seq(col("n_pairs"),
        expr("cast(case when cov > 0 then 1 when cov < 0 then -1 " +
          "else 0 end as bigint)").as("cov_sign"),
        expr("cast(case when varx = 0 then null else " +
          "floor(cast(cov as double) / cast(varx as double) * 1000 + 0.5) " +
          "end as bigint)").as("slope_milli"),
        expr("cast(case when varx = 0 or vary = 0 then null else " +
          "floor(cast(cov as double) * cast(cov as double) " +
          "/ (cast(varx as double) * cast(vary as double)) * 1e6 + 0.5) " +
          "end as bigint)").as("r2_ppm")): _*)
  }

  /** DuckDB mirror of [[pairCorr]] as a SQL fragment: expects a CTE `p`
    * with columns (groupCols..., x, y); emits the g/c CTEs plus the final
    * SELECT. Shared text so q150/q151's oracles cannot drift from each
    * other.
    */
  private def pairCorrSql(groupCols: String): String =
    s"""g AS (
       |  SELECT $groupCols, count(*)::HUGEINT AS n,
       |    sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
       |    sum(x::HUGEINT * y)::HUGEINT AS sxy,
       |    sum(x::HUGEINT * x)::HUGEINT AS sxx,
       |    sum(y::HUGEINT * y)::HUGEINT AS syy
       |  FROM p GROUP BY ALL),
       |c AS (
       |  SELECT $groupCols, n, n*sxy - sx*sy AS cov,
       |    n*sxx - sx*sx AS varx, n*syy - sy*sy AS vary FROM g)
       |SELECT $groupCols, n::BIGINT AS n_pairs,
       |  (CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0
       |    END)::BIGINT AS cov_sign,
       |  (CASE WHEN varx = 0 THEN NULL ELSE
       |    floor(cov::DOUBLE / varx::DOUBLE * 1000 + 0.5)
       |    END)::BIGINT AS slope_milli,
       |  (CASE WHEN varx = 0 OR vary = 0 THEN NULL ELSE
       |    floor(cov::DOUBLE * cov::DOUBLE
       |      / (varx::DOUBLE * vary::DOUBLE) * 1e6 + 0.5)
       |    END)::BIGINT AS r2_ppm
       |FROM c""".stripMargin

  /** q83's snapshot/update boundary: 2024-01-16T00:00:00Z in epoch µs
    * (events span 2024-01-01 .. 2024-01-30) — shared with the oracle.
    */
  private val UpsertMidUs: Long = 1705363200000000L

  /** 96 synthetic boilerplate tokens shared by q73's Spark side and oracle —
    * the cross-doc duplicated span. Only the offset-0 chunk (tokens 1-64) is
    * fully boilerplate and therefore cross-doc duplicated; the offset-48
    * window mixes bp48-bp95 with each doc's own first 16 tokens, so boosted
    * docs contribute exactly ONE duplicated chunk each.
    */
  private val Boilerplate: String = (0 until 96).map(i => s"bp$i").mkString(" ")

  // ---------------------------------------------------------------------------

  private val stopList = "'the','a','of','and','to','in','is','on','for','with'"

  /** Shared q15/q16 oracle prelude: distinct 3-gram shingles per doc and
    * their 31-poly hashes (the MinHash input universe).
    */
  // CTE list WITHOUT the leading WITH so callers can choose plain WITH vs
  // WITH RECURSIVE (q61 chains a recursive reachability CTE onto these)
  private lazy val ShingleHashCte =
    s"""sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(0, greatest(len(string_split(text,' ')) - 2, 0)),
      |    i -> array_to_string(list_slice(string_split(text,' '), i + 1, i + 3), ' ')))) AS shingle
      |  FROM documents),
      |h AS (SELECT doc_id, ${fingerprintSql("shingle", "j")} AS h FROM sh)""".stripMargin

  /** The curation predicates q64 (funnel) and q66 (per-doc decisions) share
    * — ONE definition per threshold on each engine side, so the two queries
    * (and their oracles) cannot drift apart when a bound is tuned.
    */
  private object Curation {
    import org.apache.spark.sql.Column
    private def nTok = size(TextOps.tokensCol(col("text")))
    private def nChars = length(col("text"))
    def langEn: Column = col("lang_pred") === "en"
    // 50+ tokens with mean token length in [3,10]: integer cross-
    // multiplication of (n_chars − n_tokens + 1) / n_tokens
    def lenOk: Column = nTok >= 50 &&
      (nChars - nTok + 1) >= nTok * 3 && (nChars - nTok + 1) <= nTok * 10
    def notRepetitive: Column = {
      // closed-form total + native-expression distinct (shared q57 kernel)
      // instead of materializing the HOF shingle array twice per row
      val sc = TextOps.shingleCounts(col("text"), 3)
      val nSh = sc.getField("n_shingles")
      val nDsh = sc.getField("n_distinct_shingles")
      !((nSh - nDsh) * 5 > nSh)
    }
    // DuckDB fragments over the (n_tokens, n_chars, n_sh, n_dsh) CTE names
    val LenOkSql = "(n_tokens >= 50 AND n_chars - n_tokens + 1 >= 3 * n_tokens" +
      " AND n_chars - n_tokens + 1 <= 10 * n_tokens)"
    val NotRepetitiveSql = "(NOT (5 * (n_sh - n_dsh) > n_sh))"
  }

  /** DuckDB mirror of TextOps.fingerprint over the string expression `x` —
    * THE definition of the rolling-hash contract, shared by every
    * fingerprint-bearing oracle (q12, the shingle/token hashes, q26/q50
    * content hashes, q62/q66 sampling buckets, q68/q69). `iv` renames the
    * lambda index where the surrounding scope already binds `i`.
    */
  private def fingerprintSql(x: String, iv: String = "i"): String =
    s"list_reduce(list_prepend(0::BIGINT, " +
      s"list_transform(range(1, length($x) + 1), $iv -> ascii(substr($x, $iv::INT, 1))::BIGINT)), " +
      s"(a, b) -> (a * 31 + b) % 2147483647)"

  /** DuckDB mirror of TextOps.langId's argmax-with-tie-break — the CASE
    * prioritizes language codes in order, exactly the greatest-of-structs
    * tie-break on the Spark side. Shared by q11 and q64.
    */
  private val LangPredCaseSql: String = {
    def score(words: Seq[String]) =
      s"len(list_filter(string_split(text, ' '), t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
    val de = score(Seq("der", "die", "und", "nicht", "das", "ist", "du", "ich", "ein", "mit"))
    val en = score(Seq("the", "and", "is", "of", "to", "a", "in", "that", "it", "for"))
    val es = score(Seq("el", "la", "que", "de", "no", "los", "una", "por", "con", "para"))
    val fr = score(Seq("le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"))
    val zh = score(Seq("de", "shi", "bu", "wo", "ni", "ta", "zai", "le", "you", "men"))
    s"""CASE
       |    WHEN $de >= $en AND $de >= $es AND $de >= $fr AND $de >= $zh THEN 'de'
       |    WHEN $en >= $es AND $en >= $fr AND $en >= $zh THEN 'en'
       |    WHEN $es >= $fr AND $es >= $zh THEN 'es'
       |    WHEN $fr >= $zh THEN 'fr'
       |    ELSE 'zh' END""".stripMargin
  }

  /** CTE chain (no leading WITH) ending in `pairs(id_a, id_b, est_jaccard)`
    * — the exact q16 LSH candidate-pair set, shared verbatim by q16 and by
    * q61's recursive-closure oracle so both compare against the same pairs.
    */
  private val MinhashPairsCtes: String = {
    val mins = graft.text.Dedup.MinhashCoefs.zipWithIndex.map { case ((a, b), i) =>
      s"min((h * $a + $b) % 2147483647)::BIGINT AS mh_$i"
    }.mkString(",\n  ")
    val nBands = 4; val rows = 4
    def bucketExpr(b: Int) = (0 until rows).foldLeft("0") { (acc, i) =>
      s"(($acc * 1000003 + mh_${b * rows + i}) % 2147483647)"
    }
    val mhList = (0 until 16).map(i => s"mh_$i").mkString(", ")
    val bandSelects = (0 until nBands).map(b =>
      s"SELECT doc_id, $b AS band, ${bucketExpr(b)} AS bucket, $mhList FROM sig"
    ).mkString("\n  UNION ALL\n  ")
    val matches = (0 until 16).map(i => s"(CASE WHEN a.mh_$i = b.mh_$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""$ShingleHashCte,
       |sig AS (SELECT doc_id, $mins FROM h GROUP BY doc_id),
       |banded AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    round(($matches)::DOUBLE / 16, 6) AS est_jaccard
       |  FROM banded a
       |  JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  WHERE round(($matches)::DOUBLE / 16, 6) >= 0.25)""".stripMargin
  }

  /** Sliding-window replay both sliding queries share (q103 single-batch,
    * q109 multi-batch — complete output mode makes the final table
    * identical): every event × its 5 slide offsets.
    */
  private val SlidingWindowOracleSql =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) AS ts_us,
      |    floor(value * 1e6)::BIGINT AS vm
      |  FROM events),
      |w AS (
      |  SELECT event_type, vm,
      |    ((ts_us // 60000000) - i) * 60000000 AS window_start_us
      |  FROM ev, range(0, 5) r(i))
      |SELECT window_start_us, event_type, count(*)::BIGINT AS n_events,
      |  sum(vm)::BIGINT AS sum_value_micro
      |FROM w GROUP BY 1, 2""".stripMargin

  /** The gap-sessionization + watermark-finality emission model both
    * session queries share (q40 single-batch, q55 multi-batch — finality
    * makes the emitted set identical).
    */
  private val SessionFinalityOracleSql =
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
        |flagged AS (
        |  SELECT user_id, ts_us, value,
        |    CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, value)
        |              > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM ev),
        |sess AS (
        |  SELECT user_id, ts_us, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, value
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged),
        |agg AS (
        |  SELECT user_id, sid, min(ts_us) AS start_us, max(ts_us) AS end_us,
        |    count(*)::INT AS n_events,
        |    sum(floor(value * 1e6)::BIGINT)::BIGINT AS sum_value_micro
        |  FROM sess GROUP BY user_id, sid),
        |wm AS (SELECT max(ts_us) // 1000 - 3600000 AS wm_ms FROM ev)
        |SELECT a.user_id, a.start_us, a.end_us, a.n_events, a.sum_value_micro
        |FROM agg a, wm
        |WHERE a.end_us + 1800000000 < wm.wm_ms * 1000""".stripMargin

  /** Batch-equal windowed aggregation (q18 single-batch, q56 multi-batch —
    * complete output mode is decomposition-invariant).
    */
  private val WindowAggOracleSql =
    """SELECT (epoch_us(ts) // 300000000) * 300000000 AS window_start_us, event_type,
      |  count(*) AS n_events,
      |  sum(floor(value * 1e6)::BIGINT)::BIGINT AS sum_value_micro
      |FROM events GROUP BY 1, 2""".stripMargin

  /** q177's per-config digest over a named kernel dump — shared with the
    * `_gen` artifact row, which pins the same contract on its own dump.
    */
  private def sweepDigestOracleSql(dump: String): String =
    s"""SELECT configId AS config_id, family, count(*) AS n_rows,
      |  sum(floor(greatest(least(X1, 1e6), -1e6) * 1e6)::BIGINT)::BIGINT
      |    AS sum_x1c_micro,
      |  sum(CASE WHEN abs(X1) > 1e6 THEN 1 ELSE 0 END)::BIGINT AS n_clipped,
      |  sum(floor("time" * 1e6)::BIGINT)::BIGINT AS sum_time_micro,
      |  sum(maskBits)::BIGINT AS mask_sum
      |FROM read_parquet('__GEN_DIR__/$dump/*.parquet')
      |GROUP BY 1, 2""".stripMargin

  /** q189's integer BM25 ranking — shared with the q190 hybrid fusion and
    * (with a non-default `maxDfPermille`) the q227 stopword-capped variant.
    * The div chain floors at the same three points on both engines. The
    * Spark side's posting-join salting is score-preserving by construction,
    * so the oracle needs no mirror of it.
    */
  private def bm25OracleSql(k: Int, maxDfPermille: Int = 1000): String =
    s"""SELECT query_id, cand_id, score_milli, rank FROM (
      |  WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |               FROM documents),
      |  tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
      |  dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
      |  st AS (SELECT count(*)::BIGINT AS n_docs,
      |           (sum(dl) * 1000) // count(*) AS avg_milli FROM dl),
      |  dfreq AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY 1),
      |  post AS (
      |    SELECT f.doc_id, f.tok,
      |      (length(bin(a.n_docs // d.df))::BIGINT * f.tf * 2200 * 1000) //
      |      (f.tf * 1000 + 300 +
      |       (900 * ((l.dl * 1000000) // a.avg_milli)) // 1000) AS c_milli
      |    FROM tf f JOIN dl l USING (doc_id) JOIN dfreq d USING (tok)
      |    CROSS JOIN st a
      |    WHERE d.df * 1000 <= a.n_docs * $maxDfPermille),
      |  q AS (SELECT DISTINCT doc_id AS query_id, tok FROM tok
      |        WHERE doc_id % 50 = 0),
      |  sc AS (SELECT q.query_id, p.doc_id AS cand_id,
      |           sum(p.c_milli)::BIGINT AS score_milli
      |         FROM q JOIN post p USING (tok) GROUP BY 1, 2)
      |  SELECT query_id, cand_id, score_milli,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY score_milli DESC, cand_id) AS rank
      |  FROM sc)
      |WHERE rank <= $k""".stripMargin

  /** q14's exact cosine top-5 oracle — shared with the q147 recall audit
    * and (with the q190 probe set) the hybrid-retrieval fusion.
    */
  private def cosineTopkOracleSql(k: Int,
      probePred: String = "q.vec_id < 10",
      table: String = "embeddings"): String =
    s"""SELECT query_id, cand_id, cos, rank FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |    round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
      |      (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
      |       sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) AS cos,
      |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |      round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
      |        (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
      |         sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) DESC,
      |      c.vec_id) AS rank
      |  FROM $table q, $table c
      |  WHERE $probePred AND q.vec_id <> c.vec_id)
      |WHERE rank <= $k""".stripMargin

  private val CosineTopkOracleSql = cosineTopkOracleSql(5)

  /** Raw dot-product (max-inner-product) ranking mirror of
    * [[Similarity.dotTopK]] — shared by the q155 fusion oracle.
    */
  private def dotTopkOracleSql(k: Int): String =
    s"""SELECT query_id, cand_id, dp, rank FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |    round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS dp,
      |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |      round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
      |      c.vec_id) AS rank
      |  FROM embeddings q, embeddings c
      |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
      |WHERE rank <= $k""".stripMargin

  /** q49's IVF top-5 oracle (cell assignment + probe ranking mirrored
    * exactly) — shared with the q147 recall audit.
    */
  private val IvfTopkOracleSql = {
    def cdist(v: String, c: String) =
      s"""list_dot_product($v, $c) /
         |      (sqrt(list_dot_product($v, $v)) * sqrt(list_dot_product($c, $c)))""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cents AS (SELECT vec_id AS cell_id, v AS centroid FROM e
       |          ORDER BY vec_id LIMIT 16),
       |corp AS (
       |  SELECT vec_id AS cand_id, v AS cv, cell_id FROM (
       |    SELECT e.vec_id, e.v, c.cell_id,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cdist("e.v", "c.centroid")} DESC, c.cell_id) AS crank
       |    FROM e CROSS JOIN cents c)
       |  WHERE crank = 1),
       |qs AS (
       |  SELECT vec_id AS query_id, v AS qv, cell_id FROM (
       |    SELECT e.vec_id, e.v, c.cell_id,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cdist("e.v", "c.centroid")} DESC, c.cell_id) AS crank
       |    FROM e CROSS JOIN cents c WHERE e.vec_id < 10)
       |  WHERE crank <= 4),
       |cand AS (
       |  SELECT q.query_id, c.cand_id,
       |    round(${cdist("q.qv", "c.cv")}, 6) AS cos
       |  FROM qs q JOIN corp c ON q.cell_id = c.cell_id AND q.query_id <> c.cand_id)
       |SELECT query_id, cand_id, cos, rank FROM (
       |  SELECT query_id, cand_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
       |  FROM cand)
       |WHERE rank <= 5""".stripMargin
  }

  /** q235's SQL — ONE ANSI string both engines execute verbatim (the
    * Spark side over temp views, the oracle over DuckDB's parquet views):
    * a depth-bounded recursive walk census, seeded at the smallest nation
    * with outgoing edges (data-derived — nation 0 has no suppliers at
    * small SFs), over the distinct supplier→customer nation edges. `n_walks` counts WALKS (the
    * UNION ALL keeps duplicates), so the recursion semantics — seed,
    * step, bound — are pinned, not just the reachable set.
    */
  private def RecursiveReachSql(li: String, ord: String, sup: String,
      cust: String): String =
    s"""WITH RECURSIVE edges AS (
       |  SELECT DISTINCT s_nationkey AS u, c_nationkey AS v
       |  FROM $li
       |  JOIN $ord ON l_orderkey = o_orderkey
       |  JOIN $sup ON l_suppkey = s_suppkey
       |  JOIN $cust ON o_custkey = c_custkey
       |  WHERE s_nationkey <> c_nationkey),
       |walk(node, hops) AS (
       |  SELECT CAST(min(u) AS BIGINT) AS node, CAST(0 AS BIGINT) AS hops
       |  FROM edges
       |  UNION ALL
       |  SELECT CAST(e.v AS BIGINT), w.hops + 1
       |  FROM walk w JOIN edges e ON e.u = w.node
       |  WHERE w.hops < 3)
       |SELECT node, min(hops) AS min_hops, count(*) AS n_walks
       |FROM walk GROUP BY node""".stripMargin

  /** Shared CTE chains for the perceptual-fingerprint oracles — ONE
    * definition of each modality's pixel/sample replay, so q239, q242 and
    * the q245 cross-modal capstone cannot drift apart. `ImageAHashCtes`
    * ends in `halves(id, base, lo, hi)`; `audioFpCtes(pred)` ends in
    * `afp(id, base, fp)`. No leading WITH.
    */
  private val ImageAHashCtes: String =
    """iids AS (
      |  SELECT doc_id AS id, doc_id // 4 AS base, (doc_id % 4) * 7 AS dl
      |  FROM documents),
      |dims AS (
      |  SELECT id, base, dl, 16 + base % 16 AS w, 12 + base % 8 AS h
      |  FROM iids),
      |px AS (
      |  SELECT id, base, j,
      |    least(((base * 2654435761 +
      |        ((((j // 8) * h) // 8) * w + ((j % 8) * w) // 8) * 40503)
      |       % 2147483648) % 256 + dl, 255) AS p
      |  FROM dims, range(64) t(j)),
      |sums AS (SELECT id, sum(p)::BIGINT AS sp FROM px GROUP BY 1),
      |bits AS (
      |  SELECT px.id, px.base, px.j,
      |    CASE WHEN 64 * px.p > s.sp THEN 1::BIGINT ELSE 0::BIGINT END
      |      AS bit
      |  FROM px JOIN sums s ON s.id = px.id),
      |halves AS (
      |  SELECT id, base,
      |    sum(CASE WHEN j < 32 THEN bit << j ELSE 0 END)::BIGINT AS lo,
      |    sum(CASE WHEN j >= 32 THEN bit << (j - 32) ELSE 0 END)::BIGINT
      |      AS hi
      |  FROM bits GROUP BY 1, 2)""".stripMargin

  private def audioFpCtes(pred: String): String =
    s"""aids AS (
      |  SELECT doc_id AS id, doc_id // 4 AS base, (doc_id % 4) * 5 AS dl
      |  FROM documents WHERE $pred),
      |sm AS (
      |  SELECT id, base, n,
      |    (((base + 7777) * 2654435761 + n * (40503 + 2 * base))
      |      % 2147483648) % 256 % 240 + dl AS s
      |  FROM aids, range(64) t(n)),
      |wc AS (
      |  SELECT sm.id, sm.base, k.k,
      |    sum(CASE WHEN bit_count(k.k & sm.n) % 2 = 0 THEN sm.s
      |             ELSE -sm.s END)::BIGINT AS w
      |  FROM sm, range(1, 33) k(k)
      |  GROUP BY 1, 2, 3),
      |afp AS (
      |  SELECT id, base,
      |    sum(CASE WHEN w > 0 THEN 1::BIGINT << (k - 1)
      |             ELSE 0 END)::BIGINT AS fp
      |  FROM wc GROUP BY 1, 2)""".stripMargin

  /** Winnowing-selection CTE chain over a relation `src(doc_id, text)` —
    * ONE definition shared by q246 and the q248 MOSS detector. Ends in
    * `sel(doc_id, n_shingles, sh, spos)`. No leading WITH.
    */
  private def winnowSelCtes(src: String): String =
    s"""wt AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM $src
      |  WHERE len(string_split(text, ' ')) >= 3),
      |g0 AS (
      |  SELECT doc_id, unnest(list_transform(range(0, len(t) - 2),
      |    i -> struct_pack(p := i,
      |      g := array_to_string(list_slice(t, i + 1, i + 3), ' '))))
      |    AS u
      |  FROM wt),
      |g AS (SELECT doc_id, u.p AS pos, ${fingerprintSql("u.g")} AS h
      |      FROM g0),
      |ns AS (SELECT doc_id, count(*)::BIGINT AS n_shingles FROM g
      |       GROUP BY 1),
      |wm AS (
      |  SELECT doc_id, pos,
      |    min(h * 4294967296 + (4294967295 - pos)) OVER (
      |      PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
      |  FROM g),
      |sel AS (
      |  SELECT DISTINCT w2.doc_id, ns.n_shingles,
      |    wmin // 4294967296 AS sh,
      |    4294967295 - wmin % 4294967296 AS spos
      |  FROM wm w2 JOIN ns ON ns.doc_id = w2.doc_id
      |  WHERE w2.pos <= ns.n_shingles - 4)""".stripMargin

  /** q241's oracle: the greedy k-center rounds unrolled — each round's
    * min-distance table over the not-yet-chosen points, the (dist DESC,
    * id) 1-row argmax, and the growing chosen set, with the engine's
    * micro-integer distance contract.
    */
  private def kCenterOracleSql(k: Int): String = {
    def d2(x: String, c: String) =
      s"floor((list_dot_product($x, $x) - 2.0 * list_dot_product($x, $c)" +
        s" + list_dot_product($c, $c)) * 1e6 + 0.5)::BIGINT"
    val rounds = (1 until k).map { i =>
      s"""d$i AS (
         |  SELECT p.vec_id, min(${d2("p.v", "cj.cv")}) AS dmin
         |  FROM e p CROSS JOIN (
         |    SELECT q.v AS cv FROM c${i - 1} ch
         |    JOIN e q ON q.vec_id = ch.id) cj
         |  WHERE p.vec_id NOT IN (SELECT id FROM c${i - 1})
         |  GROUP BY p.vec_id),
         |p$i AS (SELECT vec_id AS id, ${i}::BIGINT AS rnd, dmin AS dm
         |        FROM d$i ORDER BY dmin DESC, vec_id LIMIT 1),
         |c$i AS (SELECT id, rnd, dm FROM c${i - 1}
         |        UNION ALL SELECT id, rnd, dm FROM p$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (SELECT 0::BIGINT AS id, 0::BIGINT AS rnd, 0::BIGINT AS dm),
       |$rounds
       |SELECT rnd AS sel_round, id AS vec_id, dm AS dist_micro
       |FROM c${k - 1}""".stripMargin
  }

  /** q250's oracle: IVF-PQ with residual quantization replayed — coarse
    * L2 assignment, elementwise residuals, codebooks from the residuals
    * of ids [nCells, nCells+nCent), per-(vector, sub) argmin codes,
    * nProbe probed cells, residual ADC tables, integer ADC sums.
    */
  private def ivfPqOracleSql(k: Int, nCells: Int = 16, nProbe: Int = 4,
      nSub: Int = 4, subDim: Int = 16, nCent: Int = 16): String = {
    def d2(x: String, c: String) =
      s"floor((list_dot_product($x, $x) - 2.0 * list_dot_product($x, $c)" +
        s" + list_dot_product($c, $c)) * 1e6 + 0.5)::BIGINT"
    def sl(r: String) = s"list_slice($r, cb.sub * $subDim + 1," +
      s" cb.sub * $subDim + $subDim)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cents AS (SELECT vec_id AS cell_id, v AS cellv FROM e
       |          WHERE vec_id < $nCells),
       |resC AS (
       |  SELECT vec_id, cell_id,
       |    list_transform(range(1, ${nSub * subDim + 1}),
       |      i -> v[i] - cellv[i]) AS r
       |  FROM (
       |    SELECT e.vec_id, e.v, c.cell_id, c.cellv,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${d2("e.v", "c.cellv")}, c.cell_id) AS rk
       |    FROM e, cents c) WHERE rk = 1),
       |cb AS (
       |  SELECT s.s AS sub, (rc.vec_id - $nCells)::BIGINT AS cid,
       |    list_slice(rc.r, s.s * $subDim + 1, s.s * $subDim + $subDim)
       |      AS cs
       |  FROM resC rc, (SELECT unnest(range(0, $nSub)) AS s) s
       |  WHERE rc.vec_id >= $nCells AND rc.vec_id < ${nCells + nCent}),
       |codes AS (
       |  SELECT vec_id AS cand_id, cell_id, sub, cid AS code FROM (
       |    SELECT rc.vec_id, rc.cell_id, cb.sub, cb.cid,
       |      row_number() OVER (PARTITION BY rc.vec_id, cb.sub
       |        ORDER BY ${d2(sl("rc.r"), "cb.cs")}, cb.cid) AS rk
       |    FROM resC rc CROSS JOIN cb) WHERE rk = 1),
       |qprobe AS (
       |  SELECT query_id, cell_id, rq FROM (
       |    SELECT e.vec_id AS query_id, c.cell_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${d2("e.v", "c.cellv")}, c.cell_id) AS rk,
       |      list_transform(range(1, ${nSub * subDim + 1}),
       |        i -> e.v[i] - c.cellv[i]) AS rq
       |    FROM e, cents c WHERE e.vec_id < 10) WHERE rk <= $nProbe),
       |qtab AS (
       |  SELECT q.query_id, q.cell_id, cb.sub, cb.cid AS code,
       |    ${d2(sl("q.rq"), "cb.cs")} AS qd
       |  FROM qprobe q CROSS JOIN cb),
       |sc AS (
       |  SELECT q.query_id, cd.cand_id, sum(q.qd)::BIGINT AS adc_micro
       |  FROM codes cd JOIN qtab q ON q.cell_id = cd.cell_id
       |    AND q.sub = cd.sub AND q.code = cd.code
       |  WHERE q.query_id <> cd.cand_id
       |  GROUP BY 1, 2)
       |SELECT query_id, cand_id, adc_micro, rank FROM (
       |  SELECT query_id, cand_id, adc_micro,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_micro, cand_id) AS rank
       |  FROM sc)
       |WHERE rank <= $k""".stripMargin
  }

  /** q233's oracle: the q192 neighbor graph, then `rounds` synchronous
    * label-propagation updates unrolled as identical CTE blocks —
    * neighbor votes UNION the self-vote, (count DESC, label ASC) winner —
    * and the community-size census.
    */
  private def lpaOracleSql(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      val prev = s"l${i - 1}"
      s"""v$i AS (
         |  SELECT node, lbl, count(*)::BIGINT AS c FROM (
         |    SELECT e.u AS node, l.lbl FROM e JOIN $prev l ON l.node = e.v
         |    UNION ALL SELECT node, lbl FROM $prev)
         |  GROUP BY 1, 2),
         |l$i AS (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl,
         |      row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl)
         |        AS r
         |    FROM v$i) WHERE r = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (
       |  SELECT c_custkey AS id, (c_custkey * 48271) % 100000 AS x,
       |    (c_custkey * 69621) % 100000 AS y
       |  FROM customer),
       |c AS (SELECT id, x, y, x // 2000 AS cx, y // 2000 AS cy FROM p),
       |o AS (SELECT dx, dy FROM (VALUES (-1), (0), (1)) a(dx),
       |      (VALUES (-1), (0), (1)) b(dy)),
       |pr AS (
       |  SELECT a.id AS a_id, a.x AS ax, a.y AS ay,
       |         b.id AS b_id, b.x AS bx, b.y AS b_y
       |  FROM c a JOIN o ON true
       |  JOIN c b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
       |  WHERE a.id < b.id),
       |und AS (
       |  SELECT a_id, b_id FROM pr
       |  WHERE (ax - bx) * (ax - bx) + (ay - b_y) * (ay - b_y) <= 4000000),
       |e AS (SELECT a_id AS u, b_id AS v FROM und
       |      UNION ALL SELECT b_id, a_id FROM und),
       |l0 AS (SELECT id AS node, id AS lbl FROM c),
       |$roundCtes,
       |comm AS (SELECT lbl, count(*)::BIGINT AS sz FROM l$rounds GROUP BY 1)
       |SELECT sz AS comm_size, count(*)::BIGINT AS n_comms,
       |  sum(lbl::HUGEINT)::BIGINT AS label_sum
       |FROM comm GROUP BY 1""".stripMargin
  }

  /** q234's oracle: product quantization replayed relationally — subspace
    * slices, first-16-by-id codebooks, (micro-distance, centroid) argmin
    * codes, broadcast ADC tables, integer ADC sums, (distance ASC, id)
    * ranking. Identical double arithmetic (xx − 2·xc + cc, half-up micro
    * rounding) on both engines.
    */
  private def pqAdcOracleSql(k: Int, nSub: Int = 4, subDim: Int = 16,
      nCent: Int = 16): String = {
    def d2(x: String, c: String) =
      s"floor((list_dot_product($x, $x) - 2.0 * list_dot_product($x, $c)" +
        s" + list_dot_product($c, $c)) * 1e6 + 0.5)::BIGINT"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sub AS (SELECT unnest(range(0, $nSub)) AS sub),
       |sl AS (
       |  SELECT e.vec_id, s.sub,
       |    list_slice(e.v, s.sub * $subDim + 1, s.sub * $subDim + $subDim)
       |      AS xs
       |  FROM e, sub s),
       |cents AS (
       |  SELECT vec_id AS cid, sub, xs AS cs FROM sl
       |  WHERE vec_id < $nCent),
       |codes AS (
       |  SELECT vec_id AS cand_id, sub, cid AS code FROM (
       |    SELECT sl.vec_id, sl.sub, c.cid,
       |      row_number() OVER (PARTITION BY sl.vec_id, sl.sub
       |        ORDER BY ${d2("sl.xs", "c.cs")}, c.cid) AS r
       |    FROM sl JOIN cents c ON c.sub = sl.sub) WHERE r = 1),
       |qtab AS (
       |  SELECT sl.vec_id AS query_id, sl.sub, c.cid AS code,
       |    ${d2("sl.xs", "c.cs")} AS qd
       |  FROM sl JOIN cents c ON c.sub = sl.sub
       |  WHERE sl.vec_id < 10),
       |sc AS (
       |  SELECT q.query_id, cd.cand_id, sum(q.qd)::BIGINT AS adc_micro
       |  FROM codes cd JOIN qtab q ON q.sub = cd.sub AND q.code = cd.code
       |  WHERE q.query_id <> cd.cand_id
       |  GROUP BY 1, 2)
       |SELECT query_id, cand_id, adc_micro, rank FROM (
       |  SELECT query_id, cand_id, adc_micro,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_micro, cand_id) AS rank
       |  FROM sc)
       |WHERE rank <= $k""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
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
        |FROM documents GROUP BY text HAVING count(*) > 1""".stripMargin,

    "q09_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  sum(len(string_split(text, ' ')))::BIGINT AS total_tokens,
        |  sum(len(list_distinct(string_split(text, ' '))))::BIGINT AS sum_distinct
        |FROM documents GROUP BY lang""".stripMargin,

    "q10_quality_score" ->
      s"""SELECT doc_id,
         |  len(string_split(text, ' ')) AS n_tokens,
         |  round((length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
         |        / len(string_split(text, ' ')), 6) AS mean_token_len,
         |  round(len(list_filter(string_split(text, ' '), t -> t IN ($stopList)))::DOUBLE
         |        / len(string_split(text, ' ')), 6) AS stopword_ratio,
         |  round(len(list_distinct(string_split(text, ' ')))::DOUBLE
         |        / len(string_split(text, ' ')), 6) AS type_token_ratio,
         |  round(least(1.0, len(string_split(text, ' ')) / 100.0) *
         |        (1.0 - len(list_filter(string_split(text, ' '), t -> t IN ($stopList)))::DOUBLE
         |         / len(string_split(text, ' '))), 6) AS quality_score
         |FROM documents""".stripMargin,

    "q11_langid" ->
      s"""SELECT lang_pred, count(*) AS n_docs FROM (
         |  SELECT $LangPredCaseSql AS lang_pred
         |  FROM documents)
         |GROUP BY lang_pred""".stripMargin,

    "q12_fingerprint" ->
      s"""SELECT doc_id,
        |  ${fingerprintSql("text")} AS fingerprint
        |FROM documents""".stripMargin,

    // naive shared-shingle join with the same maxDocFreq cap (doc sizes
    // recomputed over surviving shingles) — equals the Spark side's
    // prefix-filtered AllPairs output by the prefix-filter theorem
    "q13_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(string_split(text,' ')) - 2, 0)),
        |    i -> array_to_string(list_slice(string_split(text,' '), i + 1, i + 3), ' '))) AS shset
        |  FROM documents),
        |ex0 AS (SELECT doc_id, unnest(shset) AS shingle FROM sh),
        |dfq AS (SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) <= 1000),
        |ex AS (SELECT e.doc_id, e.shingle FROM ex0 e JOIN dfq USING (shingle)),
        |nn AS (SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(count(*)::DOUBLE / (any_value(na.n_sh) + any_value(nb.n_sh) - count(*)), 6) AS jaccard
        |FROM ex a
        |JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |JOIN nn na ON na.doc_id = a.doc_id
        |JOIN nn nb ON nb.doc_id = b.doc_id
        |GROUP BY a.doc_id, b.doc_id
        |HAVING round(count(*)::DOUBLE / (any_value(na.n_sh) + any_value(nb.n_sh) - count(*)), 6) >= 0.8""".stripMargin,

    "q14_cosine_topk" -> CosineTopkOracleSql,

    "q60_salient_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tok3 AS (SELECT doc_id, token FROM tok WHERE length(token) >= 3),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok3 GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, token FROM tok3) GROUP BY 1)
        |SELECT doc_id, token, tf, df, rk FROM (
        |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |                       ORDER BY tf.tf DESC, df.df ASC, tf.token ASC) AS rk
        |  FROM tf JOIN df ON tf.token = df.token)
        |WHERE rk <= 3""".stripMargin,

    "q57_repetition_filter" ->
      """WITH sh AS (
        |  SELECT doc_id, list_transform(
        |    range(0, greatest(len(string_split(text, ' ')) - 2, 0)),
        |    i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 3), ' ')) AS shs
        |  FROM documents)
        |SELECT doc_id, len(shs)::INT AS n_shingles,
        |  len(list_distinct(shs))::INT AS n_distinct_shingles,
        |  CASE WHEN 5 * (len(shs) - len(list_distinct(shs))) > len(shs)
        |       THEN 1 ELSE 0 END AS repetitive
        |FROM sh""".stripMargin,

    "q58_contamination" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(string_split(text, ' ')) - 2, 0)),
        |    i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 3), ' '))) AS shs
        |  FROM documents),
        |probe AS (SELECT DISTINCT unnest(shs) AS shingle FROM t WHERE doc_id % 50 = 0),
        |docsh AS (SELECT doc_id, unnest(shs) AS shingle FROM t WHERE doc_id % 50 <> 0)
        |SELECT d.doc_id, count(*) AS n_contaminated_shingles
        |FROM docsh d JOIN probe p ON d.shingle = p.shingle
        |GROUP BY d.doc_id""".stripMargin,

    "q15_minhash_signatures" -> {
      val mins = graft.text.Dedup.MinhashCoefs.zipWithIndex.map { case ((a, b), i) =>
        s"min((h * $a + $b) % 2147483647)::BIGINT AS mh_$i"
      }.mkString(",\n  ")
      s"""WITH $ShingleHashCte
         |SELECT doc_id,
         |  $mins
         |FROM h GROUP BY doc_id""".stripMargin
    },

    "q16_minhash_pairs" ->
      s"""WITH $MinhashPairsCtes
         |SELECT id_a, id_b, est_jaccard FROM pairs""".stripMargin,

    // transitive closure of the q16 pair set: min reachable doc_id per doc.
    // DuckDB can afford the recursive reachability CTE at oracle scale; the
    // Spark side computes the same closure with large-star/small-star
    // contractions (the O(log n)-round distributed form).
    "q61_dedup_clusters" ->
      s"""WITH RECURSIVE $MinhashPairsCtes,
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
         |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
         |sizes AS (SELECT component, count(*) AS csize FROM comp GROUP BY component)
         |SELECT c.doc_id, c.component, s.csize,
         |  (CASE WHEN c.doc_id = c.component THEN 1 ELSE 0 END) AS keep
         |FROM comp c JOIN sizes s USING (component)""".stripMargin,

    // the fingerprint is non-negative, so plain % mirrors Spark's pmod
    "q62_stratified_sample" ->
      s"""WITH fp AS (
        |  SELECT doc_id, lang,
        |    ${fingerprintSql("text")} % 1000 AS sample_bucket
        |  FROM documents)
        |SELECT doc_id, lang, sample_bucket FROM fp
        |WHERE sample_bucket <
        |  (CASE WHEN lang = 'en' THEN 200 WHEN lang = 'zh' THEN 100 ELSE 50 END)""".stripMargin,

    // window frames are equal despite the engines' different defaults
    // (RANGE vs ROWS) because doc_id is unique within a shard
    "q63_sequence_packing" ->
      """WITH toks AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    len(string_split(text, ' '))::BIGINT AS n_tokens
        |  FROM documents),
        |pre AS (
        |  SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)::BIGINT AS tok_end
        |  FROM toks)
        |SELECT doc_id, shard, n_tokens, tok_end - n_tokens AS tok_start,
        |  (tok_end - n_tokens) // 256 AS first_seq,
        |  (tok_end - 1) // 256 AS last_seq,
        |  ((tok_end - 1) // 256) - ((tok_end - n_tokens) // 256) + 1 AS n_seqs
        |FROM pre""".stripMargin,

    "q64_quality_funnel" ->
      s"""WITH f AS (
         |  SELECT $LangPredCaseSql AS lang_pred,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    length(text) AS n_chars,
         |    len(shs) AS n_sh, len(list_distinct(shs)) AS n_dsh
         |  FROM (SELECT text, list_transform(
         |      range(0, greatest(len(string_split(text, ' ')) - 2, 0)),
         |      i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 3), ' ')) AS shs
         |    FROM documents)),
         |flags AS (
         |  SELECT (lang_pred = 'en') AS f1,
         |    ${Curation.LenOkSql} AS f2,
         |    ${Curation.NotRepetitiveSql} AS f3
         |  FROM f)
         |SELECT 0 AS stage_idx, 'all' AS stage, count(*) AS n_docs FROM flags
         |UNION ALL SELECT 1, 'lang_en', count(*) FILTER (WHERE f1) FROM flags
         |UNION ALL SELECT 2, 'len_ok', count(*) FILTER (WHERE f1 AND f2) FROM flags
         |UNION ALL SELECT 3, 'not_repetitive',
         |  count(*) FILTER (WHERE f1 AND f2 AND f3) FROM flags""".stripMargin,

    // assignment mirrors q14's ranking contract (cosine rounded 6dp,
    // centroid-id tie-break); update sums the same micro-quantized integers
    "q65_kmeans_step" ->
      """WITH c AS (
        |  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.cid, e.embedding,
        |    round(list_dot_product(e.embedding::DOUBLE[], c.cv) /
        |      (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos_r
        |  FROM embeddings e, c),
        |assigned AS (
        |  SELECT cid AS cluster, embedding FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cos_r DESC, cid) AS rk FROM scored)
        |  WHERE rk = 1),
        |ex AS (
        |  SELECT cluster, i::INT AS dim,
        |    floor(embedding[i + 1]::DOUBLE * 1e6)::BIGINT AS v_micro
        |  FROM assigned, range(0, 64) r(i))
        |SELECT cluster, dim, count(*) AS n_members,
        |  sum(v_micro)::BIGINT AS sum_micro
        |FROM ex GROUP BY cluster, dim""".stripMargin,

    "q66_curation_decisions" ->
      s"""WITH f AS (
         |  SELECT doc_id, text, $LangPredCaseSql AS lang_pred,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    length(text) AS n_chars,
         |    len(shs) AS n_sh, len(list_distinct(shs)) AS n_dsh,
         |    ${fingerprintSql("text")} % 1000 AS bucket,
         |    (CASE WHEN row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
         |          THEN 1 ELSE 0 END) AS is_canonical
         |  FROM (SELECT doc_id, text, list_transform(
         |      range(0, greatest(len(string_split(text, ' ')) - 2, 0)),
         |      i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 3), ' ')) AS shs
         |    FROM documents))
         |SELECT doc_id, is_canonical,
         |  (CASE WHEN lang_pred = 'en' THEN 1 ELSE 0 END) AS lang_ok,
         |  (CASE WHEN ${Curation.LenOkSql} THEN 1 ELSE 0 END) AS len_ok,
         |  (CASE WHEN ${Curation.NotRepetitiveSql} THEN 1 ELSE 0 END) AS not_repetitive,
         |  (CASE WHEN bucket < 700 THEN 1 ELSE 0 END) AS sampled,
         |  (CASE WHEN is_canonical = 1 AND lang_pred = 'en'
         |             AND ${Curation.LenOkSql}
         |             AND ${Curation.NotRepetitiveSql}
         |             AND bucket < 700
         |        THEN 1 ELSE 0 END) AS keep
         |FROM f""".stripMargin,

    "q67_mixing_targets" ->
      """WITH c AS (
        |  SELECT lang AS stratum, count(*) AS n_docs FROM documents GROUP BY lang),
        |w AS (SELECT stratum, n_docs,
        |  floor(sqrt(n_docs::DOUBLE) * 1e6)::BIGINT AS w_micro FROM c),
        |s AS (SELECT sum(w_micro)::BIGINT AS sum_w, sum(n_docs)::BIGINT AS total FROM w),
        |t AS (SELECT stratum, n_docs, w_micro,
        |        (w_micro * 1000000) // sum_w AS share_ppm,
        |        ((w_micro * 1000000) // sum_w * total) // 1000000 AS target_docs
        |      FROM w, s)
        |SELECT stratum, n_docs, share_ppm, target_docs,
        |  least(1000, (target_docs * 1000) // n_docs) AS sample_permille
        |FROM t""".stripMargin,

    "q68_pii_scrub" ->
      s"""WITH synth AS (
        |  SELECT doc_id, text ||
        |    (CASE WHEN doc_id % 3 = 0
        |          THEN ' contact user' || doc_id::VARCHAR || '@example.com'
        |          ELSE '' END) ||
        |    (CASE WHEN doc_id % 4 = 0
        |          THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
        |          ELSE '' END) AS t
        |  FROM documents),
        |red AS (
        |  SELECT doc_id, t,
        |    regexp_replace(t, '[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+', '<EMAIL>', 'g') AS er,
        |    regexp_replace(
        |      regexp_replace(t, '[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+', '<EMAIL>', 'g'),
        |      '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS r
        |  FROM synth)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+')) AS n_emails,
        |  len(regexp_extract_all(er, '[0-9]{3}-[0-9]{4}')) AS n_phones,
        |  length(r) AS n_chars_redacted,
        |  ${fingerprintSql("r")} AS redacted_fp
        |FROM red""".stripMargin,

    "q69_doc_chunks" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |ex AS (SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS i FROM t),
        |st AS (
        |  SELECT doc_id, (i // 48)::INT AS chunk_idx, i::INT AS start_tok,
        |    array_to_string(list_slice(toks, i + 1, least(i + 64, len(toks))), ' ') AS chunk
        |  FROM ex)
        |SELECT doc_id, chunk_idx, start_tok,
        |  len(string_split(chunk, ' '))::INT AS n_chunk_tokens,
        |  ${fingerprintSql("chunk", "j")} AS chunk_fp
        |FROM st""".stripMargin,

    "q17_simhash" -> {
      // 31 bits: the token hash is mod 2^31-1, so bit 31 can never vote true
      val bits = (0 until graft.text.Dedup.SimhashBits).map { b =>
        s"(CASE WHEN sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" +\n  ")
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |h AS (SELECT doc_id, ${fingerprintSql("tok")} AS h FROM tok)
         |SELECT doc_id,
         |  ($bits)::BIGINT AS simhash
         |FROM h GROUP BY doc_id""".stripMargin
    },

    "q18_stream_window" -> WindowAggOracleSql,
    // complete mode ⇒ the final table is batch-equal for ANY decomposition
    "q56_stream_window_multibatch" -> WindowAggOracleSql,

    "q19_embedding_neardups" -> {
      // mirror the seeded hyperplane buckets: same gaussian constants, same
      // left-to-right double dot product (list_dot_product == our aggregate)
      val planes = graft.sim.Similarity.hyperplanes(dim = 64, nBits = 8, seed = 42L)
      val bucketExpr = planes.zipWithIndex.map { case (p, b) =>
        s"(CASE WHEN list_dot_product(v, [${p.mkString(", ")}]) >= 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" +\n  ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings WHERE vec_id < 1000),
         |sig AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         |  ($bucketExpr) AS bucket FROM e)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
         |FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.2""".stripMargin
    },

    "q22_graph_metrics" ->
      s"""WITH links AS (${OracleData.truthLinksSql}),
         |t AS (SELECT DISTINCT n_vars::VARCHAR || '_' || max_lag::VARCHAR AS graph_id,
         |        source, target, lag FROM links WHERE family = 'A1'),
         |p AS (SELECT DISTINCT n_vars::VARCHAR || '_' || max_lag::VARCHAR AS graph_id,
         |        source, target, lag FROM links WHERE family = 'B2'),
         |tot AS (SELECT DISTINCT n_vars::VARCHAR || '_' || max_lag::VARCHAR AS graph_id,
         |        n_vars * n_vars * (max_lag + 1) AS total FROM links WHERE family = 'A1'),
         |conf AS (
         |  SELECT coalesce(t.graph_id, p.graph_id) AS graph_id,
         |    sum(CASE WHEN t.source IS NOT NULL AND p.source IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS tp,
         |    sum(CASE WHEN t.source IS NULL THEN 1 ELSE 0 END)::BIGINT AS fp,
         |    sum(CASE WHEN p.source IS NULL THEN 1 ELSE 0 END)::BIGINT AS fn
         |  FROM t FULL OUTER JOIN p
         |    ON t.graph_id = p.graph_id AND t.source = p.source
         |   AND t.target = p.target AND t.lag = p.lag
         |  GROUP BY 1)
         |SELECT c.graph_id, tp, fp, fn, (total - tp - fp - fn)::BIGINT AS tn,
         |  round(CASE WHEN tp + fn = 0 THEN 0 ELSE tp::DOUBLE / (tp + fn) END, 6) AS tpr,
         |  round(CASE WHEN fp + tp = 0 THEN 0 ELSE fp::DOUBLE / (fp + tp) END, 6) AS fdr,
         |  round(CASE WHEN (CASE WHEN tp + fp = 0 THEN 0 ELSE tp::DOUBLE / (tp + fp) END)
         |           + (CASE WHEN tp + fn = 0 THEN 0 ELSE tp::DOUBLE / (tp + fn) END) = 0 THEN 0
         |        ELSE 2 * (CASE WHEN tp + fp = 0 THEN 0 ELSE tp::DOUBLE / (tp + fp) END)
         |               * (CASE WHEN tp + fn = 0 THEN 0 ELSE tp::DOUBLE / (tp + fn) END)
         |             / ((CASE WHEN tp + fp = 0 THEN 0 ELSE tp::DOUBLE / (tp + fp) END)
         |              + (CASE WHEN tp + fn = 0 THEN 0 ELSE tp::DOUBLE / (tp + fn) END)) END, 6) AS f1
         |FROM conf c JOIN tot ON c.graph_id = tot.graph_id""".stripMargin,

    "q23_graph_shd" ->
      s"""WITH links AS (${OracleData.truthLinksSql}),
         |t AS (SELECT DISTINCT n_vars::VARCHAR || '_' || max_lag::VARCHAR AS graph_id,
         |        source, target, lag FROM links WHERE family = 'A1'),
         |p AS (SELECT DISTINCT n_vars::VARCHAR || '_' || max_lag::VARCHAR AS graph_id,
         |        source, target, lag FROM links WHERE family = 'B2'),
         |x AS (
         |  SELECT coalesce(t.graph_id, p.graph_id) AS graph_id,
         |    sum(CASE WHEN t.source IS NULL OR p.source IS NULL THEN 1 ELSE 0 END)::BIGINT AS shd
         |  FROM t FULL OUTER JOIN p
         |    ON t.graph_id = p.graph_id AND t.source = p.source
         |   AND t.target = p.target AND t.lag = p.lag
         |  GROUP BY 1),
         |tc AS (SELECT graph_id, least(source, target) AS u, greatest(source, target) AS v, lag,
         |        max(CASE WHEN source <= target THEN 1 ELSE 0 END) AS t_fwd,
         |        max(CASE WHEN source > target THEN 1 ELSE 0 END) AS t_rev
         |       FROM t GROUP BY 1, 2, 3, 4),
         |pc AS (SELECT graph_id, least(source, target) AS u, greatest(source, target) AS v, lag,
         |        max(CASE WHEN source <= target THEN 1 ELSE 0 END) AS p_fwd,
         |        max(CASE WHEN source > target THEN 1 ELSE 0 END) AS p_rev
         |       FROM p GROUP BY 1, 2, 3, 4),
         |j AS (SELECT coalesce(tc.graph_id, pc.graph_id) AS graph_id,
         |        coalesce(t_fwd, 0) AS t_fwd, coalesce(t_rev, 0) AS t_rev,
         |        coalesce(p_fwd, 0) AS p_fwd, coalesce(p_rev, 0) AS p_rev
         |      FROM tc FULL OUTER JOIN pc
         |        ON tc.graph_id = pc.graph_id AND tc.u = pc.u AND tc.v = pc.v AND tc.lag = pc.lag),
         |st AS (SELECT graph_id,
         |        sum(CASE WHEN t_fwd + t_rev = 1 AND p_fwd + p_rev = 1 AND t_fwd <> p_fwd THEN 1
         |            ELSE abs(t_fwd - p_fwd) + abs(t_rev - p_rev) END)::BIGINT AS shd_structural
         |       FROM j GROUP BY 1)
         |SELECT x.graph_id, x.shd, st.shd_structural
         |FROM x JOIN st ON x.graph_id = st.graph_id""".stripMargin,

    "q24_graph_tensor" ->
      s"""WITH links AS (${OracleData.truthLinksSql}),
         |base AS (SELECT family, n_vars, max_lag,
         |    CASE WHEN source = 'U' THEN n_vars ELSE substr(source, 2)::INT - 1 END AS i,
         |    CASE WHEN target = 'U' THEN n_vars ELSE substr(target, 2)::INT - 1 END AS j,
         |    lag AS k, coef FROM links WHERE family IN ('A1', 'A1C')),
         |allc AS (
         |  SELECT family, n_vars, max_lag, i, j, k, coef AS value, 1 AS edge FROM base
         |  UNION ALL
         |  SELECT family, n_vars, max_lag, j AS i, i AS j, k, coef AS value, 0 AS edge
         |  FROM base WHERE k = 0)
         |SELECT family, n_vars, max_lag, i, j, k,
         |  round(max(value), 6) AS value, max(edge)::INT AS edge
         |FROM allc GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin,

    "q25_sessionize" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |              > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM ev),
        |sess AS (
        |  SELECT user_id, ts_us,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  (max(ts_us) - min(ts_us))::BIGINT AS duration_us
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    "q26_media_features" ->
      s"""SELECT doc_id AS media_id, 'image/' || source AS kind,
        |  length(text)::BIGINT AS n_bytes,
        |  ${fingerprintSql("text")} AS content_hash,
        |  greatest(1, floor(sqrt(length(text)))::INT) AS width,
        |  greatest(1, (length(text) // greatest(1, floor(sqrt(length(text)))::INT)))::INT AS height,
        |  CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |    round(list_sum(list_transform(range(1, length(text) + 1),
        |      i -> ascii(substr(text, i::INT, 1))))::DOUBLE / length(text), 6) END AS mean_intensity
        |FROM documents""".stripMargin,

    // every decoded pixel re-derived codec-free: pixel i of image doc_id is
    // ((doc_id*2654435761 + i*40503) mod 2^31) mod 256 — the Spark side saw
    // only the ENCODED PNG bytes, so agreement proves the real decode
    "q176_image_decode" ->
      """WITH dims AS (
        |  SELECT doc_id, (16 + doc_id % 16)::INTEGER AS width,
        |         (12 + doc_id % 8)::INTEGER AS height
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, width, height, unnest(range(width * height)) AS i
        |  FROM dims),
        |b AS (
        |  SELECT doc_id, width, height, i,
        |    ((doc_id * 2654435761 + i * 40503) % 2147483648) % 256 AS pix
        |  FROM px)
        |SELECT doc_id AS media_id, width, height,
        |  count(*)::BIGINT AS n_pixels, sum(pix)::BIGINT AS sum_pix,
        |  sum(i * pix)::BIGINT AS moment_pix,
        |  ((1000 * sum(pix)) // (width * height))::BIGINT AS mean_milli
        |FROM b GROUP BY 1, 2, 3""".stripMargin,

    "q181_audio_decode" ->
      """WITH dims AS (
        |  SELECT doc_id, 256 + 8 * (doc_id % 96) AS n FROM documents),
        |px AS (SELECT doc_id, n, unnest(range(n)) AS i FROM dims),
        |b AS (
        |  SELECT doc_id, n, i,
        |    (((doc_id + 7777) * 2654435761 + i * 40503) % 2147483648) % 256 AS a
        |  FROM px),
        |c AS (
        |  SELECT doc_id, n, i, a,
        |    lag(a) OVER (PARTITION BY doc_id ORDER BY i) AS p
        |  FROM b)
        |SELECT doc_id AS media_id, count(*)::BIGINT AS n_samples,
        |  sum(a)::BIGINT AS sum_amp, sum(i * a)::BIGINT AS moment_amp,
        |  sum(CASE WHEN p IS NOT NULL AND ((p < 128 AND a >= 128)
        |        OR (p >= 128 AND a < 128)) THEN 1 ELSE 0 END)::BIGINT
        |    AS n_mid_crossings,
        |  ((1000 * sum(a)) // n)::BIGINT AS mean_milli
        |FROM c GROUP BY doc_id, n""".stripMargin,

    // every pixel of every FRAME re-derived codec-free: frame f of video
    // doc_id uses seed doc_id + 100003*(f+1); motion compares f against
    // f-1 by formula (no window needed — both seeds are computable per
    // row). The Spark side saw only RIFF container + PNG bytes, so
    // agreement proves demux order, frame alignment, and pixel layout
    "q182_video_decode" ->
      """WITH dims AS (
        |  SELECT doc_id, (16 + doc_id % 8)::INTEGER AS width,
        |         (12 + doc_id % 4)::INTEGER AS height,
        |         (3 + doc_id % 4)::INTEGER AS n_frames
        |  FROM documents),
        |fx AS (
        |  SELECT doc_id, width, height, n_frames, unnest(range(n_frames)) AS f
        |  FROM dims),
        |px AS (
        |  SELECT doc_id, width, height, n_frames, f,
        |         unnest(range(width * height)) AS i
        |  FROM fx),
        |b AS (
        |  SELECT doc_id, width, height, n_frames, f, i,
        |    (((doc_id + 100003 * (f + 1)) * 2654435761 + i * 40503)
        |       % 2147483648) % 256 AS pix,
        |    CASE WHEN f > 0 THEN abs(
        |      ((((doc_id + 100003 * (f + 1)) * 2654435761 + i * 40503)
        |          % 2147483648) % 256)
        |      - ((((doc_id + 100003 * f) * 2654435761 + i * 40503)
        |          % 2147483648) % 256)) ELSE 0 END AS md
        |  FROM px)
        |SELECT doc_id AS media_id, n_frames, width, height,
        |  count(*)::BIGINT AS n_pixels, sum(pix)::BIGINT AS sum_pix,
        |  sum(f * pix)::BIGINT AS frame_moment, sum(md)::BIGINT AS motion_abs,
        |  ((1000 * sum(pix)) // (n_frames * width * height))::BIGINT AS mean_milli
        |FROM b GROUP BY 1, 2, 3, 4""".stripMargin,

    "q50_media_frames" ->
      s"""WITH idx AS (
        |  SELECT doc_id, text, unnest(range(0, (length(text) + 63) // 64)) AS i
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, i, substr(text, (i * 64 + 1)::INT, 64) AS fr
        |  FROM idx WHERE i % 2 = 0)
        |SELECT doc_id AS media_id, i::INT AS frame_idx,
        |  length(fr)::BIGINT AS n_bytes,
        |  ${fingerprintSql("fr", "j")} AS content_hash,
        |  round(list_sum(list_transform(range(1, length(fr) + 1),
        |    j -> ascii(substr(fr, j::INT, 1))))::DOUBLE / length(fr), 6) AS mean_intensity
        |FROM f""".stripMargin,

    "q27_rollup_revenue" ->
      s"""SELECT r_name, n_name,
        |  $RevenueSql AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "q31_trend_season" ->
      """SELECT t, var_idx,
        |  5000 * var_idx * t AS trend_micro,
        |  (2 * t + 3 * (var_idx - 1)) % 24 AS arg1_24,
        |  (4 * t + 3 * (var_idx - 1)) % 24 AS arg2_24
        |FROM range(0, 200) r(t)
        |CROSS JOIN range(1, 9) v(var_idx)""".stripMargin,

    "q42_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  sum(json_extract(props, '$.k')::INT)::BIGINT AS sum_k,
        |  round(avg(json_extract(props, '$.k')::INT), 4) AS avg_k,
        |  max(json_extract(props, '$.k')::INT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q41_ordered_limit" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,

    // emission model: session closed by gap (not the user's last) OR by
    // event-time timeout — the post-data no-data microbatch advances the
    // watermark to max(ts)−1h (ms) and fires timeouts where wm > end+gap (ms,
    // matching GroupStateImpl's strict comparison at Spark 4.1 semantics).
    // Ties in ts_us split by value, mirroring update()'s sort — boundaries
    // and sums are order-insensitive, so any consistent tie order works.
    "q40_stream_sessions" -> SessionFinalityOracleSql,
    // finality makes the emitted set batch-decomposition invariant
    "q55_stream_sessions_multibatch" -> SessionFinalityOracleSql,

    "q39_pivot_events" ->
      """SELECT user_id,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
        |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view
        |FROM events GROUP BY user_id""".stripMargin,

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

    "q52_grouping_sets" ->
      s"""SELECT r_name, o_orderpriority,
        |  $RevenueSql AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (o_orderpriority), ())""".stripMargin,

    // generated-data oracles read the kernel output the query dumped to
    // __GEN_DIR__ (substituted by Verify) — same rows, both engines
    "q28_generated_missing_stats" -> {
      val miss = (1 to 8).map(i =>
        s"round(sum(CASE WHEN X$i IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 3) AS miss_x$i")
        .mkString(",\n  ")
      s"""SELECT family, count(*) AS n_rows,
         |  $miss
         |FROM read_parquet('__GEN_DIR__/q28_missing/*.parquet')
         |GROUP BY family""".stripMargin
    },

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

    "q177_full_sweep_digest" -> sweepDigestOracleSql("q177_sweep"),
    "_gen" -> sweepDigestOracleSql("_gen_sweep"),

    // NOTE on the `_gen` artifact row: the full-sweep generation is
    // hash-oracled through q177 (every one of the 2,592 configs pinned
    // individually), and every individual dump is aggregated bitwise by its
    // own oracle (q28/q29/q30/q38/q43-q46/q53/q71/q177/q178). The raw
    // union of ALL dumps deliberately carries no oracle: the dumps have
    // heterogeneous schemas, and a cross-engine union compare diverges on
    // how a STRING column absent from one file stringifies (pandas 'nan'
    // vs DuckDB NULL→'None') — a property of the comparator, not of any
    // query result.

    "q178_strict_mode_diff" ->
      """WITH c AS (SELECT * FROM read_parquet('__GEN_DIR__/q178_compat/*.parquet')),
        |s AS (SELECT * FROM read_parquet('__GEN_DIR__/q178_strict/*.parquet'))
        |SELECT c.family, count(*)::BIGINT AS n_rows,
        |  sum(CASE WHEN c.X1 IS DISTINCT FROM s.X1 OR c.X2 IS DISTINCT FROM s.X2
        |        OR c.X3 IS DISTINCT FROM s.X3 OR c.X4 IS DISTINCT FROM s.X4
        |        OR c.X5 IS DISTINCT FROM s.X5 OR c.X6 IS DISTINCT FROM s.X6
        |      THEN 1 ELSE 0 END)::BIGINT AS n_value_diff,
        |  sum(CASE WHEN c."time" IS DISTINCT FROM s."time" THEN 1 ELSE 0
        |      END)::BIGINT AS n_time_diff
        |FROM c JOIN s ON c.family = s.family AND c.configId = s.configId
        |  AND c.t = s.t
        |GROUP BY 1""".stripMargin,

    "q30_generate_families" ->
      s"""SELECT family, count(*) AS n_rows,
        |  ${sumMicroSql("X1")} AS sum_x1_micro,
        |  ${sumMicroSql("X6")} AS sum_x6_micro
        |FROM read_parquet('__GEN_DIR__/q30_wide/*.parquet')
        |GROUP BY family""".stripMargin,

    "q345_strict_kernel_digest" ->
      s"""SELECT family, count(*) AS n_rows,
        |  ${sumMicroSql("greatest(least(X1, 1e6), -1e6)")} AS sum_x1c_micro,
        |  ${sumMicroSql("greatest(least(X4, 1e6), -1e6)")} AS sum_x4c_micro,
        |  ${sumMicroSql("greatest(least(X6, 1e6), -1e6)")} AS sum_x6c_micro,
        |  ${sumMicroSql("\"time\"")} AS sum_time_micro
        |FROM read_parquet('__GEN_DIR__/q345_strict_wide/*.parquet')
        |GROUP BY family""".stripMargin,

    "q346_pc_wide_oriented" ->
      s"""WITH panel AS (
        |  SELECT series, day, v
        |  FROM read_parquet('__GEN_DIR__/q346_panel/*.parquet')),
        |${graft.metrics.Causal.pcSkeleton2SqlCtes("panel", PcOrientTauSqBp)},
        |${graft.metrics.Causal.pcOrient2SqlCtes(PcMeekRounds)}
        |SELECT a, b, dir FROM pc_st$PcMeekRounds""".stripMargin,

    "q347_pc_stable_wide" ->
      s"""WITH panel AS (
        |  SELECT series, day, v
        |  FROM read_parquet('__GEN_DIR__/q347_panel/*.parquet')),
        |${graft.metrics.Causal.pcStable2SqlCtes("panel", PcOrientTauSqBp)},
        |${graft.metrics.Causal.pcOrientStableSqlCtes(PcStableMeekRounds)}
        |SELECT a, b, dir FROM pc_st$PcStableMeekRounds""".stripMargin,

    "q348_pc_stable_order3_wide" ->
      s"""WITH panel AS (
        |  SELECT series, day, v
        |  FROM read_parquet('__GEN_DIR__/q348_panel/*.parquet')),
        |${graft.metrics.Causal.pcStable3SqlCtes("panel", PcOrientTauSqBp)},
        |${graft.metrics.Causal.pcOrientStable3SqlCtes(PcStableMeekRounds)}
        |SELECT a, b, dir FROM pc_st$PcStableMeekRounds""".stripMargin,

    "q350_pc_width_adaptive" -> {
      def arm(tau: Long): String =
        s"""SELECT * FROM (
          |  WITH panel AS (
          |    SELECT series, day, v
          |    FROM read_parquet('__GEN_DIR__/q350_panel/*.parquet')),
          |  ${graft.metrics.Causal.pcStable3SqlCtes("panel", tau)}
          |  SELECT $tau::BIGINT AS tau_sq_bp, 'keep0' AS stage,
          |    count(*)::BIGINT AS n FROM pcs3_out WHERE keep0 = 1
          |  UNION ALL SELECT $tau::BIGINT, 'edge1', count(*)::BIGINT
          |    FROM pcs3_out WHERE edge = 1
          |  UNION ALL SELECT $tau::BIGINT, 'edge2', count(*)::BIGINT
          |    FROM pcs3_out WHERE edge2 = 1
          |  UNION ALL SELECT $tau::BIGINT, 'edge3', count(*)::BIGINT
          |    FROM pcs3_out WHERE edge3 = 1)""".stripMargin
      arm(PcOrientTauSqBp) + "\nUNION ALL\n" +
        arm(graft.metrics.Causal.tauSqBpForWidth(160, 200))
    },

    "q349_pc_stage_census" ->
      s"""WITH panel AS (
        |  SELECT series, day, v
        |  FROM read_parquet('__GEN_DIR__/q349_panel/*.parquet')),
        |${graft.metrics.Causal.pcStable3SqlCtes("panel", PcOrientTauSqBp)},
        |cns_k0 AS (SELECT a, b FROM pcs3_out WHERE keep0 = 1),
        |cns_e1 AS (SELECT a, b FROM pcs3_out WHERE edge = 1),
        |cns_e2 AS (SELECT a, b FROM pcs3_out WHERE edge2 = 1),
        |cns_adj0 AS (SELECT a AS x, b AS y FROM cns_k0
        |  UNION ALL SELECT b, a FROM cns_k0),
        |cns_adj1 AS (SELECT a AS x, b AS y FROM cns_e1
        |  UNION ALL SELECT b, a FROM cns_e1),
        |cns_adj2 AS (SELECT a AS x, b AS y FROM cns_e2
        |  UNION ALL SELECT b, a FROM cns_e2),
        |cns_ser AS (SELECT count(*)::BIGINT AS sc FROM
        |  (SELECT a FROM pcs3_out UNION SELECT b FROM pcs3_out)),
        |cns_cand1 AS (
        |  SELECT DISTINCT p.a, p.b, n1.y AS z
        |  FROM cns_k0 p JOIN cns_adj0 n1 ON n1.x IN (p.a, p.b)
        |  WHERE n1.y <> p.a AND n1.y <> p.b),
        |cns_cand2 AS (
        |  SELECT e.a, e.b, n1.y AS z, n2.y AS w
        |  FROM cns_e1 e
        |  JOIN cns_adj1 n1 ON n1.x = e.a
        |  JOIN cns_adj1 n2 ON n2.x = e.a
        |  WHERE n1.y < n2.y AND n1.y <> e.b AND n2.y <> e.b
        |  UNION
        |  SELECT e.a, e.b, n1.y, n2.y
        |  FROM cns_e1 e
        |  JOIN cns_adj1 n1 ON n1.x = e.b
        |  JOIN cns_adj1 n2 ON n2.x = e.b
        |  WHERE n1.y < n2.y AND n1.y <> e.a AND n2.y <> e.a),
        |cns_cand3 AS (
        |  SELECT e.a, e.b, n1.y AS z, n2.y AS w, n3.y AS u
        |  FROM cns_e2 e
        |  JOIN cns_adj2 n1 ON n1.x = e.a
        |  JOIN cns_adj2 n2 ON n2.x = e.a
        |  JOIN cns_adj2 n3 ON n3.x = e.a
        |  WHERE n1.y < n2.y AND n2.y < n3.y
        |    AND n1.y <> e.b AND n2.y <> e.b AND n3.y <> e.b
        |  UNION
        |  SELECT e.a, e.b, n1.y, n2.y, n3.y
        |  FROM cns_e2 e
        |  JOIN cns_adj2 n1 ON n1.x = e.b
        |  JOIN cns_adj2 n2 ON n2.x = e.b
        |  JOIN cns_adj2 n3 ON n3.x = e.b
        |  WHERE n1.y < n2.y AND n2.y < n3.y
        |    AND n1.y <> e.a AND n2.y <> e.a AND n3.y <> e.a)
        |SELECT 'pairs' AS stage, 'both' AS variant,
        |  count(*)::BIGINT AS n FROM pcs3_out
        |UNION ALL SELECT 'keep0', 'both', count(*)::BIGINT FROM cns_k0
        |UNION ALL SELECT 'cand1', 'stable', count(*)::BIGINT
        |  FROM cns_cand1
        |UNION ALL SELECT 'cand1', 'unrestricted',
        |  ((SELECT count(*) FROM cns_k0)
        |    * ((SELECT sc FROM cns_ser) - 2))::BIGINT
        |UNION ALL SELECT 'edge1', 'both', count(*)::BIGINT FROM cns_e1
        |UNION ALL SELECT 'cand2', 'stable', count(*)::BIGINT
        |  FROM cns_cand2
        |UNION ALL SELECT 'cand2', 'unrestricted',
        |  ((SELECT count(*) FROM cns_e1)
        |    * (((SELECT sc FROM cns_ser) - 2)
        |       * ((SELECT sc FROM cns_ser) - 3) // 2))::BIGINT
        |UNION ALL SELECT 'edge2', 'both', count(*)::BIGINT FROM cns_e2
        |UNION ALL SELECT 'cand3', 'stable', count(*)::BIGINT
        |  FROM cns_cand3
        |UNION ALL SELECT 'cand3', 'unrestricted',
        |  ((SELECT count(*) FROM cns_e2)
        |    * (((SELECT sc FROM cns_ser) - 2)
        |       * ((SELECT sc FROM cns_ser) - 3)
        |       * ((SELECT sc FROM cns_ser) - 4) // 6))::BIGINT
        |UNION ALL SELECT 'edge3', 'both', count(*)::BIGINT
        |  FROM pcs3_out WHERE edge3 = 1""".stripMargin,

    "q351_struct_betas" -> {
      val links = weightLinks("", "A1", 6, 2)
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q351_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |${(2 to 6).map(i =>
             s"  UNION ALL SELECT 'X$i', t, floor(X$i * 1000)::BIGINT FROM gen")
             .mkString("\n")}),
        |specs AS (SELECT * FROM ${weightSpecsValuesSql(links)}),
        |links AS (SELECT * FROM ${weightLinksValuesSql(links)}),
        |${graft.metrics.Causal.structuralMomentsSqlCtes(
             "panel", "specs", "t BETWEEN 2 AND 4999")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")}
        |SELECT target, source, lag::INT AS lag, beta_ppm,
        |  declared_ppm::BIGINT AS declared_ppm,
        |  effective_ppm::BIGINT AS effective_ppm,
        |  abs(beta_ppm - effective_ppm)::BIGINT AS abs_err_ppm,
        |  ((1000 * sum(beta_ppm::HUGEINT * cjy) OVER (PARTITION BY target))
        |    // (1000000 * cyy::HUGEINT))::BIGINT AS r2_permille
        |FROM sbeta""".stripMargin
    },

    "q352_weight_recovery_census" -> {
      val cfgs = Grid.all().filter(c =>
        (c.family == "A1" || c.family == "A1C") && c.nPoints == 5000
          && c.noiseType == "gaussian")
      val links = cfgs.flatMap(c =>
        weightLinks(c.configId.toString, c.family, c.nVars, c.maxLag))
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q352_gen/*.parquet')),
        |panel AS (
        |  SELECT configId::VARCHAR || '|X1' AS series,
        |    configId * 8192 + t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen WHERE X1 IS NOT NULL
        |${(2 to 8).map(i =>
             s"  UNION ALL SELECT configId::VARCHAR || '|X$i', " +
               s"configId * 8192 + t, floor(X$i * 1000)::BIGINT " +
               s"FROM gen WHERE X$i IS NOT NULL").mkString("\n")}),
        |specs AS (SELECT * FROM ${weightSpecsValuesSql(links)}),
        |links AS (SELECT * FROM ${weightLinksValuesSql(links)}),
        |${graft.metrics.Causal.structuralMomentsSqlCtes(
             "panel", "specs", "t % 8192 BETWEEN 4 AND 4999")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")}
        |SELECT family, n_vars::INT AS n_vars, max_lag::INT AS max_lag,
        |  count(*)::BIGINT AS n_links,
        |  sum(CASE WHEN effective_ppm = 0 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_dead,
        |  (sum(abs(beta_ppm - effective_ppm)) // count(*))::BIGINT
        |    AS mean_abs_err_ppm,
        |  max(abs(beta_ppm - effective_ppm))::BIGINT AS max_abs_err_ppm
        |FROM sbeta GROUP BY 1, 2, 3""".stripMargin
    },

    "q353_strict_recovery_contrast" -> {
      val links = weightLinks("", "A1", 6, 2)
      def chain(dump: String, sfx: String): String =
        s"""gen$sfx AS (
          |  SELECT * FROM read_parquet('__GEN_DIR__/$dump/*.parquet')),
          |panel$sfx AS (
          |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
          |  FROM gen$sfx
          |${(2 to 6).map(i =>
               s"  UNION ALL SELECT 'X$i', t, floor(X$i * 1000)::BIGINT " +
                 s"FROM gen$sfx").mkString("\n")}),
          |${graft.metrics.Causal.structuralMomentsSqlCtes(
               s"panel$sfx", "specs", "t BETWEEN 2 AND 4999", sfx)},
          |${graft.metrics.Causal.structuralBetasSqlCtes("links", sfx)}"""
          .stripMargin
      s"""WITH specs AS (SELECT * FROM ${weightSpecsValuesSql(links)}),
        |links AS (SELECT * FROM ${weightLinksValuesSql(links)}),
        |${chain("q353_gen_default", "d")},
        |${chain("q353_gen_strict", "s")}
        |SELECT bd.target, bd.source, bd.lag::INT AS lag,
        |  bd.declared_ppm::BIGINT AS declared_ppm,
        |  bd.effective_ppm::BIGINT AS effective_ppm,
        |  bd.beta_ppm AS beta_default_ppm, bs.beta_ppm AS beta_strict_ppm
        |FROM sbetad bd JOIN sbetas bs ON bs.target = bd.target
        |  AND bs.source = bd.source AND bs.lag = bd.lag""".stripMargin
    },

    "q354_noise_recovery" -> {
      val links = weightLinks("", "A1", 6, 2)
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q354_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |${(2 to 6).map(i =>
             s"  UNION ALL SELECT 'X$i', t, floor(X$i * 1000)::BIGINT FROM gen")
             .mkString("\n")}),
        |specs AS (SELECT * FROM ${weightSpecsValuesSql(links)}),
        |links AS (SELECT * FROM ${weightLinksValuesSql(links)}),
        |${graft.metrics.Causal.structuralMomentsSqlCtes(
             "panel", "specs", "t BETWEEN 2 AND 4999")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")}
        |SELECT target, count(*)::BIGINT AS n_parents,
        |  ((1000 * sum(beta_ppm::HUGEINT * cjy))
        |    // (1000000 * max(cyy::HUGEINT)))::BIGINT AS r2_permille,
        |  ((1000000 * max(cyy::HUGEINT)
        |      - sum(beta_ppm::HUGEINT * cjy))
        |    // (1000000 * max(n::HUGEINT) * max(n)))::BIGINT AS sigma2_v,
        |  10000::BIGINT AS sigma2_truth_v,
        |  abs(((1000000 * max(cyy::HUGEINT)
        |      - sum(beta_ppm::HUGEINT * cjy))
        |    // (1000000 * max(n::HUGEINT) * max(n))) - 10000)::BIGINT
        |    AS sigma2_err_v
        |FROM sbeta GROUP BY 1""".stripMargin
    },

    "q373_blind_adjusted_recovery" -> {
      val links = c1Links()
      val inModel = graft.core.Parser.truthLinks("C1", 6, 2)
        .filter(_.source != "U")
        .map(l => l.target -> (if (Set("cos", "sin")(l.func)) 1 else 0))
        .toMap
      def vals(blindY: Boolean): String =
        "(VALUES " + links.map { l =>
          val y = if (blindY) s"${l._1}^@0" else l._6
          s"('${l._1}','${l._2}',${l._3},'${l._4}','$y','${l._5}'," +
            l._7.map(x => s"'$x'").getOrElse("NULL::VARCHAR") +
            s",${l._9},${inModel(l._1)})"
        }.mkString(",\n    ") +
          ") AS l(target, source, lag, func, y, x, sib, effective_ppm," +
          " in_model)"
      val basisRows = Seq("s1", "c1", "s2", "c2").map(b =>
        s"  UNION ALL SELECT '$b@0', t, floor($b * 1000)::BIGINT FROM gen")
        .mkString("\n")
      val blindRows = (1 to 6).map(i =>
        s"""  SELECT 'X$i^@0' AS vs, g.t,
          |    ((1000000 * floor(g.X$i * 1000)::BIGINT
          |      - p.bt * g.t
          |      - p.bs1 * floor(g.s1 * 1000)::BIGINT
          |      - p.bc1 * floor(g.c1 * 1000)::BIGINT
          |      - p.bs2 * floor(g.s2 * 1000)::BIGINT
          |      - p.bc2 * floor(g.c2 * 1000)::BIGINT) // 1000000)
          |      ::BIGINT AS v
          |  FROM gen g JOIN pb p ON p.series = 'X$i'""".stripMargin)
        .mkString("\n  UNION ALL\n")
      val knownRows = (1 to 6).map(i =>
        s"  UNION ALL SELECT 'X$i~@0', t, floor(X${i}t * 1000)::BIGINT " +
          s"FROM gen").mkString("\n")
      val regRows = links.map(l => (l._5.split("@")(0), l._5, l._3))
        .distinct.map { case (series, vs, lag) =>
          s"  UNION ALL SELECT '$vs', t + $lag, " +
            s"floor($series * 1000)::BIGINT FROM gen" }.mkString("\n")
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q373_gen/*.parquet')),
        |virt1 AS (
        |  SELECT 'X1@0' AS vs, t, floor(X1 * 1000)::BIGINT AS v FROM gen
        |${(2 to 6).map(i =>
             s"  UNION ALL SELECT 'X$i@0', t, floor(X$i * 1000)::BIGINT " +
               s"FROM gen").mkString("\n")}
        |  UNION ALL SELECT 'tt@0', t, t::BIGINT FROM gen
        |$basisRows),
        |hlinks AS (SELECT * FROM ${harmonicLinksValuesSql()}),
        |${graft.metrics.Causal.structuralMomentsFromVirtualSqlCtes(
             "virt1", "t BETWEEN 0 AND 491", "h")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("hlinks", "h")},
        |pb AS (
        |  SELECT series,
        |    max(CASE WHEN component = 'trend' THEN beta_ppm END) AS bt,
        |    max(CASE WHEN component = 's1' THEN beta_ppm END) AS bs1,
        |    max(CASE WHEN component = 'c1' THEN beta_ppm END) AS bc1,
        |    max(CASE WHEN component = 's2' THEN beta_ppm END) AS bs2,
        |    max(CASE WHEN component = 'c2' THEN beta_ppm END) AS bc2
        |  FROM sbetah GROUP BY 1),
        |virt AS (
        |$blindRows
        |$knownRows
        |$regRows),
        |linksk AS (SELECT * FROM ${vals(blindY = false)}),
        |linksb AS (SELECT * FROM ${vals(blindY = true)}),
        |${graft.metrics.Causal.structuralMomentsFromVirtualSqlCtes(
             "virt", "t BETWEEN 2 AND 491")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("linksk", "k",
             momSfx = "")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("linksb", "b",
             momSfx = "")}
        |SELECT k.target, k.source, k.lag::INT AS lag, k.func,
        |  k.in_model::INT AS in_model,
        |  k.effective_ppm::BIGINT AS effective_ppm,
        |  k.beta_ppm AS beta_known_ppm, b.beta_ppm AS beta_blind_ppm,
        |  abs(b.beta_ppm - k.beta_ppm)::BIGINT AS blind_vs_known_ppm
        |FROM sbetak k JOIN sbetab b ON b.target = k.target
        |  AND b.source = k.source AND b.lag = k.lag""".stripMargin
    },

    "q372_harmonic_estimation" -> {
      val basisRows = Seq("s1", "c1", "s2", "c2").map(b =>
        s"  UNION ALL SELECT '$b@0', t, floor($b * 1000)::BIGINT FROM gen")
        .mkString("\n")
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q372_gen/*.parquet')),
        |virt AS (
        |  SELECT 'X1@0' AS vs, t, floor(X1 * 1000)::BIGINT AS v FROM gen
        |${(2 to 6).map(i =>
             s"  UNION ALL SELECT 'X$i@0', t, floor(X$i * 1000)::BIGINT " +
               s"FROM gen").mkString("\n")}
        |  UNION ALL SELECT 'tt@0', t, t::BIGINT FROM gen
        |$basisRows),
        |links AS (SELECT * FROM ${harmonicLinksValuesSql()}),
        |${graft.metrics.Causal.structuralMomentsFromVirtualSqlCtes(
             "virt", "t BETWEEN 0 AND 491")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")}
        |SELECT series, component, in_model::INT AS in_model,
        |  beta_ppm AS est_ppm,
        |  truth_ppm::BIGINT AS truth_ppm,
        |  abs(beta_ppm - truth_ppm)::BIGINT AS abs_err_ppm
        |FROM sbeta""".stripMargin
    },

    "q371_fdr_vs_fwer" -> {
      def snm(i: Int) = s"G${"%02d".format(i / 5)}X${i % 5}"
      val cands = for { dd <- 1 to 9; i <- 0 until 160 - dd } yield {
        val (a, b) = (snm(i), snm(i + dd))
        val tier =
          if (i / 5 != (i + dd) / 5) "null"
          else if (i % 5 >= 3 && (i + dd) % 5 >= 3) "ab"
          else if (i % 5 >= 3 || (i + dd) % 5 >= 3) "as"
          else "null"
        (s"$a<$b", tier, s"$b@0", s"$a@0")
      }
      val linkRows = cands.map { case (p, tier, y, x) =>
        s"('$p','$tier','$y','$x',NULL::VARCHAR)" }.mkString(",\n    ")
      val wantedRows = cands.flatMap { case (_, _, y, x) =>
        val (a, b) = if (x <= y) (x, y) else (y, x)
        Seq(s"('$x','$x')", s"('$y','$y')", s"('$a','$b')")
      }.distinct.mkString(",\n    ")
      val lut = graft.metrics.Causal.chi2InvMilliLadder(cands.size)
      val lutRows = lut.zipWithIndex
        .map { case (q, i) => s"(${i + 1}, $q)" }.mkString(",\n    ")
      def agg(rule: String, disc: String): String =
        s"""  SELECT '$rule' AS rule, count(*)::BIGINT AS n_hyp,
          |    sum($disc)::BIGINT AS n_disc,
          |    sum(CASE WHEN $disc = 1 AND tier = 'ab' THEN 1 ELSE 0
          |      END)::BIGINT AS n_disc_ab,
          |    sum(CASE WHEN $disc = 1 AND tier = 'as' THEN 1 ELSE 0
          |      END)::BIGINT AS n_disc_as,
          |    sum(CASE WHEN $disc = 1 AND tier = 'null' THEN 1 ELSE 0
          |      END)::BIGINT AS n_false,
          |    sum(CASE WHEN tier = 'ab' THEN 1 ELSE 0 END)::BIGINT
          |      AS n_ab,
          |    sum(CASE WHEN tier = 'as' THEN 1 ELSE 0 END)::BIGINT
          |      AS n_as
          |  FROM dsc""".stripMargin
      s"""WITH panel AS (
        |  SELECT series, day, v
        |  FROM read_parquet('__GEN_DIR__/q371_panel/*.parquet')),
        |virt AS (SELECT series || '@0' AS vs, day AS t, v FROM panel),
        |wanted AS (SELECT * FROM (VALUES $wantedRows) AS w(na, nb)),
        |links AS (SELECT * FROM (VALUES $linkRows)
        |  AS l(pair, tier, y, x, sib)),
        |lut AS (SELECT * FROM (VALUES $lutRows) AS q(rk, q_milli)),
        |${graft.metrics.Causal.sparseMomentsSqlCtes(
             "virt", "wanted", "t BETWEEN 0 AND 59")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")},
        |inf AS (
        |  SELECT *,
        |    1000000 * cyy::HUGEINT - beta_ppm::HUGEINT * cjy
        |      AS rss_scaled
        |  FROM sbeta),
        |inf2 AS (
        |  SELECT *, (CASE WHEN cjj <= 0 OR n - 2 <= 0 THEN NULL
        |    ELSE (1000000 * rss_scaled)
        |      // ((n - 2) * cjj::HUGEINT) END)::BIGINT AS se2_ppm2
        |  FROM inf),
        |inf3 AS (
        |  SELECT *, (CASE WHEN se2_ppm2 IS NULL OR se2_ppm2 <= 0
        |    THEN NULL
        |    ELSE (1000 * beta_ppm::HUGEINT * beta_ppm) // se2_ppm2
        |    END)::BIGINT AS t2_milli
        |  FROM inf2),
        |rk0 AS (
        |  SELECT *, row_number() OVER (
        |    ORDER BY coalesce(t2_milli, -1) DESC, pair) AS rk
        |  FROM inf3),
        |rkd AS (SELECT r.*, q.q_milli FROM rk0 r JOIN lut q USING (rk)),
        |pass AS (
        |  SELECT *, max(CASE WHEN t2_milli >= q_milli THEN rk END)
        |    OVER () AS k_star
        |  FROM rkd),
        |dsc AS (
        |  SELECT *, (rk <= coalesce(k_star, 0))::INT AS disc_bh,
        |    (t2_milli >= ${lut.head})::INT AS disc_bonf
        |  FROM pass),
        |aggd AS (
        |${agg("bh", "disc_bh")}
        |  UNION ALL
        |${agg("bonferroni", "disc_bonf")})
        |SELECT *,
        |  (CASE WHEN n_disc = 0 THEN 0
        |    ELSE (1000 * n_false) // n_disc END)::BIGINT AS fdr_permille,
        |  ((1000 * n_disc_as) // n_as)::BIGINT AS power_as_permille
        |FROM aggd""".stripMargin
    },

    "q370_bh_fdr" -> {
      def nm(i: Int) = f"X$i%02d"
      val cands = for { dd <- 1 to 10; i <- 0 until 64 - dd }
        yield (nm(i), nm(i + dd), dd)
      val linkRows = cands.map { case (a, b, dist) =>
        s"('$a<$b',$dist,'$b@0','$a@0',NULL::VARCHAR)" }
        .mkString(",\n    ")
      val wantedRows = cands.flatMap { case (a, b, _) =>
        Seq(s"('$a@0','$a@0')", s"('$b@0','$b@0')", s"('$a@0','$b@0')") }
        .distinct.mkString(",\n    ")
      val lutRows = graft.metrics.Causal.chi2InvMilliLadder(cands.size)
        .zipWithIndex.map { case (q, i) => s"(${i + 1}, $q)" }
        .mkString(",\n    ")
      s"""WITH panel AS (
        |  SELECT series, day, v
        |  FROM read_parquet('__GEN_DIR__/q370_panel/*.parquet')),
        |virt AS (SELECT series || '@0' AS vs, day AS t, v FROM panel),
        |wanted AS (SELECT * FROM (VALUES $wantedRows) AS w(na, nb)),
        |links AS (SELECT * FROM (VALUES $linkRows)
        |  AS l(pair, dist, y, x, sib)),
        |lut AS (SELECT * FROM (VALUES $lutRows) AS q(rk, q_milli)),
        |${graft.metrics.Causal.sparseMomentsSqlCtes(
             "virt", "wanted", "t BETWEEN 0 AND 19999")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")},
        |inf AS (
        |  SELECT *,
        |    1000000 * cyy::HUGEINT - beta_ppm::HUGEINT * cjy
        |      AS rss_scaled
        |  FROM sbeta),
        |inf2 AS (
        |  SELECT *, (CASE WHEN cjj <= 0 OR n - 2 <= 0 THEN NULL
        |    ELSE (1000000 * rss_scaled)
        |      // ((n - 2) * cjj::HUGEINT) END)::BIGINT AS se2_ppm2
        |  FROM inf),
        |inf3 AS (
        |  SELECT *, (CASE WHEN se2_ppm2 IS NULL OR se2_ppm2 <= 0
        |    THEN NULL
        |    ELSE (1000 * beta_ppm::HUGEINT * beta_ppm) // se2_ppm2
        |    END)::BIGINT AS t2_milli
        |  FROM inf2),
        |rk0 AS (
        |  SELECT *, row_number() OVER (
        |    ORDER BY coalesce(t2_milli, -1) DESC, pair) AS rk
        |  FROM inf3),
        |rkd AS (SELECT r.*, q.q_milli FROM rk0 r JOIN lut q USING (rk)),
        |pass AS (
        |  SELECT *, max(CASE WHEN t2_milli >= q_milli THEN rk END)
        |    OVER () AS k_star
        |  FROM rkd),
        |dsc AS (
        |  SELECT *, (rk <= coalesce(k_star, 0))::INT AS disc
        |  FROM pass),
        |summ AS (
        |  SELECT max(k_star)::BIGINT AS k_star,
        |    sum(disc)::BIGINT AS n_disc_total,
        |    sum(CASE WHEN disc = 1 AND dist >= 4 THEN 1 ELSE 0 END)
        |      ::BIGINT AS n_false_disc
        |  FROM dsc),
        |summ2 AS (
        |  SELECT *, (CASE WHEN n_disc_total = 0 THEN 0
        |    ELSE (1000 * n_false_disc) // n_disc_total END)::BIGINT
        |    AS fdr_permille
        |  FROM summ)
        |SELECT dist::INT AS dist, count(*)::BIGINT AS n_pairs,
        |  sum(disc)::BIGINT AS n_disc,
        |  min(t2_milli) AS min_t2_milli, max(t2_milli) AS max_t2_milli,
        |  s.k_star, s.n_disc_total, s.n_false_disc, s.fdr_permille
        |FROM dsc, summ2 s GROUP BY 1, 6, 7, 8, 9""".stripMargin
    },

    "q369_maximal_recovery" -> {
      val cfgs = Grid.all().filter(c =>
        (c.family == "D3" || c.family == "D3C") && c.nVars == 4
          && c.nPoints == 500 && c.mixRatio == 0.5)
      val links = d3Links(cfgs)
      val linkRows = links.map { case (g, fam, ml, mcar, blk, tgt, src,
          lag, func, y, x, sib, dp, ep) =>
        s"('$g','$fam',$ml,$mcar,$blk,'$tgt','$src',$lag,'$func'," +
          s"'$y','$x'," +
          sib.map(v => s"'$v'").getOrElse("NULL::VARCHAR") + s",$dp,$ep)"
      }.mkString(",\n    ")
      def ids(lags: Int*): String = cfgs
        .filter(c => lags.contains(c.maxLag)).map(_.configId)
        .mkString("(", ", ", ")")
      val expRows = cfgs.map(c =>
        s"(${c.configId}, ${if (c.maxLag == 2) 8 else 9})")
        .mkString(",\n    ")
      val lxBlocks = (1 to 4).map(k =>
        graft.ops.Lagged.nearestLagIndexSqlCtes("spine", "\"time\"",
          Seq("configId"), lagMult = k, sfx = s"$k")).mkString(",\n")
      def chan0(vs: String, vc: String, mv: Int): String =
        s"  SELECT configId::VARCHAR || '|$vs@0' AS vs, " +
          s"configId*8192 + t AS t, floor($vc * 1000)::BIGINT AS v " +
          s"FROM gen WHERE (maskBits & ${1 << (mv - 1)}) = 0"
      def chanL(vs: String, vc: String, mv: Int, k: Int,
          idsIn: String): String =
        s"  SELECT p.configId::VARCHAR || '|$vs@$k', " +
          s"p.configId*8192 + l.t, floor(p.$vc * 1000)::BIGINT " +
          s"FROM lx$k l JOIN gen p ON p.configId = l.configId " +
          s"AND p.t = l.lag_idx " +
          s"WHERE (p.maskBits & ${1 << (mv - 1)}) = 0" +
          (if (idsIn == null) "" else s" AND p.configId IN $idsIn")
      val channels = ((1 to 4).map(i => chan0(s"X$i~", s"X${i}t", i)) ++
        Seq(chan0("p2X4", "p2X4", 4), chan0("p3X2", "p3X2", 2),
          chanL("sX3", "sX3", 3, 1, null),
          chanL("cX1", "cX1", 1, 2, ids(2, 3)),
          chanL("cX2", "cX2", 2, 3, ids(3, 4)),
          chanL("cX1", "cX1", 1, 4, ids(4))))
        .mkString("\n  UNION ALL\n")
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q369_gen/*.parquet')),
        |spine AS (SELECT configId, t, "time" FROM gen),
        |$lxBlocks,
        |virtall AS (
        |$channels),
        |expd AS (SELECT * FROM (VALUES $expRows) AS e(cfgid, exp)),
        |ct AS (
        |  SELECT c.t FROM (
        |    SELECT t, count(*) AS nch FROM virtall GROUP BY t) c
        |  JOIN expd e ON e.cfgid = c.t // 8192
        |  WHERE c.nch = e.exp),
        |virt AS (SELECT v.* FROM virtall v JOIN ct USING (t)),
        |links AS (SELECT * FROM (VALUES $linkRows)
        |  AS l(g, family, max_lag, mcar_permille, block_permille,
        |    target, source, lag, func, y, x, sib, declared_ppm,
        |    effective_ppm)),
        |${graft.metrics.Causal.structuralMomentsFromVirtualSqlCtes(
             "virt", "t % 8192 BETWEEN 4 AND 499")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")},
        |${graft.metrics.Causal.structuralInferenceSqlCtes()}
        |SELECT family, max_lag::INT AS max_lag,
        |  mcar_permille::BIGINT AS mcar_permille,
        |  block_permille::BIGINT AS block_permille,
        |  count(*)::BIGINT AS n_links,
        |  (sum(abs(beta_ppm - effective_ppm)) // count(*))::BIGINT
        |    AS mean_abs_err_ppm,
        |  max(abs(beta_ppm - effective_ppm))::BIGINT AS max_abs_err_ppm,
        |  max(CASE WHEN se2_ppm2 IS NULL OR se2_ppm2 <= 0 THEN NULL
        |    ELSE (1000 * (beta_ppm - effective_ppm)::HUGEINT
        |      * (beta_ppm - effective_ppm)) // se2_ppm2 END)::BIGINT
        |    AS max_diff_t2_milli,
        |  min(n)::BIGINT AS complete_n
        |FROM sttest GROUP BY 1, 2, 3, 4""".stripMargin
    },

    "q365_block_missing_recovery" -> {
      val cfgs = Grid.all().filter(c =>
        (c.family == "D2" || c.family == "D2C") && c.nVars == 4
          && c.nPoints == 5000 && c.noiseType == "gaussian")
        .map(_.copy(nPoints = 50000, noiseScale = 0.3))
      val links = cfgs.flatMap(c =>
        weightLinks(c.configId.toString, c.family, 4, c.maxLag))
      val blockOf = cfgs.map(c =>
        c.configId.toString -> math.round(c.blockProb * 1000)).toMap
      def p2(v: String): String = v.replace("@", "p2@")
      val linkRows = links.map(l =>
        s"('${l.g}','${l.family}',${l.maxLag},${blockOf(l.g)}," +
          s"'${l.target}','${l.source}',${l.lag},'${l.y}','${p2(l.x)}'," +
          l.sib.map(x => s"'${p2(x)}'").getOrElse("NULL::VARCHAR") +
          s",${l.declaredPpm},${l.effectivePpm})").mkString(",\n    ")
      val srcByLag = links.map(l => (l.lag, s"${l.source}p2")).distinct
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      def inList(ss: Seq[String]): String =
        ss.map(x => s"'$x'").mkString("(", ", ", ")")
      val lagsNeeded = srcByLag.keys.filter(_ > 0).toSeq.sorted
      val lxBlocks = lagsNeeded.map(k =>
        graft.ops.Lagged.nearestLagIndexSqlCtes("spine", "\"time\"",
          Seq("configId"), lagMult = k, sfx = s"$k")).mkString(",\n")
      val virtLag = lagsNeeded.map(k =>
        s"  UNION ALL SELECT p.configId::VARCHAR || '|' || p.series || " +
          s"'@$k', p.configId * 65536 + l.t, p.v\n" +
          s"    FROM lx$k l JOIN pan p ON p.configId = l.configId " +
          s"AND p.t = l.lag_idx " +
          s"WHERE p.series IN ${inList(srcByLag(k))}").mkString("\n")
      val sqRows = (1 to 4).map(i =>
        s"  UNION ALL SELECT configId, 'X${i}p2', t, " +
          s"floor(X$i * X$i * 1000)::BIGINT FROM gen " +
          s"WHERE (maskBits & ${1 << (i - 1)}) = 0").mkString("\n")
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q365_gen/*.parquet')),
        |spine AS (SELECT configId, t, "time" FROM gen),
        |$lxBlocks,
        |pan AS (
        |  SELECT configId, 'X1' AS series, t,
        |    floor(X1 * 1000)::BIGINT AS v
        |  FROM gen WHERE (maskBits & 1) = 0
        |${(2 to 4).map(i =>
             s"  UNION ALL SELECT configId, 'X$i', t, " +
               s"floor(X$i * 1000)::BIGINT FROM gen " +
               s"WHERE (maskBits & ${1 << (i - 1)}) = 0")
             .mkString("\n")}
        |$sqRows),
        |virtall AS (
        |  SELECT configId::VARCHAR || '|' || series || '@0' AS vs,
        |    configId * 65536 + t AS t, v
        |  FROM pan
        |  WHERE series NOT LIKE '%p2'
        |    OR series IN ${inList(srcByLag.getOrElse(0, Nil))}
        |$virtLag),
        |ct AS (SELECT t FROM virtall GROUP BY t HAVING count(*) = 10),
        |virt AS (SELECT v.* FROM virtall v JOIN ct USING (t)),
        |links AS (SELECT * FROM (VALUES $linkRows)
        |  AS l(g, family, max_lag, block_permille, target, source, lag,
        |    y, x, sib, declared_ppm, effective_ppm)),
        |${graft.metrics.Causal.structuralMomentsFromVirtualSqlCtes(
             "virt", "t % 65536 BETWEEN 4 AND 49999")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")},
        |${graft.metrics.Causal.structuralInferenceSqlCtes()}
        |SELECT family, max_lag::INT AS max_lag,
        |  block_permille::BIGINT AS block_permille,
        |  count(*)::BIGINT AS n_links,
        |  (sum(abs(beta_ppm - effective_ppm)) // count(*))::BIGINT
        |    AS mean_abs_err_ppm,
        |  max(abs(beta_ppm - effective_ppm))::BIGINT AS max_abs_err_ppm,
        |  max(CASE WHEN se2_ppm2 IS NULL OR se2_ppm2 <= 0 THEN NULL
        |    ELSE (1000 * (beta_ppm - effective_ppm)::HUGEINT
        |      * (beta_ppm - effective_ppm)) // se2_ppm2 END)::BIGINT
        |    AS max_diff_t2_milli,
        |  min(n)::BIGINT AS complete_n
        |FROM sttest GROUP BY 1, 2, 3""".stripMargin
    },

    "q368_stream_inference" -> {
      val tupSelects = streamWeightLinks().map { case (k, tgt, src, lag,
          hs, sibSeries, sibLag, _) =>
        def qc(series: String, l: Int): String =
          if (l == 0) s"floor($series * 1000)::BIGINT"
          else s"floor(L$l$series * 1000)::BIGINT"
        val sv = if (hs == 1) qc(sibSeries, sibLag) else "0::BIGINT"
        s"  SELECT '$k' AS link, ${qc(tgt, 0)} AS yv, " +
          s"${qc(src, lag)} AS xv, $sv AS sv, t FROM gl"
      }.mkString("\n  UNION ALL\n")
      def prefixSums(pred: String): String =
        s"""  SELECT link, count(*)::BIGINT AS n, sum(yv)::BIGINT AS sy,
          |    sum(xv)::BIGINT AS sx, sum(sv)::BIGINT AS ss,
          |    sum(yv * yv)::BIGINT AS syy,
          |    sum(xv * xv)::BIGINT AS sxx, sum(sv * sv)::BIGINT AS sss,
          |    sum(xv * yv)::BIGINT AS sxy, sum(sv * yv)::BIGINT AS ssy,
          |    sum(xv * sv)::BIGINT AS sxs
          |  FROM tup$pred GROUP BY 1""".stripMargin
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q368_gen/*.parquet')),
        |gl AS (
        |  SELECT a.*,
        |${(1 to 6).map(i => s"    b.X$i AS L1X$i,").mkString("\n")}
        |${(1 to 6).map(i => s"    c.X$i AS L2X$i")
             .mkString(",\n")}
        |  FROM gen a
        |  JOIN gen b ON b.t = a.t - 1
        |  JOIN gen c ON c.t = a.t - 2
        |  WHERE a.t BETWEEN 2 AND 399),
        |tup AS (
        |$tupSelects),
        |links AS (SELECT * FROM ${streamWeightLinksValuesSql()}),
        |sums AS (
        |${prefixSums(" WHERE t < 50")}
        |  UNION ALL
        |${prefixSums(" WHERE t < 200")}
        |  UNION ALL
        |${prefixSums("")}),
        |wf AS (
        |  SELECT s.*, l.target, l.source, l.lag, l.has_sib,
        |    l.effective_ppm
        |  FROM sums s JOIN links l USING (link)),
        |${graft.metrics.Causal.structuralBetasFromSumsSqlCtes("wf")},
        |${graft.metrics.Causal.structuralInferenceFromSumsSqlCtes()}
        |SELECT target, source, lag::INT AS lag, n, beta_ppm,
        |  se2_ppm2, t2_milli, (t2_milli > 3841)::INT AS significant,
        |  effective_ppm::BIGINT AS effective_ppm
        |FROM stsum""".stripMargin
    },

    "q367_forecast_calibration" -> {
      val links = weightLinks("", "A1", 6, 2)
      val specs = weightSpecs(links)
      val virtRows = specs.map { case (series, k) =>
        s"SELECT '$series@$k' AS vs, t + $k AS t, " +
          s"floor($series * 1000)::BIGINT AS v FROM gen"
      }.mkString("\n  UNION ALL ")
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q367_gen/*.parquet')),
        |virt AS (
        |  $virtRows),
        |links AS (SELECT * FROM ${weightLinksValuesSql(links)}),
        |${graft.metrics.Causal.structuralMomentsFromVirtualSqlCtes(
             "virt", "t BETWEEN 2 AND 2499")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")},
        |${graft.metrics.Causal.structuralInferenceSqlCtes()},
        |stats AS (
        |  SELECT vs, count(*)::HUGEINT AS cn, sum(v)::HUGEINT AS cs
        |  FROM virt WHERE t BETWEEN 2 AND 2499 GROUP BY 1),
        |test AS (SELECT vs, t, v FROM virt WHERE t BETWEEN 2500 AND 4999),
        |contrib AS (
        |  SELECT b.target, b.y, xt.t,
        |    sum(b.beta_ppm::HUGEINT * (sx.cn * xt.v - sx.cs)) AS sdx,
        |    max(b.k_parents) AS kp, max(b.rss_scaled) AS rss,
        |    max(b.n) AS ntr
        |  FROM sttest b
        |  JOIN stats sx ON sx.vs = b.x
        |  JOIN test xt ON xt.vs = b.x
        |  GROUP BY 1, 2, 3),
        |prows AS (
        |  SELECT c.target, c.t,
        |    1000000 * (sy.cn * yt.v - sy.cs) - c.sdx AS dnum,
        |    c.kp, c.rss, c.ntr
        |  FROM contrib c
        |  JOIN stats sy ON sy.vs = c.y
        |  JOIN test yt ON yt.vs = c.y AND yt.t = c.t),
        |cov AS (
        |  SELECT target, max(kp)::BIGINT AS n_parents,
        |    count(*)::BIGINT AS n_test,
        |    sum(CASE WHEN 10000 * dnum * dnum * (ntr - kp - 1)
        |      <= 38416000000 * ntr::HUGEINT * rss
        |      THEN 1 ELSE 0 END)::BIGINT AS n_cover
        |  FROM prows GROUP BY 1)
        |SELECT target, n_parents, n_test, n_cover,
        |  ((1000 * n_cover) // n_test)::BIGINT AS cover_permille
        |FROM cov""".stripMargin
    },

    "q366_lag_identification" -> {
      val links = weightLinks("", "A1", 6, 2)
      val cands = 0 to 4
      val specs = (links.map(l => (l.target, 0)) ++
        links.flatMap(l => cands.map(c => (l.source, c)))).distinct
      val specRows = specs.map { case (series, lag) =>
        s"('$series',$lag)" }.mkString(",\n    ")
      val linkRows = links.flatMap { l =>
        cands.flatMap { c =>
          val vk = s"${l.target}<${l.source}|$c"
          val swept = s"('$vk','${l.target}','${l.source}',${l.lag},$c," +
            s"${l.effectivePpm},1,'${l.y}','${l.source}@$c'," +
            l.sib.map(x => s"'$x'").getOrElse("NULL::VARCHAR") + ")"
          val sib = l.sib.map(sv =>
            s"('$vk','${l.target}','${l.source}',${l.lag},$c," +
              s"${l.effectivePpm},0,'${l.y}','$sv','${l.source}@$c')")
          Seq(swept) ++ sib
        }
      }.mkString(",\n    ")
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q366_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |${(2 to 6).map(i =>
             s"  UNION ALL SELECT 'X$i', t, floor(X$i * 1000)::BIGINT FROM gen")
             .mkString("\n")}),
        |specs AS (SELECT * FROM (VALUES $specRows) AS s(series, lag)),
        |links AS (SELECT * FROM (VALUES $linkRows)
        |  AS l(vk, target, source, true_lag, cand, effective_ppm, swept,
        |    y, x, sib)),
        |${graft.metrics.Causal.structuralMomentsSqlCtes(
             "panel", "specs", "t BETWEEN 4 AND 4999")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")},
        |rss AS (
        |  SELECT *, 1000000 * cyy::HUGEINT
        |      - sum(beta_ppm::HUGEINT * cjy) OVER (PARTITION BY vk)
        |      AS rss_scaled
        |  FROM sbeta),
        |ranked AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY target, source
        |      ORDER BY rss_scaled, cand) AS rk,
        |    lead(rss_scaled, 1) OVER (PARTITION BY target, source
        |      ORDER BY rss_scaled, cand) AS next_rss
        |  FROM rss WHERE swept = 1)
        |SELECT target, source, true_lag::INT AS true_lag,
        |  effective_ppm::BIGINT AS effective_ppm,
        |  cand::INT AS best_lag,
        |  (cand = true_lag)::INT AS identified,
        |  (((next_rss - rss_scaled) * 1000) // rss_scaled)::BIGINT
        |    AS gap_permille
        |FROM ranked WHERE rk = 1""".stripMargin
    },

    "q363_beta_ttest" -> {
      val links = weightLinks("", "A1", 6, 2)
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q363_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |${(2 to 6).map(i =>
             s"  UNION ALL SELECT 'X$i', t, floor(X$i * 1000)::BIGINT FROM gen")
             .mkString("\n")}),
        |specs AS (SELECT * FROM ${weightSpecsValuesSql(links)}),
        |links AS (SELECT * FROM ${weightLinksValuesSql(links)}),
        |${graft.metrics.Causal.structuralMomentsSqlCtes(
             "panel", "specs", "t BETWEEN 2 AND 4999")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")},
        |${graft.metrics.Causal.structuralInferenceSqlCtes()}
        |SELECT target, source, lag::INT AS lag, beta_ppm,
        |  effective_ppm::BIGINT AS effective_ppm,
        |  k_parents::BIGINT AS k_parents, se2_ppm2, t2_milli,
        |  (t2_milli > 3841)::INT AS significant
        |FROM sttest""".stripMargin
    },

    "q364_inference_census" -> {
      val cfgs = Grid.all().filter(c =>
        (c.family == "A1" || c.family == "A1C") && c.nPoints == 5000
          && c.noiseType == "gaussian")
      val links = cfgs.flatMap(c =>
        weightLinks(c.configId.toString, c.family, c.nVars, c.maxLag))
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q364_gen/*.parquet')),
        |panel AS (
        |  SELECT configId::VARCHAR || '|X1' AS series,
        |    configId * 8192 + t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen WHERE X1 IS NOT NULL
        |${(2 to 8).map(i =>
             s"  UNION ALL SELECT configId::VARCHAR || '|X$i', " +
               s"configId * 8192 + t, floor(X$i * 1000)::BIGINT " +
               s"FROM gen WHERE X$i IS NOT NULL").mkString("\n")}),
        |specs AS (SELECT * FROM ${weightSpecsValuesSql(links)}),
        |links AS (SELECT * FROM ${weightLinksValuesSql(links)}),
        |${graft.metrics.Causal.structuralMomentsSqlCtes(
             "panel", "specs", "t % 8192 BETWEEN 4 AND 4999")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")},
        |${graft.metrics.Causal.structuralInferenceSqlCtes()}
        |SELECT family, n_vars::INT AS n_vars, max_lag::INT AS max_lag,
        |  count(*)::BIGINT AS n_links,
        |  sum(CASE WHEN effective_ppm <> 0 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_live,
        |  sum(CASE WHEN effective_ppm <> 0 AND t2_milli > 3841
        |    THEN 1 ELSE 0 END)::BIGINT AS n_sig_live,
        |  sum(CASE WHEN effective_ppm = 0 AND t2_milli > 3841
        |    THEN 1 ELSE 0 END)::BIGINT AS n_sig_dead,
        |  sum(CASE WHEN se2_ppm2 IS NOT NULL AND se2_ppm2 > 0
        |    AND (1000 * (beta_ppm - effective_ppm)::HUGEINT
        |      * (beta_ppm - effective_ppm)) // se2_ppm2 <= 3841
        |    THEN 1 ELSE 0 END)::BIGINT AS n_cover,
        |  min(CASE WHEN effective_ppm <> 0 THEN t2_milli END)
        |    AS min_live_t2_milli,
        |  max(CASE WHEN effective_ppm = 0 THEN t2_milli END)
        |    AS max_dead_t2_milli
        |FROM sttest GROUP BY 1, 2, 3""".stripMargin
    },

    "q355_power_recovery_contrast" -> {
      def chain(dump: String, sfx: String): String = {
        val unions = (1 to 4).flatMap(i => Seq(
          s"  UNION ALL SELECT 'X$i', t, floor(X$i * 1000)::BIGINT " +
            s"FROM gen$sfx",
          s"  UNION ALL SELECT 'X${i}p2', t, " +
            s"floor(X$i * X$i * 1000)::BIGINT FROM gen$sfx",
          s"  UNION ALL SELECT 'X${i}p3', t, " +
            s"floor(X$i * X$i * X$i * 1000)::BIGINT FROM gen$sfx"))
          .drop(1).mkString("\n")
        s"""gen$sfx AS (
          |  SELECT * FROM read_parquet('__GEN_DIR__/$dump/*.parquet')),
          |panel$sfx AS (
          |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
          |  FROM gen$sfx
          |$unions),
          |${graft.metrics.Causal.structuralMomentsSqlCtes(
               s"panel$sfx", "specs", "t BETWEEN 2 AND 49999", sfx)},
          |${graft.metrics.Causal.structuralBetasSqlCtes("links", sfx)}"""
          .stripMargin
      }
      s"""WITH specs AS (SELECT * FROM ${
             "(VALUES " + b1PowerSpecs().map { case (series, lag) =>
               s"('$series',$lag)" }.mkString(",\n    ") +
               ") AS s(series, lag)"}),
        |links AS (SELECT * FROM ${b1PowerLinksValuesSql()}),
        |${chain("q355_gen_default", "d")},
        |${chain("q355_gen_strict", "s")}
        |SELECT bd.target, bd.source, bd.lag::INT AS lag,
        |  bd.pow::INT AS pow,
        |  bd.declared_ppm::BIGINT AS declared_ppm,
        |  bd.effective_ppm::BIGINT AS effective_ppm,
        |  bd.beta_ppm AS beta_default_ppm, bs.beta_ppm AS beta_strict_ppm
        |FROM sbetad bd JOIN sbetas bs ON bs.target = bd.target
        |  AND bs.source = bd.source AND bs.lag = bd.lag
        |  AND bs.pow = bd.pow""".stripMargin
    },

    "q356_weight_recovery_irregular" -> {
      val links = weightLinks("", "A2", 4, 2)
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q356_gen/*.parquet')),
        |${graft.ops.Lagged.nearestLagIndexSqlCtes("gen", "\"time\"",
             lagMult = 1, sfx = "1")},
        |${graft.ops.Lagged.nearestLagIndexSqlCtes("gen", "\"time\"",
             lagMult = 2, sfx = "2")},
        |pan AS (
        |  SELECT 'X1' AS series, t, floor(X1 * 1000)::BIGINT AS v FROM gen
        |  UNION ALL SELECT 'X2', t, floor(X2 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X3', t, floor(X3 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X4', t, floor(X4 * 1000)::BIGINT FROM gen),
        |virt AS (
        |  SELECT series || '@0' AS vs, t, v FROM pan
        |  UNION ALL SELECT p.series || '@1', l.t, p.v
        |    FROM lx1 l JOIN pan p ON p.t = l.lag_idx
        |  UNION ALL SELECT p.series || '@2', l.t, p.v
        |    FROM lx2 l JOIN pan p ON p.t = l.lag_idx),
        |links AS (SELECT * FROM ${weightLinksValuesSql(links)}),
        |${graft.metrics.Causal.structuralMomentsFromVirtualSqlCtes(
             "virt", "t BETWEEN 2 AND 4999")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")}
        |SELECT target, source, lag::INT AS lag, beta_ppm,
        |  declared_ppm::BIGINT AS declared_ppm,
        |  effective_ppm::BIGINT AS effective_ppm,
        |  abs(beta_ppm - effective_ppm)::BIGINT AS abs_err_ppm
        |FROM sbeta""".stripMargin
    },

    "q357_weight_recovery_holdout" -> {
      val links = weightLinks("", "A1", 6, 2)
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q357_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |${(2 to 6).map(i =>
             s"  UNION ALL SELECT 'X$i', t, floor(X$i * 1000)::BIGINT FROM gen")
             .mkString("\n")}),
        |specs AS (SELECT * FROM ${weightSpecsValuesSql(links)}),
        |links AS (SELECT * FROM ${weightLinksValuesSql(links)}),
        |${graft.metrics.Causal.structuralMomentsSqlCtes(
             "panel", "specs", "t BETWEEN 2 AND 2499", "tr")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links", "tr")},
        |${graft.metrics.Causal.structuralMomentsSqlCtes(
             "panel", "specs", "t BETWEEN 2500 AND 4999", "te")},
        |bt AS (
        |  SELECT target, y, x, sib, beta_ppm, n AS ntr, cyy AS cyytr,
        |    cjy AS cjytr
        |  FROM sbetatr),
        |bsib AS (
        |  SELECT b1.*, coalesce(b2.beta_ppm, 0) AS beta_sib
        |  FROM bt b1 LEFT JOIN bt b2
        |    ON b2.target = b1.target AND b2.x = b1.sib),
        |tj AS (
        |  SELECT b.*, myy.n AS nte, myy.c AS cyyte, mjj.c AS cjjte,
        |    mjy.c AS cjyte, mjs.c AS cjste
        |  FROM bsib b
        |  LEFT JOIN smcte myy ON myy.na = b.y AND myy.nb = b.y
        |  LEFT JOIN smcte mjj ON mjj.na = b.x AND mjj.nb = b.x
        |  LEFT JOIN smcte mjy ON mjy.na = least(b.x, b.y)
        |    AND mjy.nb = greatest(b.x, b.y)
        |  LEFT JOIN smcte mjs ON mjs.na = least(b.x, b.sib)
        |    AND mjs.nb = greatest(b.x, b.sib)),
        |agg AS (
        |  SELECT target, count(*)::BIGINT AS n_parents,
        |    ((1000000 * max(cyytr::HUGEINT)
        |        - sum(beta_ppm::HUGEINT * cjytr))
        |      // (1000000 * max(ntr::HUGEINT) * max(ntr)))::BIGINT
        |      AS sigma2_train_v,
        |    ((max(cyyte::HUGEINT) + sum(
        |        (beta_ppm::HUGEINT * beta_ppm * cjjte) // 1000000000000
        |        + (beta_ppm::HUGEINT * beta_sib * coalesce(cjste, 0))
        |          // 1000000000000
        |        - (2 * beta_ppm::HUGEINT * cjyte) // 1000000))
        |      // (max(nte::HUGEINT) * max(nte)))::BIGINT AS sigma2_test_v
        |  FROM tj GROUP BY 1)
        |SELECT target, n_parents, sigma2_train_v, sigma2_test_v,
        |  (CASE WHEN sigma2_train_v = 0 THEN 0
        |    ELSE (1000 * sigma2_test_v) // sigma2_train_v END)::BIGINT
        |    AS ratio_permille
        |FROM agg""".stripMargin
    },

    "q358_stream_weight_recovery" -> {
      val tupSelects = streamWeightLinks().map { case (k, tgt, src, lag,
          hs, sibSeries, sibLag, _) =>
        def qc(series: String, l: Int): String =
          if (l == 0) s"floor($series * 1000)::BIGINT"
          else s"floor(L$l$series * 1000)::BIGINT"
        val sv = if (hs == 1) qc(sibSeries, sibLag) else "0::BIGINT"
        s"  SELECT '$k' AS link, ${qc(tgt, 0)} AS yv, " +
          s"${qc(src, lag)} AS xv, $sv AS sv, t FROM gl"
      }.mkString("\n  UNION ALL\n")
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q358_gen/*.parquet')),
        |gl AS (
        |  SELECT a.*,
        |${(1 to 6).map(i => s"    b.X$i AS L1X$i,").mkString("\n")}
        |${(1 to 6).map(i => s"    c.X$i AS L2X$i")
             .mkString(",\n")}
        |  FROM gen a
        |  JOIN gen b ON b.t = a.t - 1
        |  JOIN gen c ON c.t = a.t - 2
        |  WHERE a.t BETWEEN 2 AND 399),
        |tup AS (
        |$tupSelects),
        |links AS (SELECT * FROM ${streamWeightLinksValuesSql()}),
        |sums AS (
        |  SELECT link, count(*)::BIGINT AS n, sum(yv)::BIGINT AS sy,
        |    sum(xv)::BIGINT AS sx, sum(sv)::BIGINT AS ss,
        |    sum(xv * xv)::BIGINT AS sxx, sum(sv * sv)::BIGINT AS sss,
        |    sum(xv * yv)::BIGINT AS sxy, sum(sv * yv)::BIGINT AS ssy,
        |    sum(xv * sv)::BIGINT AS sxs
        |  FROM tup WHERE t < 200 GROUP BY 1
        |  UNION ALL
        |  SELECT link, count(*)::BIGINT, sum(yv)::BIGINT, sum(xv)::BIGINT,
        |    sum(sv)::BIGINT, sum(xv * xv)::BIGINT, sum(sv * sv)::BIGINT,
        |    sum(xv * yv)::BIGINT, sum(sv * yv)::BIGINT,
        |    sum(xv * sv)::BIGINT
        |  FROM tup GROUP BY 1),
        |wf AS (
        |  SELECT s.*, l.target, l.source, l.lag, l.has_sib,
        |    l.effective_ppm
        |  FROM sums s JOIN links l USING (link)),
        |${graft.metrics.Causal.structuralBetasFromSumsSqlCtes("wf")}
        |SELECT target, source, lag::INT AS lag, n, beta_ppm,
        |  effective_ppm::BIGINT AS effective_ppm
        |FROM sbsum""".stripMargin
    },

    "q362_shadow_census" -> {
      val cfgs = Grid.all().filter(c =>
        c.family == "D1" && c.nVars == 4 && c.maxLag == 2
          && c.nPoints == 5000 && c.noiseType == "gaussian")
      val wlinks = cfgs.flatMap(c =>
        weightLinks(c.configId.toString, "D1", 4, 2))
      val mcarOf = cfgs.map(c =>
        c.configId.toString -> math.round(c.mcarProb * 1000)).toMap
      val linkRows = wlinks.map(l =>
        s"('${l.g}',${mcarOf(l.g)},'${l.target}','${l.source}',${l.lag}," +
          s"'${l.y}','${l.x}'," +
          l.sib.map(x => s"'$x'").getOrElse("NULL::VARCHAR") +
          s",${l.declaredPpm},${l.effectivePpm})").mkString(",\n    ")
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q362_gen/*.parquet')),
        |panel AS (
        |  SELECT configId::VARCHAR || '|X1' AS series,
        |    configId * 8192 + t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen WHERE (maskBits & 1) = 0
        |${(2 to 4).map(i =>
             s"  UNION ALL SELECT configId::VARCHAR || '|X$i', " +
               s"configId * 8192 + t, floor(X$i * 1000)::BIGINT " +
               s"FROM gen WHERE (maskBits & ${1 << (i - 1)}) = 0")
             .mkString("\n")}),
        |specs AS (SELECT * FROM ${weightSpecsValuesSql(wlinks)}),
        |links AS (SELECT * FROM (VALUES $linkRows)
        |  AS l(g, mcar_permille, target, source, lag, y, x, sib,
        |    declared_ppm, effective_ppm)),
        |${graft.metrics.Causal.structuralMomentsSqlCtes(
             "panel", "specs", "t % 8192 BETWEEN 4 AND 4999")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")}
        |SELECT mcar_permille::BIGINT AS mcar_permille,
        |  count(*)::BIGINT AS n_links,
        |  sum(CASE WHEN effective_ppm = 0 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_dead,
        |  max(abs(beta_ppm))::BIGINT AS max_abs_beta_ppm,
        |  min(n)::BIGINT AS min_pair_n, max(n)::BIGINT AS max_pair_n
        |FROM sbeta GROUP BY 1""".stripMargin
    },

    "q361_seasonal_recovery_contrast" -> {
      val links = c1Links()
      def vals(naive: Boolean): String =
        "(VALUES " + links.map { l =>
          val y = if (naive) s"${l._1}@0" else l._6
          s"('${l._1}','${l._2}',${l._3},'${l._4}','$y','${l._5}'," +
            l._7.map(x => s"'$x'").getOrElse("NULL::VARCHAR") +
            s",${l._8},${l._9})"
        }.mkString(",\n    ") +
          ") AS l(target, source, lag, func, y, x, sib, declared_ppm," +
          " effective_ppm)"
      val targetCh = (1 to 6).flatMap(i => Seq(
        s"  UNION ALL SELECT 'X$i~@0' AS vs, t, " +
          s"floor(X${i}t * 1000)::BIGINT AS v FROM gen",
        s"  UNION ALL SELECT 'X$i@0' AS vs, t, " +
          s"floor(X$i * 1000)::BIGINT AS v FROM gen"))
      val regCh = links.map(l => (l._5.split("@")(0), l._5, l._3))
        .distinct.map { case (series, vs, lag) =>
          s"  UNION ALL SELECT '$vs' AS vs, t + $lag AS t, " +
            s"floor($series * 1000)::BIGINT AS v FROM gen" }
      val channels = (targetCh ++ regCh).mkString("\n")
        .replaceFirst("  UNION ALL ", "  ")
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q361_gen/*.parquet')),
        |virt AS (
        |$channels),
        |linksd AS (SELECT * FROM ${vals(naive = false)}),
        |linksn AS (SELECT * FROM ${vals(naive = true)}),
        |${graft.metrics.Causal.structuralMomentsFromVirtualSqlCtes(
             "virt", "t BETWEEN 2 AND 499")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("linksd", "d",
             momSfx = "")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("linksn", "n",
             momSfx = "")}
        |SELECT d.target, d.source, d.lag::INT AS lag, d.func,
        |  d.declared_ppm::BIGINT AS declared_ppm,
        |  d.effective_ppm::BIGINT AS effective_ppm,
        |  d.beta_ppm AS beta_detrended_ppm,
        |  n.beta_ppm AS beta_naive_ppm
        |FROM sbetad d JOIN sbetan n ON n.target = d.target
        |  AND n.source = d.source AND n.lag = d.lag""".stripMargin
    },

    "q360_irregular_recovery_census" -> {
      val cfgs = Grid.all().filter(c =>
        ((c.family == "A2" && c.nVars == 4) || c.family == "A2C")
          && c.nPoints == 5000 && c.noiseType == "gaussian")
      val links = cfgs.flatMap(c =>
        weightLinks(c.configId.toString, c.family, c.nVars, c.maxLag))
      val lagsNeeded = links.map(_.lag).filter(_ > 0).distinct.sorted
      val lxBlocks = lagsNeeded.map(k =>
        graft.ops.Lagged.nearestLagIndexSqlCtes("spine", "\"time\"",
          Seq("configId"), lagMult = k, sfx = s"$k")).mkString(",\n")
      val virtLag = lagsNeeded.map(k =>
        s"  UNION ALL SELECT p.configId::VARCHAR || '|' || p.series || " +
          s"'@$k', p.configId * 8192 + l.t, p.v\n" +
          s"    FROM lx$k l JOIN pan p ON p.configId = l.configId " +
          s"AND p.t = l.lag_idx").mkString("\n")
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q360_gen/*.parquet')),
        |spine AS (SELECT configId, t, "time" FROM gen),
        |$lxBlocks,
        |pan AS (
        |  SELECT configId, 'X1' AS series, t,
        |    floor(X1 * 1000)::BIGINT AS v
        |  FROM gen WHERE X1 IS NOT NULL
        |${(2 to 8).map(i =>
             s"  UNION ALL SELECT configId, 'X$i', t, " +
               s"floor(X$i * 1000)::BIGINT FROM gen WHERE X$i IS NOT NULL")
             .mkString("\n")}),
        |virt AS (
        |  SELECT configId::VARCHAR || '|' || series || '@0' AS vs,
        |    configId * 8192 + t AS t, v
        |  FROM pan
        |$virtLag),
        |links AS (SELECT * FROM ${weightLinksValuesSql(links)}),
        |${graft.metrics.Causal.structuralMomentsFromVirtualSqlCtes(
             "virt", "t % 8192 BETWEEN 4 AND 4999")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")}
        |SELECT family, n_vars::INT AS n_vars, max_lag::INT AS max_lag,
        |  count(*)::BIGINT AS n_links,
        |  sum(CASE WHEN effective_ppm = 0 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_dead,
        |  (sum(abs(beta_ppm - effective_ppm)) // count(*))::BIGINT
        |    AS mean_abs_err_ppm,
        |  max(abs(beta_ppm - effective_ppm))::BIGINT AS max_abs_err_ppm
        |FROM sbeta GROUP BY 1, 2, 3""".stripMargin
    },

    "q359_weight_recovery_wide" -> {
      def nm(i: Int) = f"X$i%02d"
      val links = (1 until 64).map(i => (nm(i), nm(i - 1)))
      val wantedRows = links.flatMap { case (t, src) =>
        Seq(s"('$t@0','$t@0')", s"('$src@0','$src@0')",
          s"('$src@0','$t@0')")
      }.distinct.mkString(",\n    ")
      val linkRows = links.map { case (t, src) =>
        s"('$t','$src',0,'$t@0','$src@0',NULL::VARCHAR)"
      }.mkString(",\n    ")
      s"""WITH panel AS (
        |  SELECT series, day, v
        |  FROM read_parquet('__GEN_DIR__/q359_panel/*.parquet')),
        |virt AS (SELECT series || '@0' AS vs, day AS t, v FROM panel),
        |wanted AS (SELECT * FROM (VALUES $wantedRows) AS w(na, nb)),
        |links AS (SELECT * FROM (VALUES $linkRows)
        |  AS l(target, source, lag, y, x, sib)),
        |${graft.metrics.Causal.sparseMomentsSqlCtes(
             "virt", "wanted", "t BETWEEN 0 AND 9999")},
        |${graft.metrics.Causal.structuralBetasSqlCtes("links")}
        |SELECT target, source, beta_ppm FROM sbeta""".stripMargin
    },

    "q179_aqe_skew_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, floor(value * 1e6)::BIGINT AS vm,
        |    CASE WHEN user_id % 100 < 90 THEN 0 ELSE user_id END AS k
        |  FROM events),
        |dim AS (
        |  SELECT user_id AS k, count(*)::BIGINT AS k_weight FROM ev
        |  WHERE user_id % 100 >= 90 GROUP BY 1
        |  UNION ALL SELECT 0, 1)
        |SELECT event_type, count(*)::BIGINT AS n_events,
        |  sum(vm)::BIGINT AS sum_vm, sum(k_weight)::BIGINT AS sum_k_weight
        |FROM ev JOIN dim USING (k)
        |GROUP BY 1""".stripMargin,

    "q38_generate_shapes" ->
      s"""SELECT family, nVars AS n_vars, count(*) AS n_rows,
        |  ${sumMicroSql("X1")} AS sum_x1_micro,
        |  sum(maskBits)::BIGINT AS mask_sum
        |FROM read_parquet('__GEN_DIR__/q38_wide/*.parquet')
        |GROUP BY family, nVars""".stripMargin,

    "q49_ivf_topk" -> IvfTopkOracleSql,

    "q47_skew_distinct" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_distinct
        |FROM events GROUP BY event_type""".stripMargin,

    "q48_salted_join" ->
      """WITH p AS (SELECT user_id, count(*) AS n_purchases FROM events
        |           WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT e.event_type, count(*) AS n_events,
        |  sum(p.n_purchases)::BIGINT AS sum_purch
        |FROM events e JOIN p ON e.user_id = p.user_id
        |GROUP BY e.event_type""".stripMargin,

    "q43_plot_series" -> {
      val arms = (1 to 4).map(i =>
        s"SELECT t, \"time\", 'X$i' AS var, X$i AS value FROM read_parquet('__GEN_DIR__/q43_wide/*.parquet')")
        .mkString("\n  UNION ALL\n  ")
      s"""SELECT var, t, "time", value FROM (
         |  $arms)
         |WHERE t % 10 = 0""".stripMargin
    },

    "q44_plot_missing_pattern" -> {
      (1 to 6).map(i =>
        s"""SELECT 'X$i' AS var, t // 50 AS t_bucket,
           |  sum(CASE WHEN X$i IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_missing,
           |  count(*) AS n_total
           |FROM read_parquet('__GEN_DIR__/q44_missing/*.parquet') GROUP BY 2""".stripMargin)
        .mkString("\nUNION ALL\n")
    },

    "q45_plot_sampling_hist" ->
      """WITH d AS (
        |  SELECT "time" - lag("time") OVER (PARTITION BY configId ORDER BY t) AS diff
        |  FROM read_parquet('__GEN_DIR__/q45_wide/*.parquet'))
        |SELECT floor(diff / 0.002)::BIGINT AS bin,
        |  floor(diff / 0.002)::BIGINT * 0.002::DOUBLE AS bin_lo, count(*) AS n
        |FROM d WHERE diff IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    "q46_plot_trend_fit" -> {
      val arms = (1 to 4).map(i =>
        s"SELECT \"time\", 'X$i' AS var, X$i AS value FROM read_parquet('__GEN_DIR__/q46_wide/*.parquet')")
        .mkString("\n  UNION ALL\n  ")
      s"""SELECT var, ${slopeMilliSql("value", "\"time\"")} AS slope_milli,
         |  ${interceptMilliSql("value", "\"time\"")} AS intercept_milli, count(*) AS n
         |FROM (
         |  $arms)
         |GROUP BY var""".stripMargin
    },

    "q20_truth_links" -> OracleData.truthLinksSql,

    "q21_grid_configs" -> {
      def grid(fams: Seq[String], noises: Seq[String], ratios: Seq[Double],
               mcars: Seq[Double], blocks: Seq[Double]) = {
        val f = fams.map(x => s"('$x')").mkString(",")
        val no = noises.map(x => s"('$x')").mkString(",")
        val ra = ratios.map(x => s"($x::DOUBLE)").mkString(",")
        val mc = mcars.map(x => s"($x::DOUBLE)").mkString(",")
        val bl = blocks.map(x => s"($x::DOUBLE)").mkString(",")
        s"""SELECT family, n_points, n_vars, max_lag, noise_type, mix_ratio, mcar_prob, block_prob
           |FROM (VALUES $f) f(family)
           |CROSS JOIN (VALUES (500),(1000),(3000),(5000)) s(n_points)
           |CROSS JOIN (VALUES (4),(6),(8)) v(n_vars)
           |CROSS JOIN (VALUES (2),(3),(4)) l(max_lag)
           |CROSS JOIN (VALUES $no) n(noise_type)
           |CROSS JOIN (VALUES $ra) r(mix_ratio)
           |CROSS JOIN (VALUES $mc) m(mcar_prob)
           |CROSS JOIN (VALUES $bl) b(block_prob)""".stripMargin
      }
      Seq(
        grid(Seq("A1", "A1C", "A2", "A2C", "B1", "B1C", "C2", "C2C"),
          Seq("gaussian", "student_t"), Seq(1.0), Seq(0.0), Seq(0.0)),
        grid(Seq("B2", "B2C"), Seq("mixed"), Seq(0.3, 0.5, 0.7), Seq(0.0), Seq(0.0)),
        grid(Seq("C1", "C1C"), Seq("gaussian"), Seq(1.0), Seq(0.0), Seq(0.0)),
        grid(Seq("D1", "D1C"), Seq("gaussian", "student_t"), Seq(1.0), Seq(0.1, 0.2, 0.3), Seq(0.0)),
        grid(Seq("D2", "D2C"), Seq("gaussian", "student_t"), Seq(1.0), Seq(0.0), Seq(0.1, 0.2, 0.3)),
        grid(Seq("D3", "D3C"), Seq("mixed"), Seq(0.3, 0.5, 0.7), Seq(0.05, 0.1), Seq(0.05, 0.1))
      ).mkString("\n UNION ALL \n")
    },

    "q70_resample_ffill" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS ts_us, event_id,
        |         floor(value * 1e6)::BIGINT AS v_micro
        |  FROM events),
        |b AS (SELECT event_type,
        |             ts_us - ((ts_us % 600000000 + 600000000) % 600000000) AS bucket_us,
        |             ts_us, event_id, v_micro FROM ev),
        |agg AS (
        |  SELECT event_type, bucket_us, count(*) AS n_events,
        |         max(CASE WHEN rn = 1 THEN v_micro END) AS last_v_micro
        |  FROM (SELECT *, row_number() OVER (
        |          PARTITION BY event_type, bucket_us
        |          ORDER BY ts_us DESC, event_id DESC) AS rn FROM b)
        |  GROUP BY event_type, bucket_us),
        |bounds AS (SELECT min(bucket_us) AS b0, max(bucket_us) AS b1 FROM agg),
        |grid AS (
        |  SELECT t.event_type, g.g AS bucket_us
        |  FROM (SELECT DISTINCT event_type FROM ev) t
        |  CROSS JOIN (SELECT unnest(generate_series(b0, b1, 600000000)) AS g
        |              FROM bounds) g),
        |j AS (
        |  SELECT g.event_type, g.bucket_us,
        |         coalesce(a.n_events, 0)::BIGINT AS n_events, a.last_v_micro
        |  FROM grid g LEFT JOIN agg a USING (event_type, bucket_us)),
        |f AS (
        |  SELECT event_type, bucket_us, n_events,
        |    last_value(last_v_micro IGNORE NULLS) OVER w AS v_ffill_micro,
        |    last_value(CASE WHEN n_events > 0 THEN bucket_us END IGNORE NULLS)
        |      OVER w AS src_bucket
        |  FROM j
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, bucket_us, n_events, v_ffill_micro,
        |       (bucket_us - src_bucket) // 600000000 AS staleness_buckets
        |FROM f""".stripMargin,

    // interval form of the two as-of joins: g ∈ [t_prev, t_next) picks the
    // identical bracketing samples; the two-step remainder turns DuckDB's
    // trunc // into floor division, matching Spark's (num − pmod) div den
    "q71_interpolate_grid" ->
      s"""WITH s AS (
        |  SELECT configId, t_us, v_micro,
        |         lead(t_us) OVER (PARTITION BY configId ORDER BY t_us) AS t_next,
        |         lead(v_micro) OVER (PARTITION BY configId ORDER BY t_us) AS v_next
        |  FROM read_parquet('__GEN_DIR__/q71_samples/*.parquet')),
        |g AS (SELECT unnest(range(0, 100000001, 500000))::BIGINT AS grid_us),
        |j AS (
        |  SELECT configId, grid_us, v_micro, t_next,
        |         (v_next - v_micro) * (grid_us - t_us) AS num,
        |         t_next - t_us AS den
        |  FROM g JOIN s ON grid_us >= t_us AND (t_next IS NULL OR grid_us < t_next))
        |SELECT configId, grid_us,
        |  CASE WHEN t_next IS NULL THEN v_micro
        |       ELSE v_micro + (num - ((num % den + den) % den)) // den
        |  END AS v_interp_micro
        |FROM j""".stripMargin,

    // every constant interpolated from graft.ops.Sketch so a p/width change
    // moves both engines in lockstep (the q78/q81 shared-literal pattern)
    "q72_hll_distinct" -> {
      import graft.ops.Sketch.{HllM, HllP, HllMaxRho}
      s"""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |h AS (SELECT source, ${fingerprintSql("tok")} AS h FROM tok),
        |r AS (SELECT source, h & ${HllM - 1} AS bucket, h >> $HllP AS w FROM h),
        |reg AS (SELECT source, bucket,
        |          max(CASE WHEN w = 0 THEN $HllMaxRho
        |                   ELSE bit_count((w & (-w)) - 1) + 1 END) AS max_rho
        |        FROM r GROUP BY source, bucket),
        |e AS (SELECT source, count(*) AS n_buckets_hit,
        |        (sum(CAST(1 AS BIGINT) << (30 - max_rho)) +
        |         ($HllM - count(*)) * ${1L << 30})::BIGINT AS z_scaled
        |      FROM reg GROUP BY source),
        |x AS (SELECT source, count(DISTINCT h) AS n_exact FROM h GROUP BY source)
        |SELECT source, n_buckets_hit, z_scaled,
        |  (${709L * HllM * HllM} * CAST(${1L << 30} AS BIGINT)) // z_scaled AS est_milli,
        |  n_exact
        |FROM e JOIN x USING (source)""".stripMargin
    },

    "q73_chunk_dedup" ->
      s"""WITH d2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN '$Boilerplate ' || text ELSE text END AS text
        |  FROM documents),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d2),
        |ex AS (SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS i FROM t),
        |ch AS (SELECT doc_id,
        |         array_to_string(list_slice(toks, i + 1, least(i + 64, len(toks))), ' ') AS chunk
        |       FROM ex),
        |fp AS (SELECT doc_id, ${fingerprintSql("chunk", "j")} AS chunk_fp FROM ch),
        |pd AS (SELECT chunk_fp, doc_id, count(*) AS n_occ FROM fp GROUP BY 1, 2),
        |fd AS (SELECT chunk_fp, count(*) AS n_docs_with_fp FROM pd GROUP BY 1)
        |SELECT doc_id, sum(n_occ)::BIGINT AS n_chunks,
        |  sum(CASE WHEN n_docs_with_fp > 1 THEN n_occ ELSE 0 END)::BIGINT AS n_dup_chunks,
        |  ((sum(CASE WHEN n_docs_with_fp > 1 THEN n_occ ELSE 0 END) * 1000)
        |    // sum(n_occ))::BIGINT AS dup_permille
        |FROM pd JOIN fd USING (chunk_fp) GROUP BY doc_id""".stripMargin,

    // append-mode inner interval join drains to exactly the batch join
    "q74_stream_interval_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  epoch_us(c.ts) AS click_ts_us, epoch_us(p.ts) AS purchase_ts_us,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
        |FROM events c JOIN events p
        |  ON c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.user_id = c.user_id
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 600000000""".stripMargin,

    "q75_revenue_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  $RevenueSql AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q77_anomaly_3sigma" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    floor(value * 1e6)::BIGINT *
        |      (CASE WHEN event_id % 997 = 0 THEN 10 ELSE 1 END) AS v_micro
        |  FROM events),
        |st AS (
        |  SELECT event_type, count(*) AS group_n,
        |    sum(v_micro::HUGEINT) AS s,
        |    sum(v_micro::HUGEINT * v_micro::HUGEINT) AS q
        |  FROM ev GROUP BY event_type)
        |SELECT event_type, event_id, v_micro, group_n
        |FROM ev JOIN st USING (event_type)
        |WHERE (group_n::HUGEINT * v_micro - s) * (group_n::HUGEINT * v_micro - s)
        |      > 9 * (group_n::HUGEINT * q - s * s)""".stripMargin,

    "q78_cms_heavy_hitters" -> {
      val params = graft.ops.Sketch.CmsParams.zipWithIndex
        .map { case ((a, b), i) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }
        .mkString(", ")
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |h AS (SELECT tok, ${fingerprintSql("tok")} AS h FROM tok),
        |p AS (SELECT * FROM (VALUES $params) p(i, a, b)),
        |cells AS (
        |  SELECT i, ((h * a + b) % 2147483647) % 1024 AS bucket, count(*) AS c
        |  FROM h CROSS JOIN p GROUP BY 1, 2),
        |top AS (SELECT tok, h, count(*) AS exact_cnt FROM h GROUP BY 1, 2
        |        ORDER BY exact_cnt DESC, tok LIMIT 20),
        |pr AS (SELECT t.tok, t.exact_cnt, p.i,
        |         ((t.h * p.a + p.b) % 2147483647) % 1024 AS bucket
        |       FROM top t CROSS JOIN p)
        |SELECT tok, exact_cnt, min(c)::BIGINT AS cms_est
        |FROM pr JOIN cells USING (i, bucket)
        |GROUP BY tok, exact_cnt""".stripMargin
    },

    // dedup of byte-identical duplicate copies ⇒ survivor set == the
    // original events; enrichment is a deterministic function of user_id
    "q80_stream_dedup_enrich" ->
      """WITH prof AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchases
        |  FROM events GROUP BY user_id)
        |SELECT user_id, event_id, event_type, n_purchases,
        |  (CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END) AS is_buyer
        |FROM events JOIN prof USING (user_id)""".stripMargin,

    "q81_bloom_prefilter" -> {
      val hashes = graft.ops.Bloom.Hashes
        .map { case (a, b) => s"(${a}::BIGINT, ${b}::BIGINT)" }.mkString(", ")
      val m = graft.ops.Bloom.BloomBits
      s"""WITH h AS (SELECT * FROM (VALUES $hashes) h(a, b)),
        |bu AS (SELECT DISTINCT l_partkey FROM lineitem
        |       WHERE l_shipdate < TIMESTAMP '1995-03-01 00:00:00'),
        |bits AS (
        |  SELECT DISTINCT ((l_partkey * a + b) % 2147483647) % $m AS bit
        |  FROM bu CROSS JOIN h),
        |pk AS (SELECT DISTINCT l_partkey FROM lineitem),
        |pr AS (SELECT pk.l_partkey, ((l_partkey * a + b) % 2147483647) % $m AS bit
        |       FROM pk CROSS JOIN h),
        |hits AS (
        |  SELECT l_partkey,
        |    sum(CASE WHEN bits.bit IS NOT NULL THEN 1 ELSE 0 END) AS nh
        |  FROM pr LEFT JOIN bits USING (bit) GROUP BY l_partkey)
        |SELECT hits.l_partkey,
        |  (CASE WHEN nh = 2 THEN 1 ELSE 0 END) AS bloom_pass,
        |  (CASE WHEN bu.l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS true_member
        |FROM hits LEFT JOIN bu ON hits.l_partkey = bu.l_partkey""".stripMargin
    },

    // winner = max (ts_us, event_id, src, v_micro) per user, mirrored as a
    // descending row_number on the same tuple
    "q83_profile_upsert" ->
      s"""WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |         floor(value * 1e6)::BIGINT AS v_micro
        |  FROM events),
        |u AS (
        |  SELECT user_id, ts_us, event_id, v_micro, 0 AS src FROM ev
        |  WHERE ts_us < $UpsertMidUs
        |  UNION ALL
        |  SELECT user_id, ts_us, event_id, v_micro, 1 FROM ev
        |  WHERE ts_us >= $UpsertMidUs AND event_type = 'purchase'),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_us DESC, event_id DESC, src DESC, v_micro DESC) AS rn
        |  FROM u)
        |SELECT user_id, ts_us, event_id, v_micro, src FROM r WHERE rn = 1""".stripMargin,

    "q82_label_affinity" ->
      """WITH ex AS (
        |  SELECT label, i::INT AS dim,
        |    floor(embedding[i + 1]::DOUBLE * 1e6)::BIGINT AS v
        |  FROM embeddings, range(0, 64) r(i)),
        |s AS (SELECT label, dim, count(*) AS n, sum(v)::BIGINT AS s_micro
        |      FROM ex GROUP BY 1, 2)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  max(a.n)::BIGINT AS n_a, max(b.n)::BIGINT AS n_b,
        |  sum(a.s_micro::HUGEINT * b.s_micro)::BIGINT AS dot_micro2
        |FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
        |GROUP BY 1, 2""".stripMargin,

    "q79_bpe_pair_counts" ->
      """WITH pr AS (
        |  SELECT unnest(list_transform(
        |    range(0, greatest(len(string_split(text, ' ')) - 1, 0)),
        |    i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 2), ' '))) AS pair
        |  FROM documents)
        |SELECT pair, count(*) AS cnt
        |FROM pr GROUP BY pair ORDER BY cnt DESC, pair LIMIT 50""".stripMargin,

    "q76_hist_quantiles" ->
      """WITH bins AS (
        |  SELECT floor(l_extendedprice * 100 + 0.5)::BIGINT // 1000 AS bin,
        |         count(*) AS cnt
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT bin, cnt,
        |    sum(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |                   AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER () AS total
        |  FROM bins)
        |SELECT max(total)::BIGINT AS n_rows,
        |  min(CASE WHEN cum * 100 >= total * 50 THEN bin * 1000 END)::BIGINT AS p50_cents,
        |  min(CASE WHEN cum * 100 >= total * 90 THEN bin * 1000 END)::BIGINT AS p90_cents,
        |  min(CASE WHEN cum * 100 >= total * 99 THEN bin * 1000 END)::BIGINT AS p99_cents
        |FROM c""".stripMargin,

    // the interleave arithmetic is generated from ZOrder.zSql — ONE shared
    // definition of the bit contract on both engine sides
    "q84_zorder_layout" ->
      s"""WITH m AS (
        |  SELECT l_partkey % 1024 AS px, l_suppkey % 1024 AS sx FROM lineitem),
        |z AS (SELECT (${graft.ops.ZOrder.zSql("px", "sx", 10)}) AS zv, px, sx FROM m)
        |SELECT (zv // 4096)::BIGINT AS z_bucket, count(*)::BIGINT AS cnt,
        |  min(px)::BIGINT AS x_min, max(px)::BIGINT AS x_max,
        |  min(sx)::BIGINT AS y_min, max(sx)::BIGINT AS y_max
        |FROM z GROUP BY 1""".stripMargin,

    "q85_weighted_sample" ->
      s"""WITH w AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS weight,
        |    ((${fingerprintSql("text")} % 1000000) * 1000) AS num
        |  FROM documents)
        |SELECT doc_id, weight, (num // greatest(weight, 1))::BIGINT AS priority
        |FROM w ORDER BY priority, doc_id LIMIT 100""".stripMargin,

    // 3 chained integer-exact iterations; UNION (not ALL) mirrors the
    // Spark side's distinct node set
    "q86_nation_pagerank" -> {
      val iters = (1 to 3).map { i =>
        s"""c$i AS (SELECT e.dst, sum((r.rank_micro * e.w) // o.out_w)::BIGINT AS contrib
           |  FROM raw e JOIN outw o ON e.src = o.src JOIN r${i - 1} r ON r.node = e.src
           |  GROUP BY 1),
           |r$i AS (SELECT n.node,
           |  (150000 + (850 * coalesce(c.contrib, 0)) // 1000)::BIGINT AS rank_micro
           |  FROM nodes n LEFT JOIN c$i c ON c.dst = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH raw AS (
        |  SELECT sn.n_name AS src, cn.n_name AS dst, count(*)::BIGINT AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  GROUP BY 1, 2),
        |outw AS (SELECT src, sum(w)::BIGINT AS out_w FROM raw GROUP BY 1),
        |nodes AS (SELECT src AS node FROM raw UNION SELECT dst FROM raw),
        |r0 AS (SELECT node, 1000000::BIGINT AS rank_micro FROM nodes),
        |$iters
        |SELECT node AS nation, rank_micro FROM r3""".stripMargin
    },

    "q87_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id::BIGINT AS doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |pd AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
        |t AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS total_tf
        |      FROM pd GROUP BY 1),
        |p AS (SELECT term, array_to_string(list_transform(
        |        list_slice(list_sort(list(doc_id)), 1, 20), v -> v::VARCHAR), ',') AS postings
        |      FROM pd GROUP BY 1)
        |SELECT t.term, t.df, t.total_tf, p.postings
        |FROM t JOIN p USING (term) WHERE t.df BETWEEN 5 AND 400""".stripMargin,

    // pair rows generated from the same (name, pair) enumeration order as
    // CovMatrix.pairSums
    "q88_cov_matrix" -> {
      val cols = Seq("qty", "price_d", "disc_pm", "tax_pm")
      val pairs = for { (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1) } yield (a, b)
      val sums = cols.map(c => s"sum($c)::BIGINT AS s_$c, sum($c * $c)::BIGINT AS q_$c") ++
        pairs.map { case (a, b) => s"sum($a * $b)::BIGINT AS p_${a}_$b" }
      val rows = pairs.map { case (a, b) =>
        s"SELECT '$a' AS col_a, '$b' AS col_b, n, s_$a AS s_a, s_$b AS s_b, " +
          s"p_${a}_$b AS s_ab, q_$a AS s_aa, q_$b AS s_bb FROM s"
      }.mkString("\nUNION ALL\n")
      s"""WITH m AS (
        |  SELECT floor(l_quantity + 0.5)::BIGINT AS qty,
        |    floor(l_extendedprice * 100 + 0.5)::BIGINT // 100 AS price_d,
        |    floor(l_discount * 1000 + 0.5)::BIGINT AS disc_pm,
        |    floor(l_tax * 1000 + 0.5)::BIGINT AS tax_pm
        |  FROM lineitem),
        |s AS (SELECT count(*)::BIGINT AS n, ${sums.mkString(", ")} FROM m)
        |$rows""".stripMargin
    },

    // operands clamped non-negative where // appears, so truncating division
    // agrees with Spark's div on every row by construction
    "q89_cusum_changepoint" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    greatest(floor(value * 1e6), 0)::BIGINT AS v_micro
        |  FROM events),
        |mu AS (SELECT sum(v_micro)::BIGINT // count(*) AS mu FROM ev),
        |c AS (SELECT user_id, ts_us, event_id,
        |  sum(v_micro - mu) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cusum
        |  FROM ev, mu),
        |r AS (SELECT user_id, ts_us, cusum,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY abs(cusum) DESC, ts_us, event_id) AS rn,
        |  count(*) OVER (PARTITION BY user_id)::BIGINT AS n,
        |  max(cusum) OVER (PARTITION BY user_id) AS cusum_max,
        |  min(cusum) OVER (PARTITION BY user_id) AS cusum_min
        |  FROM c)
        |SELECT user_id, n, cusum_max, cusum_min, ts_us AS peak_ts,
        |  abs(cusum) AS peak_abs
        |FROM r WHERE rn = 1""".stripMargin,

    "q90_char_classes" ->
      """WITH m AS (
        |  SELECT doc_id, length(text)::BIGINT AS n_chars,
        |    (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))::BIGINT AS n_alpha,
        |    (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS n_digit,
        |    (length(text) - length(regexp_replace(text, ' ', '', 'g')))::BIGINT AS n_space
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, n_chars, n_alpha, n_digit, n_space,
        |  (n_chars - n_alpha - n_digit - n_space) AS n_other,
        |  10000 - (10000 * (n_alpha * n_alpha + n_digit * n_digit
        |    + n_space * n_space
        |    + (n_chars - n_alpha - n_digit - n_space)
        |      * (n_chars - n_alpha - n_digit - n_space)))
        |    // (n_chars * n_chars) AS gini_permyriad
        |FROM m""".stripMargin,

    "q91_vocab_growth" ->
      """WITH mx AS (SELECT max(doc_id)::BIGINT AS max_id FROM documents),
        |b AS (SELECT (doc_id::BIGINT * 10) // (max_id + 1) AS bucket, text
        |      FROM documents, mx),
        |toks AS (SELECT bucket, unnest(string_split(text, ' ')) AS term FROM b),
        |pb AS (SELECT bucket, count(*)::BIGINT AS n_docs FROM b GROUP BY 1),
        |tc AS (SELECT bucket, count(*)::BIGINT AS n_tokens FROM toks GROUP BY 1),
        |nt AS (SELECT bucket, count(*)::BIGINT AS new_terms FROM
        |        (SELECT term, min(bucket) AS bucket FROM toks GROUP BY 1)
        |       GROUP BY 1)
        |SELECT p.bucket, p.n_docs,
        |  coalesce(t.n_tokens, 0)::BIGINT AS n_tokens,
        |  coalesce(n.new_terms, 0)::BIGINT AS new_terms,
        |  sum(coalesce(t.n_tokens, 0)) OVER (ORDER BY p.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens,
        |  sum(coalesce(n.new_terms, 0)) OVER (ORDER BY p.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_vocab
        |FROM pb p LEFT JOIN tc t USING (bucket) LEFT JOIN nt n USING (bucket)""".stripMargin,

    "q92_containment_pairs" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(0, greatest(len(string_split(text, ' ')) - 2, 0)),
        |    i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 3), ' ')))) AS shingle
        |  FROM documents),
        |keep AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 100),
        |k AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
        |sz AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM k GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS inter
        |  FROM k a JOIN k b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b, p.inter, s.n_sh AS n_a,
        |  (p.inter * 1000) // s.n_sh AS contain_milli
        |FROM pairs p JOIN sz s ON s.doc_id = p.id_a
        |WHERE (p.inter * 1000) // s.n_sh >= 800""".stripMargin,

    // component closure identical to q61's oracle; the affine bucket
    // ((c mod p)·a + b mod p) mod 1000 mirrors Sampling.clusterSafeSplit
    "q93_cluster_split" ->
      s"""WITH RECURSIVE $MinhashPairsCtes,
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
         |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
         |bk AS (SELECT doc_id, component,
         |  (((component % 2147483647) * 1373158607 + 239081663) % 2147483647) % 1000
         |    AS split_bucket
         |  FROM comp)
         |SELECT doc_id, component, split_bucket,
         |  (CASE WHEN split_bucket < 900 THEN 'train' ELSE 'test' END) AS split
         |FROM bk""".stripMargin,

    // window frames agree across engines' defaults because (n_tokens desc,
    // doc_id) is a total order — doc_id is unique
    "q94_token_budget" ->
      """WITH toks AS (
        |  SELECT lang AS stratum, doc_id,
        |    len(string_split(text, ' '))::BIGINT AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT stratum, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY stratum
        |      ORDER BY n_tokens DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |  FROM toks)
        |SELECT stratum, count(*)::BIGINT AS n_docs_total,
        |  sum(n_tokens)::BIGINT AS tokens_total,
        |  count(CASE WHEN cum <= 2000 THEN 1 END)::BIGINT AS n_docs_kept,
        |  coalesce(sum(CASE WHEN cum <= 2000 THEN n_tokens ELSE 0 END), 0)::BIGINT
        |    AS tokens_kept
        |FROM c GROUP BY 1""".stripMargin,

    "q95_funnel_conversion" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |f AS (SELECT user_id,
        |        min(CASE WHEN event_type = 'view' THEN ts_us END) AS t_from
        |      FROM ev GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts_us) AS t_conv
        |      FROM ev e JOIN f ON f.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts_us >= f.t_from
        |      GROUP BY 1)
        |SELECT count(*)::BIGINT AS n_users, count(f.t_from)::BIGINT AS n_from,
        |  count(c.t_conv)::BIGINT AS n_converted,
        |  sum(c.t_conv - f.t_from)::BIGINT AS lag_sum_us
        |FROM f LEFT JOIN c USING (user_id)""".stripMargin,

    // census over the exact q16 pair CTEs: a<b<c ordered enumeration counts
    // each triangle once; wedges = Σ d(d−1)/2
    "q96_pair_triangles" ->
      s"""WITH $MinhashPairsCtes,
         |e AS (SELECT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
         |      FROM pairs WHERE id_a <> id_b GROUP BY 1, 2),
         |tri AS (SELECT count(*)::BIGINT AS n_triangles
         |        FROM e e1 JOIN e e2 ON e2.a = e1.b
         |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         |deg AS (SELECT v, count(*)::BIGINT AS d FROM
         |         (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
         |w AS (SELECT count(*)::BIGINT AS n_vertices,
         |        sum((d * (d - 1)) // 2)::BIGINT AS n_wedges FROM deg),
         |ec AS (SELECT count(*)::BIGINT AS n_edges FROM e)
         |SELECT w.n_vertices, ec.n_edges, w.n_wedges, tri.n_triangles,
         |  (3000 * tri.n_triangles) // greatest(w.n_wedges, 1) AS closure_permille
         |FROM w, ec, tri""".stripMargin,

    // struct-max = lexicographic (q desc, id desc) — mirrored by the
    // row_number ordering; fingerprint collisions (if any) merge groups
    // identically on both sides
    "q97_dedup_keep_best" ->
      s"""WITH g AS (
        |  SELECT ${fingerprintSql("text")} AS group_fp, doc_id,
        |    len(string_split(text, ' '))::BIGINT AS q
        |  FROM documents),
        |r AS (
        |  SELECT group_fp, doc_id, q,
        |    row_number() OVER (PARTITION BY group_fp
        |      ORDER BY q DESC, doc_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY group_fp)::BIGINT AS group_size
        |  FROM g)
        |SELECT group_fp, doc_id, q AS quality, group_size
        |FROM r WHERE rn = 1""".stripMargin,

    "q98_stratified_sample_topk" ->
      s"""WITH w AS (
        |  SELECT lang AS stratum, doc_id,
        |    len(string_split(text, ' '))::BIGINT AS weight,
        |    ((${fingerprintSql("text")} % 1000000) * 1000) AS num
        |  FROM documents),
        |p AS (
        |  SELECT stratum, doc_id, weight,
        |    (num // greatest(weight, 1))::BIGINT AS priority
        |  FROM w),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY stratum
        |    ORDER BY priority, doc_id) AS rn
        |  FROM p)
        |SELECT stratum, doc_id, weight, priority FROM r WHERE rn <= 20""".stripMargin,

    // lower median = min{v : 2·cum ≥ n} on both sides — no interpolation,
    // no percentile_cont double contract
    "q99_median_mad" ->
      """WITH ev AS (
        |  SELECT event_type, floor(value * 1e6)::BIGINT AS v FROM events),
        |h AS (SELECT event_type, v, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2),
        |m AS (SELECT event_type, v,
        |        sum(c) OVER (PARTITION BY event_type ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        sum(c) OVER (PARTITION BY event_type) AS n
        |      FROM h),
        |med AS (SELECT event_type, min(v) AS median FROM m
        |        WHERE cum * 2 >= n GROUP BY 1),
        |dh AS (SELECT e.event_type, abs(e.v - med.median) AS dv,
        |         count(*)::BIGINT AS c
        |       FROM ev e JOIN med USING (event_type) GROUP BY 1, 2),
        |dm AS (SELECT event_type, dv,
        |         sum(c) OVER (PARTITION BY event_type ORDER BY dv
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(c) OVER (PARTITION BY event_type) AS n
        |       FROM dh),
        |mad AS (SELECT event_type, min(dv) AS mad FROM dm
        |        WHERE cum * 2 >= n GROUP BY 1)
        |SELECT e.event_type, count(*)::BIGINT AS n, max(med.median) AS median,
        |  max(mad.mad) AS mad,
        |  count(CASE WHEN abs(e.v - med.median) > mad.mad * 5 THEN 1 END)::BIGINT
        |    AS n_outliers
        |FROM ev e JOIN med USING (event_type) JOIN mad USING (event_type)
        |GROUP BY 1""".stripMargin,

    // every fragment is the same shared constant its stage-query uses
    // (q97 keep-best, q64/q66 gates, q61 closure, q93 affine split) — the
    // composition cannot drift from the stages it composes
    "q100_curation_pipeline" ->
      s"""WITH RECURSIVE $MinhashPairsCtes,
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
         |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
         |base AS (
         |  SELECT doc_id, text, $LangPredCaseSql AS lang_pred,
         |    len(string_split(text, ' '))::BIGINT AS n_tokens,
         |    length(text) AS n_chars,
         |    len(shs) AS n_sh, len(list_distinct(shs)) AS n_dsh,
         |    ${fingerprintSql("text")} AS fp
         |  FROM (SELECT doc_id, text, list_transform(
         |      range(0, greatest(len(string_split(text, ' ')) - 2, 0)),
         |      i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 3), ' ')) AS shs
         |    FROM documents)),
         |best AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (PARTITION BY fp
         |      ORDER BY n_tokens DESC, doc_id DESC) AS rn
         |    FROM base) WHERE rn = 1),
         |filt AS (
         |  SELECT b.doc_id, b.n_tokens FROM base b
         |  JOIN best USING (doc_id)
         |  WHERE b.lang_pred = 'en' AND ${Curation.LenOkSql}
         |    AND ${Curation.NotRepetitiveSql}),
         |lab AS (
         |  SELECT f.doc_id, f.n_tokens,
         |    coalesce(c.component, f.doc_id) AS component
         |  FROM filt f LEFT JOIN comp c ON c.doc_id = f.doc_id),
         |spl AS (SELECT *,
         |  (((component % 2147483647) * 1373158607 + 239081663) % 2147483647) % 1000
         |    AS b FROM lab)
         |SELECT (CASE WHEN b < 900 THEN 'train' ELSE 'test' END) AS split,
         |  count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
         |  count(DISTINCT component)::BIGINT AS n_components
         |FROM spl GROUP BY 1""".stripMargin,

    "q101_rank_suite" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, floor(value * 1e6)::BIGINT AS v_micro
        |  FROM events),
        |r AS (
        |  SELECT event_type, event_id, v_micro,
        |    rank() OVER (PARTITION BY event_type ORDER BY v_micro) AS rnk,
        |    dense_rank() OVER (PARTITION BY event_type ORDER BY v_micro) AS drnk,
        |    ntile(4) OVER (PARTITION BY event_type
        |      ORDER BY v_micro, event_id) AS tile4,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY v_micro, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev)
        |SELECT event_type, event_id, v_micro,
        |  rnk::BIGINT AS rnk, drnk::BIGINT AS drnk, tile4::INT AS tile4,
        |  (((rnk - 1) * 1000000) // greatest(n - 1, 1))::BIGINT AS pr_ppm,
        |  ((rn * 1000000) // n)::BIGINT AS cd_ppm
        |FROM r WHERE rn <= 100""".stripMargin,

    // anti-join spelled as NOT EXISTS; keys are non-null by construction
    "q107_integrity_audit" ->
      """WITH lo AS (SELECT l_orderkey::BIGINT AS k FROM lineitem
        |           UNION ALL SELECT -1 UNION ALL SELECT -2)
        |SELECT 'lineitem_orders' AS check_name, count(*)::BIGINT AS n_violations
        |FROM lo WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = lo.k)
        |UNION ALL
        |SELECT 'lineitem_part', count(*)::BIGINT FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        |UNION ALL
        |SELECT 'lineitem_supplier', count(*)::BIGINT FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
        |UNION ALL
        |SELECT 'orders_customer', count(*)::BIGINT FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'customer_nation', count(*)::BIGINT FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)""".stripMargin,

    "q108_column_profile" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id,
        |    floor(value * 1e6)::BIGINT AS v_micro, epoch_us(ts) AS ts_us
        |  FROM events),
        |s AS (SELECT count(*)::BIGINT AS n_rows,
        |  count(user_id)::BIGINT AS nn_user_id,
        |  count(DISTINCT user_id)::BIGINT AS nd_user_id,
        |  count(event_type)::BIGINT AS nn_event_type,
        |  count(DISTINCT event_type)::BIGINT AS nd_event_type,
        |  count(event_id)::BIGINT AS nn_event_id,
        |  count(DISTINCT event_id)::BIGINT AS nd_event_id,
        |  count(v_micro)::BIGINT AS nn_v_micro,
        |  count(DISTINCT v_micro)::BIGINT AS nd_v_micro,
        |  count(ts_us)::BIGINT AS nn_ts_us,
        |  count(DISTINCT ts_us)::BIGINT AS nd_ts_us
        |  FROM ev)
        |SELECT 'user_id' AS col_name, n_rows, n_rows - nn_user_id AS n_nulls,
        |  nd_user_id AS n_distinct FROM s
        |UNION ALL SELECT 'event_type', n_rows, n_rows - nn_event_type, nd_event_type FROM s
        |UNION ALL SELECT 'event_id', n_rows, n_rows - nn_event_id, nd_event_id FROM s
        |UNION ALL SELECT 'v_micro', n_rows, n_rows - nn_v_micro, nd_v_micro FROM s
        |UNION ALL SELECT 'ts_us', n_rows, n_rows - nn_ts_us, nd_ts_us FROM s""".stripMargin,

    // ONE direct aggregation over everything: if the Spark-side partial
    // merge drifted from plain recompute, this hash would catch it
    "q106_incremental_rollup" ->
      """SELECT epoch_us(ts) // 86400000000 AS day, event_type,
        |  count(*)::BIGINT AS n,
        |  sum(floor(value * 1e6)::BIGINT)::BIGINT AS sum_micro
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q105_asof_tolerance" ->
      """WITH j AS (
        |  SELECT p.user_id, p.event_id, p.ts_us,
        |    v.view_id AS m_view, v.ts_us AS m_ts
        |  FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |        WHERE event_type = 'purchase') p
        |  ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS ts_us,
        |                         min(event_id) AS view_id
        |                  FROM events WHERE event_type = 'view'
        |                  GROUP BY user_id, epoch_us(ts)) v
        |  ON p.user_id = v.user_id AND p.ts_us >= v.ts_us)
        |SELECT user_id, event_id, ts_us,
        |  (CASE WHEN ts_us - m_ts <= 600000000 THEN m_view END) AS asof_view_id,
        |  (CASE WHEN ts_us - m_ts <= 600000000 THEN m_ts END) AS asof_ts
        |FROM j""".stripMargin,

    // islands formulation: a session breaks when the gap REACHES the
    // timeout (Spark merges only strictly-overlapping [ts, ts+gap) windows,
    // so diff ≥ gap starts a new session); end = last ts + gap
    "q104_session_window" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    floor(value * 1e6)::BIGINT AS vm
        |  FROM events),
        |o AS (
        |  SELECT user_id, ts_us, vm,
        |    (CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
        |            IS NULL
        |          OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |            ORDER BY ts_us) >= 1800000000
        |          THEN 1 ELSE 0 END) AS brk
        |  FROM ev),
        |g AS (
        |  SELECT user_id, ts_us, vm,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o)
        |SELECT user_id, min(ts_us) AS session_start_us,
        |  max(ts_us) + 1800000000 AS session_end_us,
        |  count(*)::BIGINT AS n_events, sum(vm)::BIGINT AS sum_v_micro
        |FROM g GROUP BY user_id, sid""".stripMargin,

    // every event joins its ceil(width/slide) = 5 slide offsets; the k-th
    // window start is (⌊ts/slide⌋ − k)·slide, and ts < start + width holds
    // for all five because width = 5·slide. Shared by q109 (multibatch —
    // complete mode makes the decomposition invisible)
    "q103_stream_sliding" -> SlidingWindowOracleSql,
    "q109_stream_sliding_multibatch" -> SlidingWindowOracleSql,

    "q111_revenue_share" ->
      """WITH pn AS (
        |  SELECT r_name, n_name,
        |    sum((floor(l_extendedprice * 100 + 0.5) *
        |         (100 - floor(l_discount * 100 + 0.5)))::BIGINT)::BIGINT AS rev_units
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |t AS (SELECT r_name, n_name, rev_units,
        |        sum(rev_units) OVER (PARTITION BY r_name)::BIGINT AS region_units
        |      FROM pn)
        |SELECT r_name, n_name, rev_units,
        |  ((rev_units::HUGEINT * 1000000) // region_units)::BIGINT AS share_ppm
        |FROM t""".stripMargin,

    // ::VARCHAR month key works for DATE and string shipdates alike
    "q112_monthly_delta" ->
      """WITH m AS (
        |  SELECT substr(l_shipdate::VARCHAR, 1, 7) AS month,
        |    sum((floor(l_extendedprice * 100 + 0.5) *
        |         (100 - floor(l_discount * 100 + 0.5)))::BIGINT)::BIGINT AS rev_units
        |  FROM lineitem GROUP BY 1)
        |SELECT month, rev_units,
        |  lag(rev_units) OVER (ORDER BY month) AS prev_units,
        |  rev_units - lag(rev_units) OVER (ORDER BY month) AS delta_units
        |FROM m""".stripMargin,

    "q110_winsorized_mean" ->
      """WITH ev AS (
        |  SELECT event_type, floor(value * 1e6)::BIGINT AS v FROM events),
        |bins AS (
        |  SELECT event_type, v // 10000000 AS bin, count(*) AS cnt
        |  FROM ev GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS total
        |  FROM bins),
        |b AS (
        |  SELECT event_type,
        |    min(CASE WHEN cum * 100 >= total THEN bin * 10000000 END)::BIGINT AS lo,
        |    min(CASE WHEN cum * 100 >= total * 99
        |        THEN (bin + 1) * 10000000 - 1 END)::BIGINT AS hi
        |  FROM c GROUP BY 1)
        |SELECT e.event_type, count(*)::BIGINT AS n,
        |  sum(greatest(least(e.v, b.hi), b.lo))::BIGINT AS sum_clipped_micro,
        |  (sum(greatest(least(e.v, b.hi), b.lo)) // count(*))::BIGINT
        |    AS winsorized_mean_micro
        |FROM ev e JOIN b USING (event_type) GROUP BY 1""".stripMargin,

    "q102_group_quantiles" ->
      """WITH ev AS (
        |  SELECT event_type, floor(value * 1e6)::BIGINT AS v_micro FROM events),
        |bins AS (
        |  SELECT event_type, v_micro // 10000000 AS bin, count(*) AS cnt
        |  FROM ev GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS total
        |  FROM bins)
        |SELECT event_type, max(total)::BIGINT AS n_rows,
        |  min(CASE WHEN cum * 100 >= total * 50 THEN bin * 10000000 END)::BIGINT
        |    AS p50_micro,
        |  min(CASE WHEN cum * 100 >= total * 90 THEN bin * 10000000 END)::BIGINT
        |    AS p90_micro,
        |  min(CASE WHEN cum * 100 >= total * 99 THEN bin * 10000000 END)::BIGINT
        |    AS p99_micro
        |FROM c GROUP BY 1""".stripMargin,

    "q113_retention_cohorts" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS midx
        |  FROM orders),
        |c AS (
        |  SELECT o_custkey, midx,
        |    min(midx) OVER (PARTITION BY o_custkey) AS cohort_idx
        |  FROM o)
        |SELECT cohort_idx, midx - cohort_idx AS month_offset,
        |  count(DISTINCT o_custkey)::BIGINT AS active_customers,
        |  count(*)::BIGINT AS n_orders
        |FROM c GROUP BY 1, 2""".stripMargin,

    "q114_rfm_segments" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |    max(epoch_us(o_orderdate) // 86400000000) AS last_day,
        |    count(*)::BIGINT AS freq,
        |    sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS mon_cents
        |  FROM orders GROUP BY 1),
        |a AS (SELECT max(last_day) AS anchor_day FROM pc),
        |m AS (
        |  SELECT o_custkey, freq, mon_cents,
        |    (a.anchor_day - pc.last_day) AS r_bin, freq AS f_bin,
        |    mon_cents // 100000 AS m_bin
        |  FROM pc CROSS JOIN a),
        |melted AS (
        |  SELECT 'r' AS metric, r_bin AS bin FROM m
        |  UNION ALL SELECT 'f', f_bin FROM m
        |  UNION ALL SELECT 'm', m_bin FROM m),
        |bins AS (SELECT metric, bin, count(*) AS cnt FROM melted GROUP BY 1, 2),
        |c AS (
        |  SELECT metric, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY metric ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY metric) AS total
        |  FROM bins),
        |e AS (
        |  SELECT metric,
        |    min(CASE WHEN cum * 4 >= total THEN bin END) AS e1,
        |    min(CASE WHEN cum * 4 >= total * 2 THEN bin END) AS e2,
        |    min(CASE WHEN cum * 4 >= total * 3 THEN bin END) AS e3
        |  FROM c GROUP BY 1),
        |er AS (
        |  SELECT
        |    min(CASE WHEN metric = 'r' THEN e1 END) AS r1,
        |    min(CASE WHEN metric = 'r' THEN e2 END) AS r2,
        |    min(CASE WHEN metric = 'r' THEN e3 END) AS r3,
        |    min(CASE WHEN metric = 'f' THEN e1 END) AS f1,
        |    min(CASE WHEN metric = 'f' THEN e2 END) AS f2,
        |    min(CASE WHEN metric = 'f' THEN e3 END) AS f3,
        |    min(CASE WHEN metric = 'm' THEN e1 END) AS m1,
        |    min(CASE WHEN metric = 'm' THEN e2 END) AS m2,
        |    min(CASE WHEN metric = 'm' THEN e3 END) AS m3
        |  FROM e),
        |t AS (
        |  SELECT o_custkey, mon_cents,
        |    5 - (1 + (r_bin > r1)::BIGINT + (r_bin > r2)::BIGINT
        |           + (r_bin > r3)::BIGINT) AS r_tile,
        |    1 + (f_bin > f1)::BIGINT + (f_bin > f2)::BIGINT
        |      + (f_bin > f3)::BIGINT AS f_tile,
        |    1 + (m_bin > m1)::BIGINT + (m_bin > m2)::BIGINT
        |      + (m_bin > m3)::BIGINT AS m_tile
        |  FROM m CROSS JOIN er)
        |SELECT r_tile::BIGINT AS r_tile, f_tile::BIGINT AS f_tile,
        |  m_tile::BIGINT AS m_tile, count(*)::BIGINT AS n_customers,
        |  sum(mon_cents)::BIGINT AS monetary_cents_total
        |FROM t GROUP BY 1, 2, 3""".stripMargin,

    "q115_order_streaks" ->
      """WITH om AS (
        |  SELECT DISTINCT o_custkey,
        |    (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS midx
        |  FROM orders),
        |i AS (
        |  SELECT o_custkey,
        |    midx - row_number() OVER (PARTITION BY o_custkey ORDER BY midx)
        |      AS island
        |  FROM om),
        |st AS (
        |  SELECT o_custkey, island, count(*)::BIGINT AS streak_len
        |  FROM i GROUP BY 1, 2)
        |SELECT streak_len, count(*)::BIGINT AS n_streaks,
        |  count(DISTINCT o_custkey)::BIGINT AS n_customers
        |FROM st GROUP BY 1""".stripMargin,

    "q116_markov_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, ts FROM events),
        |tr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM e),
        |c AS (
        |  SELECT from_type, to_type, count(*)::BIGINT AS cnt
        |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, cnt,
        |  ((cnt * 1000000) // sum(cnt) OVER (PARTITION BY from_type))::BIGINT
        |    AS p_ppm
        |FROM c""".stripMargin,

    "q117_state_runs" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, ts FROM events),
        |o AS (
        |  SELECT user_id, event_type,
        |    (CASE WHEN lag(event_type) OVER w IS NULL
        |          OR lag(event_type) OVER w <> event_type
        |          THEN 1 ELSE 0 END) AS brk,
        |    ts, event_id
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (
        |  SELECT user_id, event_type,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        |  FROM o),
        |runs AS (
        |  SELECT user_id, run_id, event_type, count(*)::BIGINT AS run_len
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT event_type, run_len, count(*)::BIGINT AS n_runs
        |FROM runs GROUP BY 1, 2""".stripMargin,

    "q118_time_weighted_avg" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    floor(value * 1e6)::BIGINT AS vm
        |  FROM events),
        |g AS (
        |  SELECT user_id, vm,
        |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |      - ts_us AS gap_us
        |  FROM e)
        |SELECT user_id, count(*)::BIGINT AS n_intervals,
        |  sum(gap_us)::BIGINT AS span_us,
        |  (sum(vm::HUGEINT * gap_us) // sum(gap_us)::HUGEINT)::BIGINT
        |    AS twa_micro
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY 1 HAVING sum(gap_us) > 0""".stripMargin,

    "q119_name_edit_pairs" ->
      """WITH p AS (
        |  SELECT p_partkey, p_name, split_part(p_name, ' ', 1) AS t1
        |  FROM part),
        |pairs AS (
        |  SELECT levenshtein(a.p_name, b.p_name)::BIGINT AS dist
        |  FROM p a JOIN p b
        |    ON a.t1 = b.t1 AND a.p_partkey < b.p_partkey)
        |SELECT dist, count(*)::BIGINT AS n_pairs
        |FROM pairs WHERE dist <= 8 GROUP BY 1""".stripMargin,

    "q120_basket_brand_pairs" ->
      """WITH ob AS (
        |  SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |tot AS (SELECT count(DISTINCT l_orderkey) AS total_orders FROM ob),
        |pairs AS (
        |  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
        |    count(*)::BIGINT AS n_orders
        |  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
        |   AND a.p_brand < b.p_brand
        |  GROUP BY 1, 2)
        |SELECT brand_a, brand_b, n_orders,
        |  ((n_orders * 1000000) // total_orders)::BIGINT AS support_ppm
        |FROM pairs CROSS JOIN tot""".stripMargin,

    "q121_oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |dfk AS (
        |  SELECT token, count(*)::BIGINT AS df
        |  FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY 1),
        |vocab AS (
        |  SELECT token FROM dfk
        |  QUALIFY row_number() OVER (ORDER BY df DESC, token) <= 1000),
        |pd AS (
        |  SELECT t.doc_id, t.lang, count(*)::BIGINT AS n_tokens,
        |    sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
        |  FROM tok t LEFT JOIN vocab v ON t.token = v.token
        |  GROUP BY 1, 2)
        |SELECT lang, ((n_oov * 1000000) // n_tokens) // 100000 AS oov_decile,
        |  count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS total_tokens
        |FROM pd GROUP BY 1, 2""".stripMargin,

    "q122_ewma_last16" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    floor(value * 1e6)::BIGINT AS vm
        |  FROM events),
        |r AS (
        |  SELECT user_id, vm,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM e QUALIFY rn <= 16)
        |SELECT user_id, count(*)::BIGINT AS n_used,
        |  max(CASE WHEN rn = 1 THEN vm END)::BIGINT AS last_micro,
        |  (sum(vm * (1::BIGINT << (16 - rn)::INT)) //
        |   sum(1::BIGINT << (16 - rn)::INT))::BIGINT AS ewma_micro
        |FROM r GROUP BY 1""".stripMargin,

    "q123_session_hour_grid" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |o AS (
        |  SELECT user_id, ts_us,
        |    (CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
        |            IS NULL
        |          OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |            ORDER BY ts_us) >= 1800000000
        |          THEN 1 ELSE 0 END) AS brk
        |  FROM ev),
        |g AS (
        |  SELECT user_id, ts_us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o),
        |sess AS (
        |  SELECT user_id, min(ts_us) AS start_us,
        |    max(ts_us) + 1800000000 AS end_us
        |  FROM g GROUP BY user_id, sid),
        |hrs AS (
        |  SELECT user_id, unnest(generate_series(start_us // 3600000000,
        |    (end_us - 1) // 3600000000)) AS hour_idx
        |  FROM sess)
        |SELECT hour_idx % 24 AS hour_of_day, count(*)::BIGINT AS n_session_hours,
        |  count(DISTINCT user_id)::BIGINT AS n_users
        |FROM hrs GROUP BY 1""".stripMargin,

    "q124_weekday_profile" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS ts_us,
        |    floor(value * 1e6)::BIGINT AS vm
        |  FROM events)
        |SELECT event_type, ((ts_us // 86400000000) + 4) % 7 AS dow,
        |  (ts_us // 3600000000) % 24 AS hod,
        |  count(*)::BIGINT AS n, sum(vm)::BIGINT AS sum_micro,
        |  (sum(vm) // count(*))::BIGINT AS mean_micro
        |FROM e GROUP BY 1, 2, 3""".stripMargin,

    "q125_scd2_versions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |o AS (
        |  SELECT user_id, event_type, ts_us, event_id,
        |    (CASE WHEN lag(event_type) OVER w IS NULL
        |          OR lag(event_type) OVER w <> event_type
        |          THEN 1 ELSE 0 END) AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |r AS (
        |  SELECT user_id, event_type,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id,
        |    ts_us
        |  FROM o),
        |runs AS (
        |  SELECT user_id, run_id, event_type, min(ts_us) AS valid_from
        |  FROM r GROUP BY 1, 2, 3),
        |v AS (
        |  SELECT user_id, event_type, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
        |      AS valid_to
        |  FROM runs)
        |SELECT user_id, count(*)::BIGINT AS n_versions,
        |  max(CASE WHEN valid_from <= 1705363200000000
        |        AND (valid_to IS NULL OR valid_to > 1705363200000000)
        |      THEN event_type END) AS state_at_t,
        |  max(CASE WHEN valid_from <= 1705363200000000
        |        AND (valid_to IS NULL OR valid_to > 1705363200000000)
        |      THEN valid_from END)::BIGINT AS t_version_start_us
        |FROM v GROUP BY 1""".stripMargin,

    "q126_path_trigrams" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, ts FROM events),
        |p AS (
        |  SELECT event_type AS t1,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (
        |  SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*)::BIGINT AS cnt
        |  FROM p WHERE t2 IS NOT NULL AND t3 IS NOT NULL GROUP BY 1)
        |SELECT path, cnt FROM c
        |QUALIFY row_number() OVER (ORDER BY cnt DESC, path) <= 10""".stripMargin,

    "q127_token_lift" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |dfk AS (SELECT token, count(*)::BIGINT AS df FROM tok GROUP BY 1),
        |vocab AS (
        |  SELECT token, df FROM dfk
        |  QUALIFY row_number() OVER (ORDER BY df DESC, token) <= 100),
        |tv AS (
        |  SELECT t.doc_id, t.token, v.df
        |  FROM tok t JOIN vocab v ON t.token = v.token),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |pairs AS (
        |  SELECT a.token AS token_a, a.df AS df_a,
        |    b.token AS token_b, b.df AS df_b, count(*)::BIGINT AS cnt
        |  FROM tv a JOIN tv b ON a.doc_id = b.doc_id AND a.token < b.token
        |  GROUP BY 1, 2, 3, 4)
        |SELECT token_a, token_b, cnt,
        |  ((cnt::HUGEINT * n_docs * 1000) // (df_a * df_b))::BIGINT
        |    AS lift_milli
        |FROM pairs CROSS JOIN n""".stripMargin,

    // dims are 0-based on the Spark side; embedding[i] is 1-based here
    "q128_vector_quantize" ->
      """WITH el AS (
        |  SELECT vec_id, (i - 1)::BIGINT AS dim,
        |    floor(embedding[i] * 1e6)::BIGINT AS xm
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i)),
        |b AS (
        |  SELECT dim, min(xm) AS minm, max(xm) AS maxm FROM el GROUP BY 1),
        |q AS (
        |  SELECT el.dim, el.xm, b.minm, b.maxm,
        |    ((el.xm - b.minm) * 255) // greatest(b.maxm - b.minm, 1) AS code
        |  FROM el JOIN b ON el.dim = b.dim),
        |r AS (
        |  SELECT dim, minm, maxm,
        |    abs(xm - (minm + (code * (maxm - minm)) // 255)) AS err
        |  FROM q)
        |SELECT dim, count(*)::BIGINT AS n, min(minm)::BIGINT AS min_micro,
        |  max(maxm)::BIGINT AS max_micro,
        |  sum(err)::BIGINT AS sum_abs_err_micro,
        |  max(err)::BIGINT AS max_abs_err_micro,
        |  (sum(err) // count(*))::BIGINT AS mean_abs_err_micro
        |FROM r GROUP BY 1""".stripMargin,

    "q129_compaction_plan" ->
      """WITH m AS (
        |  SELECT substr(l_shipdate::VARCHAR, 1, 7) AS month,
        |    count(*)::BIGINT AS n_rows
        |  FROM lineitem GROUP BY 1)
        |SELECT month, n_rows, n_rows * 120 AS est_bytes,
        |  (n_rows * 120 + 134217727) // 134217728 AS target_files,
        |  (n_rows + ((n_rows * 120 + 134217727) // 134217728) - 1)
        |    // ((n_rows * 120 + 134217727) // 134217728) AS rows_per_file
        |FROM m""".stripMargin,

    "q130_band_join_views" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |p AS (
        |  SELECT user_id, event_id AS purchase_id, ts_us AS p_us
        |  FROM ev WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id, ts_us AS v_us
        |  FROM ev WHERE event_type = 'view')
        |SELECT p.purchase_id, p.user_id, p.p_us,
        |  count(v.v_us)::BIGINT AS n_views_near
        |FROM p LEFT JOIN v
        |  ON p.user_id = v.user_id AND abs(v.v_us - p.p_us) <= 600000000
        |GROUP BY 1, 2, 3""".stripMargin,

    "q131_segment_priority_lift" ->
      """WITH cells AS (
        |  SELECT c_mktsegment, o_orderpriority, count(*)::BIGINT AS obs
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT c_mktsegment, o_orderpriority, obs,
        |    sum(obs) OVER (PARTITION BY c_mktsegment) AS r_tot,
        |    sum(obs) OVER (PARTITION BY o_orderpriority) AS c_tot,
        |    sum(obs) OVER () AS t_tot
        |  FROM cells)
        |SELECT c_mktsegment, o_orderpriority, obs,
        |  ((r_tot::HUGEINT * c_tot * 1000) // t_tot)::BIGINT AS expected_milli,
        |  ((obs::HUGEINT * t_tot * 1000) // (r_tot * c_tot))::BIGINT
        |    AS lift_milli
        |FROM m""".stripMargin,

    "q132_calendar_coverage" ->
      """WITH o AS (
        |  SELECT epoch_us(o_orderdate) // 86400000000 AS day FROM orders),
        |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
        |grid AS (
        |  SELECT unnest(generate_series(d0, d1)) AS day FROM span),
        |pd AS (SELECT day, count(*)::BIGINT AS n_orders FROM o GROUP BY 1)
        |SELECT g.day, (g.day + 4) % 7 AS dow,
        |  coalesce(pd.n_orders, 0)::BIGINT AS n_orders,
        |  (CASE WHEN pd.n_orders IS NULL THEN 1 ELSE 0 END)::BIGINT AS is_gap
        |FROM grid g LEFT JOIN pd ON g.day = pd.day""".stripMargin,

    "q133_revenue_index" ->
      """WITH m AS (
        |  SELECT substr(l_shipdate::VARCHAR, 1, 7) AS month,
        |    sum((floor(l_extendedprice * 100 + 0.5) *
        |         (100 - floor(l_discount * 100 + 0.5)))::BIGINT)::BIGINT
        |      AS rev_units
        |  FROM lineitem GROUP BY 1)
        |SELECT month, rev_units,
        |  ((rev_units::HUGEINT * 10000) //
        |   first_value(rev_units) OVER (ORDER BY month
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
        |    AS index_bp
        |FROM m""".stripMargin,

    "q134_pareto_frontier" ->
      """WITH p AS (
        |  SELECT p_partkey, p_size::BIGINT AS size,
        |    floor(p_retailprice * 100 + 0.5)::BIGINT AS price_cents
        |  FROM part),
        |bs AS (SELECT size, min(price_cents) AS size_min FROM p GROUP BY 1),
        |f AS (
        |  SELECT size, size_min,
        |    min(size_min) OVER (ORDER BY size DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS larger_min
        |  FROM bs)
        |SELECT p.p_partkey, p.size, p.price_cents
        |FROM p JOIN f ON p.size = f.size AND p.price_cents = f.size_min
        |WHERE f.larger_min IS NULL OR f.size_min < f.larger_min""".stripMargin,

    "q135_novelty_vs_history" ->
      s"""WITH docs AS (
        |  SELECT doc_id, lang, ${fingerprintSql("text")} AS fp
        |  FROM documents),
        |hist AS (SELECT DISTINCT fp FROM docs WHERE doc_id % 2 = 0),
        |inc AS (SELECT lang, fp FROM docs WHERE doc_id % 2 = 1),
        |nv AS (
        |  SELECT lang, count(*)::BIGINT AS n_novel
        |  FROM inc WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.fp = inc.fp)
        |  GROUP BY 1),
        |tot AS (SELECT lang, count(*)::BIGINT AS n_incoming FROM inc GROUP BY 1)
        |SELECT t.lang, t.n_incoming,
        |  coalesce(nv.n_novel, 0)::BIGINT AS n_novel,
        |  ((coalesce(nv.n_novel, 0) * 1000000) // t.n_incoming)::BIGINT
        |    AS novelty_ppm
        |FROM tot t LEFT JOIN nv ON t.lang = nv.lang""".stripMargin,

    "q136_supplier_hhi" ->
      """WITH ps AS (
        |  SELECT n_name, s_suppkey,
        |    sum((floor(l_extendedprice * 100 + 0.5) *
        |         (100 - floor(l_discount * 100 + 0.5)))::BIGINT)::BIGINT
        |      AS rev_units
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |sh AS (
        |  SELECT n_name,
        |    ((rev_units::HUGEINT * 1000000) //
        |     sum(rev_units) OVER (PARTITION BY n_name))::BIGINT AS share_ppm
        |  FROM ps)
        |SELECT n_name, count(*)::BIGINT AS n_suppliers,
        |  (sum(share_ppm * share_ppm) // 1000000)::BIGINT AS hhi_ppm
        |FROM sh GROUP BY 1""".stripMargin,

    // watermark replica of the MEASURED Spark 4.1 semantics (probed with
    // the 2- and 3-batch variants): wm = (max event-time ms − 600000)·1000
    // µs, collected over ALL rows of batches so far; a batch-3 late row is
    // dropped on arrival iff its window end ≤ the wm set after batch 2
    // (rows merging into sealed-but-unevicted state still count); the
    // final table emits windows with end ≤ the final wm. Split boundary is
    // the FIXED epoch constant (odd ids ≤/> 2024-01-16), never a float
    // percentile
    "q137_stream_late_drop" ->
      """WITH e AS (
        |  SELECT event_id, event_type, epoch_us(ts) AS ts_us,
        |    floor(value * 1e6)::BIGINT AS vm
        |  FROM events),
        |wm2 AS (
        |  SELECT ((max(ts_us) // 1000) - 600000) * 1000 AS wm
        |  FROM e WHERE event_id % 2 = 0 OR ts_us > 1705363200000000),
        |wmf AS (
        |  SELECT ((max(ts_us) // 1000) - 600000) * 1000 AS wm FROM e),
        |kept AS (
        |  SELECT * FROM e
        |  WHERE event_id % 2 = 0 OR ts_us > 1705363200000000
        |  UNION ALL
        |  SELECT e.* FROM e, wm2
        |  WHERE event_id % 2 = 1 AND ts_us <= 1705363200000000
        |    AND ((ts_us // 300000000) + 1) * 300000000 > wm2.wm),
        |agg AS (
        |  SELECT (ts_us // 300000000) * 300000000 AS window_start_us,
        |    event_type, count(*) AS n_events,
        |    sum(vm)::BIGINT AS sum_value_micro
        |  FROM kept GROUP BY 1, 2)
        |SELECT a.window_start_us, a.event_type, a.n_events, a.sum_value_micro
        |FROM agg a, wmf WHERE a.window_start_us + 300000000 <= wmf.wm""".stripMargin,

    "q138_weighted_median" ->
      """WITH li AS (
        |  SELECT l_returnflag, floor(l_quantity + 0.5)::BIGINT AS wgt,
        |    (floor(l_extendedprice * 100 + 0.5) *
        |     (100 - floor(l_discount * 100 + 0.5)))::BIGINT AS rev
        |  FROM lineitem),
        |bins AS (
        |  SELECT l_returnflag, rev // 10000000 AS bin, sum(wgt) AS w
        |  FROM li GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, bin, w,
        |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS total
        |  FROM bins)
        |SELECT l_returnflag, max(total)::BIGINT AS total_weight,
        |  min(CASE WHEN cum * 2 >= total THEN bin * 10000000 END)::BIGINT
        |    AS wmedian_units_lo
        |FROM c GROUP BY 1""".stripMargin,

    // the q104 islands formulation, reduced to duration bands
    "q139_session_duration_hist" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |o AS (
        |  SELECT user_id, ts_us,
        |    (CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
        |            IS NULL
        |          OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |            ORDER BY ts_us) >= 1800000000
        |          THEN 1 ELSE 0 END) AS brk
        |  FROM ev),
        |g AS (
        |  SELECT user_id, ts_us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o),
        |sess AS (
        |  SELECT count(*)::BIGINT AS n_events,
        |    (max(ts_us) + 1800000000 - min(ts_us)) AS dur_us
        |  FROM g GROUP BY user_id, sid)
        |SELECT dur_us // 300000000 AS dur_bucket_5m,
        |  count(*)::BIGINT AS n_sessions, sum(n_events)::BIGINT AS sum_events,
        |  max(dur_us)::BIGINT AS max_dur_us
        |FROM sess GROUP BY 1""".stripMargin,

    "q140_benford_audit" ->
      """WITH d AS (
        |  SELECT substr(floor(o_totalprice * 100 + 0.5)::BIGINT::VARCHAR, 1, 1)
        |    ::BIGINT AS digit
        |  FROM orders),
        |c AS (
        |  SELECT digit, count(*)::BIGINT AS n,
        |    sum(count(*)) OVER () AS total
        |  FROM d GROUP BY 1),
        |e(digit, benford_ppm) AS (VALUES
        |  (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
        |  (6, 66947), (7, 57992), (8, 51153), (9, 45757))
        |SELECT c.digit, c.n, ((c.n * 1000000) // c.total)::BIGINT
        |    AS observed_ppm,
        |  e.benford_ppm::BIGINT AS benford_ppm,
        |  ((c.n * 1000000) // c.total - e.benford_ppm)::BIGINT
        |    AS deviation_ppm
        |FROM c JOIN e ON c.digit = e.digit""".stripMargin,

    "q141_attribution_credit" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |p AS (
        |  SELECT user_id, event_id AS purchase_id, ts_us AS p_us
        |  FROM ev WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts_us AS v_us FROM ev
        |      WHERE event_type = 'view'),
        |pairs AS (
        |  SELECT p.purchase_id, v.v_us
        |  FROM p JOIN v ON p.user_id = v.user_id
        |   AND abs(v.v_us - p.p_us) <= 600000000),
        |cr AS (
        |  SELECT (v_us // 3600000000) % 24 AS view_hod,
        |    1000000 // count(*) OVER (PARTITION BY purchase_id)
        |      AS credit_ppm
        |  FROM pairs)
        |SELECT view_hod, count(*)::BIGINT AS n_touches,
        |  sum(credit_ppm)::BIGINT AS credit_ppm_total
        |FROM cr GROUP BY 1""".stripMargin,

    "q142_rolling_7day_revenue" ->
      """WITH daily AS (
        |  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
        |    sum((floor(l_extendedprice * 100 + 0.5) *
        |         (100 - floor(l_discount * 100 + 0.5)))::BIGINT)::BIGINT
        |      AS rev_units
        |  FROM lineitem GROUP BY 1)
        |SELECT day, rev_units,
        |  sum(rev_units) OVER (ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)::BIGINT
        |    AS rev_7d_units,
        |  count(*) OVER (ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)::BIGINT
        |    AS n_days_in_window
        |FROM daily""".stripMargin,

    "q143_distinct_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
        |  coalesce(n_name, 'ALL') AS nation,
        |  count(DISTINCT o_custkey)::BIGINT AS n_active_customers,
        |  count(*)::BIGINT AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "q144_fulfillment_lag" ->
      """SELECT o_orderpriority,
        |  (epoch_us(l_shipdate) // 86400000000)
        |    - (epoch_us(o_orderdate) // 86400000000) AS lag_days,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2""".stripMargin,

    "q145_lorenz_curve" ->
      """WITH ov AS (
        |  SELECT floor(o_totalprice * 100 + 0.5)::BIGINT AS v FROM orders),
        |bins AS (
        |  SELECT v // 100000 AS bin, count(*)::BIGINT AS n,
        |    sum(v)::BIGINT AS sv
        |  FROM ov GROUP BY 1),
        |c AS (
        |  SELECT bin, n, sv,
        |    sum(n) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        |    sum(sv) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_v,
        |    sum(n) OVER () AS tot_n, sum(sv) OVER () AS tot_v
        |  FROM bins)
        |SELECT bin * 100000 AS bin_lo_cents, n,
        |  ((cum_n * 1000000) // tot_n)::BIGINT AS cum_orders_ppm,
        |  ((cum_v::HUGEINT * 1000000) // tot_v)::BIGINT AS cum_revenue_ppm
        |FROM c""".stripMargin,

    "q146_lsh_recall_audit" ->
      s"""WITH $MinhashPairsCtes,
        |dfq AS (SELECT shingle FROM sh GROUP BY shingle
        |        HAVING count(*) <= 1000),
        |ex AS (SELECT s.doc_id, s.shingle FROM sh s JOIN dfq USING (shingle)),
        |nn AS (SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id),
        |truth AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  JOIN nn na ON na.doc_id = a.doc_id
        |  JOIN nn nb ON nb.doc_id = b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |  HAVING round(count(*)::DOUBLE /
        |    (any_value(na.n_sh) + any_value(nb.n_sh) - count(*)), 6) >= 0.8),
        |lp AS (SELECT id_a, id_b FROM pairs),
        |m AS (SELECT count(*)::BIGINT AS n_truth FROM truth),
        |l AS (SELECT count(*)::BIGINT AS n_lsh FROM lp),
        |ht AS (SELECT count(*)::BIGINT AS n_hit
        |       FROM truth t JOIN lp USING (id_a, id_b))
        |SELECT m.n_truth, l.n_lsh, ht.n_hit,
        |  ((ht.n_hit * 1000000) // m.n_truth)::BIGINT AS recall_ppm,
        |  ((ht.n_hit * 1000000) // l.n_lsh)::BIGINT AS candidate_precision_ppm
        |FROM m, l, ht""".stripMargin,

    "q147_ann_recall_audit" ->
      s"""WITH exact AS ($CosineTopkOracleSql),
        |approx AS ($IvfTopkOracleSql),
        |m AS (SELECT count(*)::BIGINT AS n_exact FROM exact),
        |l AS (SELECT count(*)::BIGINT AS n_approx FROM approx),
        |ht AS (SELECT count(*)::BIGINT AS n_hit
        |       FROM exact e JOIN approx a
        |         ON e.query_id = a.query_id AND e.cand_id = a.cand_id)
        |SELECT m.n_exact, l.n_approx, ht.n_hit,
        |  ((ht.n_hit * 1000000) // m.n_exact)::BIGINT AS recall_ppm
        |FROM m, l, ht""".stripMargin,

    "q148_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS midx,
        |    floor(o_totalprice * 100 + 0.5)::BIGINT AS v
        |  FROM orders),
        |c AS (
        |  SELECT o_custkey, midx, v,
        |    min(midx) OVER (PARTITION BY o_custkey) AS cohort_idx
        |  FROM o),
        |cells AS (
        |  SELECT cohort_idx, midx - cohort_idx AS month_offset,
        |    count(DISTINCT o_custkey)::BIGINT AS active_customers,
        |    sum(v)::BIGINT AS rev_cents
        |  FROM c GROUP BY 1, 2),
        |x AS (
        |  SELECT cohort_idx, month_offset, active_customers, rev_cents,
        |    sum(rev_cents) OVER (PARTITION BY cohort_idx ORDER BY month_offset
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev_cents,
        |    max(CASE WHEN month_offset = 0 THEN active_customers END)
        |      OVER (PARTITION BY cohort_idx) AS cohort_size
        |  FROM cells)
        |SELECT cohort_idx, month_offset, active_customers,
        |  ((active_customers * 1000000) // cohort_size)::BIGINT
        |    AS retention_ppm,
        |  rev_cents, cum_rev_cents::BIGINT AS cum_rev_cents
        |FROM x""".stripMargin,

    "q149_temporal_state_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |o AS (
        |  SELECT user_id, event_type, ts_us, event_id,
        |    (CASE WHEN lag(event_type) OVER w IS NULL
        |          OR lag(event_type) OVER w <> event_type
        |          THEN 1 ELSE 0 END) AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |r AS (
        |  SELECT user_id, event_type,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id,
        |    ts_us
        |  FROM o),
        |runs AS (
        |  SELECT user_id, run_id, event_type, min(ts_us) AS valid_from
        |  FROM r GROUP BY 1, 2, 3),
        |v AS (
        |  SELECT user_id AS v_user, event_type AS state, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
        |      AS valid_to
        |  FROM runs),
        |p AS (
        |  SELECT user_id, event_id, ts_us FROM e
        |  WHERE event_type = 'purchase')
        |SELECT coalesce(v.state, 'none') AS state_before,
        |  count(*)::BIGINT AS n_purchases,
        |  count(DISTINCT p.user_id)::BIGINT AS n_users
        |FROM p LEFT JOIN v ON p.user_id = v.v_user
        |  AND v.valid_from <= p.ts_us - 1
        |  AND (v.valid_to IS NULL OR v.valid_to > p.ts_us - 1)
        |GROUP BY 1""".stripMargin,

    "q150_acf" ->
      s"""WITH s AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT unnest(generate_series(1, 6))::BIGINT AS lag_h),
        |p AS (
        |  SELECT a.event_type, l.lag_h, a.cnt AS x, b.cnt AS y
        |  FROM s a CROSS JOIN l JOIN s b
        |    ON b.event_type = a.event_type AND b.h = a.h + l.lag_h),
        |${pairCorrSql("event_type, lag_h")}""".stripMargin,

    "q151_cross_correlation" ->
      s"""WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT unnest(generate_series(-6, 6))::BIGINT AS lag_h),
        |p AS (
        |  SELECT l.lag_h, a.cnt AS x, b.cnt AS y
        |  FROM (SELECT h, cnt FROM hourly WHERE event_type = 'click') a
        |  CROSS JOIN l
        |  JOIN (SELECT h, cnt FROM hourly WHERE event_type = 'purchase') b
        |    ON b.h = a.h + l.lag_h),
        |${pairCorrSql("lag_h")}""".stripMargin,

    "q152_seasonal_decomposition" ->
      """WITH dd AS (
        |  SELECT epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS d,
        |    count(*)::BIGINT AS cnt
        |  FROM orders GROUP BY 1),
        |b AS (SELECT min(d) AS d0, max(d) AS d1 FROM dd),
        |grid AS (SELECT unnest(generate_series(d0, d1)) AS d FROM b),
        |dense AS (
        |  SELECT g.d, coalesce(dd.cnt, 0)::BIGINT AS cnt
        |  FROM grid g LEFT JOIN dd ON dd.d = g.d),
        |tr AS (
        |  SELECT d, cnt, count(*) OVER w AS win_n,
        |    (sum(cnt) OVER w * 1000) // 7 AS trend_milli
        |  FROM dense
        |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dev AS (
        |  SELECT d, cnt, cnt * 1000 - trend_milli AS dev_milli
        |  FROM tr WHERE win_n = 7)
        |SELECT (d + 4) % 7 AS dow, count(*)::BIGINT AS n_days,
        |  (sum(cnt) * 1000 // count(*))::BIGINT AS mean_cnt_milli,
        |  sum(dev_milli)::BIGINT AS sum_dev_milli,
        |  floor(sum(dev_milli)::DOUBLE / count(*)::DOUBLE + 0.5)::BIGINT
        |    AS seasonal_milli
        |FROM dev GROUP BY 1""".stripMargin,

    "q153_theil_sen_trend" ->
      """WITH mo AS (
        |  SELECT n_name,
        |    (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS m,
        |    sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS rev_cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT a.n_name,
        |    floor(1000.0 * (b.rev_cents - a.rev_cents)::DOUBLE
        |      / (b.m - a.m)::DOUBLE + 0.5)::BIGINT AS slope_milli
        |  FROM mo a JOIN mo b ON b.n_name = a.n_name AND b.m > a.m),
        |r AS (
        |  SELECT n_name, slope_milli,
        |    row_number() OVER (PARTITION BY n_name ORDER BY slope_milli)
        |      AS rn,
        |    count(*) OVER (PARTITION BY n_name) AS n_pairs
        |  FROM p)
        |SELECT n_name, n_pairs::BIGINT AS n_pairs,
        |  slope_milli AS ts_slope_milli
        |FROM r WHERE rn = (n_pairs + 1) // 2""".stripMargin,

    "q154_distribution_drift" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) AS ts_us, floor(value * 1e6)::BIGINT AS vm
        |  FROM events),
        |b AS (
        |  SELECT min(ts_us) AS t0, max(ts_us) AS t1,
        |    min(vm) AS v0, max(vm) AS v1 FROM ev),
        |binned AS (
        |  SELECT CASE WHEN ts_us < (t0 + t1) // 2 THEN 1 ELSE 2 END AS half,
        |    least(19, ((vm - v0) * 20) // (v1 - v0 + 1)) AS bin
        |  FROM ev CROSS JOIN b),
        |cells AS (
        |  SELECT bin,
        |    sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN half = 2 THEN 1 ELSE 0 END)::BIGINT AS n2
        |  FROM binned GROUP BY 1),
        |sh AS (
        |  SELECT bin, n1, n2,
        |    ((n1 * 1000000) // sum(n1) OVER ())::BIGINT AS share1_ppm,
        |    ((n2 * 1000000) // sum(n2) OVER ())::BIGINT AS share2_ppm
        |  FROM cells)
        |SELECT bin, n1, n2, share1_ppm, share2_ppm,
        |  abs(share1_ppm - share2_ppm) AS abs_diff_ppm,
        |  (sum(abs(share1_ppm - share2_ppm)) OVER () // 2)::BIGINT
        |    AS tvd_ppm
        |FROM sh""".stripMargin,

    "q155_rrf_fusion" ->
      s"""WITH ca AS (
        |  SELECT query_id, cand_id, rank FROM (
        |    ${cosineTopkOracleSql(20)})),
        |db AS (
        |  SELECT query_id, cand_id, rank FROM (
        |    ${dotTopkOracleSql(20)})),
        |f AS (
        |  SELECT query_id, cand_id,
        |    ca.rank AS rank_cos, db.rank AS rank_dot,
        |    coalesce(1000000 // (60 + ca.rank), 0)
        |      + coalesce(1000000 // (60 + db.rank), 0) AS rrf_micro
        |  FROM ca FULL JOIN db USING (query_id, cand_id))
        |SELECT query_id, cand_id, rank_cos, rank_dot, rrf_micro,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_micro DESC, cand_id) AS fused_rank
        |FROM f
        |QUALIFY fused_rank <= 5""".stripMargin,

    "q156_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END)::BIGINT AS conv
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END)::BIGINT
        |      AS conv_a,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END)::BIGINT
        |      AS conv_b
        |  FROM u),
        |c AS (
        |  SELECT n_a, conv_a, n_b, conv_b,
        |    conv_a::HUGEINT * (n_b - conv_b)
        |      - (n_a - conv_a)::HUGEINT * conv_b AS det,
        |    n_a::HUGEINT * n_b AS mrg1,
        |    (conv_a + conv_b)::HUGEINT
        |      * ((n_a - conv_a) + (n_b - conv_b)) AS mrg2
        |  FROM a)
        |SELECT n_a, conv_a, (conv_a * 1000000) // n_a AS rate_a_ppm,
        |  n_b, conv_b, (conv_b * 1000000) // n_b AS rate_b_ppm,
        |  (conv_a * 1000000) // n_a - (conv_b * 1000000) // n_b AS diff_ppm,
        |  (CASE WHEN mrg1 = 0 OR mrg2 = 0 THEN NULL ELSE
        |    floor((n_a + n_b)::DOUBLE * det::DOUBLE * det::DOUBLE
        |      / (mrg1::DOUBLE * mrg2::DOUBLE) * 1000 + 0.5)
        |    END)::BIGINT AS chi2_milli
        |FROM c""".stripMargin,

    "q157_vocab_coverage" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tc AS (SELECT tok, count(*)::BIGINT AS cnt FROM t GROUP BY 1),
        |tot AS (
        |  SELECT sum(cnt)::BIGINT AS total_cnt, count(*)::BIGINT AS n_vocab
        |  FROM tc),
        |top AS (
        |  SELECT tok, cnt, row_number() OVER (ORDER BY cnt DESC, tok)
        |    AS rank
        |  FROM tc ORDER BY cnt DESC, tok LIMIT 3000),
        |r AS (
        |  SELECT rank::BIGINT AS rank,
        |    sum(cnt) OVER (ORDER BY rank
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |      AS cum_cnt
        |  FROM top),
        |ks AS (SELECT unnest([100, 300, 1000, 3000])::BIGINT AS k)
        |SELECT k, r.rank AS vocab_size, cum_cnt AS covered_tokens,
        |  total_cnt AS total_tokens,
        |  ((cum_cnt * 1000000) // total_cnt)::BIGINT AS coverage_ppm
        |FROM ks, tot, r WHERE r.rank = least(k, n_vocab)""".stripMargin,

    "q158_kappa_agreement" ->
      s"""WITH pred AS (
        |  SELECT lang, $LangPredCaseSql AS lang_pred FROM documents),
        |cells AS (
        |  SELECT lang, lang_pred, count(*)::BIGINT AS n
        |  FROM pred GROUP BY 1, 2),
        |r AS (SELECT lang AS cls, sum(n)::BIGINT AS rn FROM cells
        |  GROUP BY 1),
        |c AS (SELECT lang_pred AS cls, sum(n)::BIGINT AS cn FROM cells
        |  GROUP BY 1),
        |m AS (
        |  SELECT coalesce(rn, 0) AS rn, coalesce(cn, 0) AS cn
        |  FROM r FULL JOIN c USING (cls)),
        |sv AS (SELECT sum(rn::HUGEINT * cn) AS s FROM m),
        |t AS (
        |  SELECT sum(n)::BIGINT AS n_docs,
        |    sum(CASE WHEN lang = lang_pred THEN n ELSE 0 END)::BIGINT
        |      AS n_agree
        |  FROM cells)
        |SELECT n_docs, n_agree,
        |  (n_agree * 1000000) // n_docs AS po_ppm,
        |  floor(s::DOUBLE / (n_docs::DOUBLE * n_docs::DOUBLE) * 1e6
        |    + 0.5)::BIGINT AS pe_ppm,
        |  (CASE WHEN (n_docs::HUGEINT * n_docs - s) = 0 THEN NULL ELSE
        |    floor((n_agree::HUGEINT * n_docs - s)::DOUBLE
        |      / (n_docs::HUGEINT * n_docs - s)::DOUBLE * 1000 + 0.5)
        |    END)::BIGINT AS kappa_milli
        |FROM t, sv""".stripMargin,

    "q159_gain_curve" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
        |      AS score,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END)::BIGINT AS purch
        |  FROM events GROUP BY 1),
        |bs AS (
        |  SELECT score, count(*)::BIGINT AS n_users,
        |    sum(purch)::BIGINT AS n_purch
        |  FROM pu GROUP BY 1),
        |cm AS (
        |  SELECT score, n_users, n_purch,
        |    sum(n_users) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW)::BIGINT AS cum_users,
        |    sum(n_purch) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW)::BIGINT AS cum_purch,
        |    sum(n_users) OVER ()::BIGINT AS tu,
        |    sum(n_purch) OVER ()::BIGINT AS tp
        |  FROM bs)
        |SELECT score, n_users, n_purch, cum_users, cum_purch,
        |  (cum_users * 1000000) // tu AS user_share_ppm,
        |  (CASE WHEN tp = 0 THEN NULL ELSE (cum_purch * 1000000) // tp
        |    END)::BIGINT AS capture_ppm
        |FROM cm""".stripMargin,

    "q160_exact_auc" ->
      """WITH sc AS (
        |  SELECT (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS pos,
        |    len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the','a','of','and','to','in','is','on','for',
        |        'with')))::BIGINT AS score
        |  FROM documents),
        |cells AS (
        |  SELECT score, sum(pos)::BIGINT AS n_pos,
        |    sum(1 - pos)::BIGINT AS n_neg
        |  FROM sc GROUP BY 1),
        |cb AS (
        |  SELECT score, n_pos, n_neg,
        |    coalesce(sum(n_neg) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_neg_below
        |  FROM cells),
        |u AS (
        |  SELECT sum(n_pos)::BIGINT AS np, sum(n_neg)::BIGINT AS nn,
        |    sum(n_pos::HUGEINT * (2::HUGEINT * cum_neg_below + n_neg)) AS u2
        |  FROM cb)
        |SELECT np AS n_pos, nn AS n_neg,
        |  (CASE WHEN np = 0 OR nn = 0 THEN NULL ELSE
        |    floor(u2::DOUBLE / (2.0 * np::DOUBLE * nn::DOUBLE) * 1e6 + 0.5)
        |    END)::BIGINT AS auc_ppm
        |FROM u""".stripMargin,

    "q161_k_anonymity" ->
      """WITH qi AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    floor(c_acctbal / 1000.0)::BIGINT AS bal_band
        |  FROM customer),
        |sz AS (
        |  SELECT c_nationkey, c_mktsegment, bal_band, count(*)::BIGINT
        |    AS gsz
        |  FROM qi GROUP BY 1, 2, 3),
        |h AS (SELECT gsz, count(*)::BIGINT AS n_groups FROM sz GROUP BY 1),
        |t AS (
        |  SELECT sum(gsz * n_groups)::BIGINT AS n_rows,
        |    sum(n_groups)::BIGINT AS n_groups_tot
        |  FROM h),
        |ks AS (SELECT unnest([2, 5, 10])::BIGINT AS k)
        |SELECT k, n_groups_tot, n_rows,
        |  coalesce(sum(CASE WHEN gsz < k THEN n_groups END), 0)::BIGINT
        |    AS small_groups,
        |  coalesce(sum(CASE WHEN gsz < k THEN gsz * n_groups END),
        |    0)::BIGINT AS small_rows,
        |  ((coalesce(sum(CASE WHEN gsz < k THEN gsz * n_groups END), 0)
        |    * 1000000) // n_rows)::BIGINT AS risk_ppm
        |FROM ks CROSS JOIN h CROSS JOIN t
        |GROUP BY k, n_groups_tot, n_rows""".stripMargin,

    "q162_poisson_bootstrap" ->
      """WITH o AS (
        |  SELECT o_orderkey, floor(o_totalprice * 100 + 0.5)::BIGINT AS v
        |  FROM orders),
        |bs AS (SELECT unnest(generate_series(1, 20))::BIGINT AS b),
        |r AS (
        |  SELECT b,
        |    ((o_orderkey % 2147483647) * 48271 + b * 16807) % 2147483647
        |      AS h, v
        |  FROM o CROSS JOIN bs),
        |m AS (
        |  SELECT b, v,
        |    CASE WHEN h % 10000 < 3679 THEN 0 WHEN h % 10000 < 7358 THEN 1
        |      WHEN h % 10000 < 9197 THEN 2 WHEN h % 10000 < 9810 THEN 3
        |      WHEN h % 10000 < 9963 THEN 4 ELSE 5 END AS mult
        |  FROM r),
        |g AS (
        |  SELECT b, sum(mult)::BIGINT AS n_eff,
        |    sum(mult::HUGEINT * v)::BIGINT AS total_cents
        |  FROM m GROUP BY 1)
        |SELECT b, n_eff, total_cents,
        |  (CASE WHEN n_eff = 0 THEN NULL ELSE
        |    floor(total_cents::DOUBLE / n_eff::DOUBLE * 10.0 + 0.5)
        |    END)::BIGINT AS mean_milli
        |FROM g""".stripMargin,

    "q163_stream_update_mode" ->
      """WITH e AS (
        |  SELECT (CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END) AS bb,
        |    (epoch_us(ts) // 300000000) * 300000000 AS window_start_us,
        |    event_type, floor(value * 1e6)::BIGINT AS vm
        |  FROM events),
        |bs AS (SELECT unnest([1, 2]) AS i),
        |em AS (
        |  SELECT i, window_start_us, event_type,
        |    count(*)::BIGINT AS n_events, sum(vm)::BIGINT AS sum_value_micro
        |  FROM bs JOIN e ON e.bb <= bs.i
        |  GROUP BY 1, 2, 3
        |  HAVING max(CASE WHEN e.bb = bs.i THEN 1 ELSE 0 END) = 1)
        |SELECT window_start_us, event_type, n_events, sum_value_micro
        |FROM em""".stripMargin,

    // same integer BM25 formula term by term; the div chain floors at the
    // same three points on both engines
    "q189_bm25_topk" -> bm25OracleSql(5),
    "q227_bm25_stopword_cap" -> bm25OracleSql(5, maxDfPermille = 760),

    "q228_events_ts_pushdown" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  sum(epoch_us(ts) - 1704844800000000)::BIGINT AS sum_off_us,
        |  min(epoch_us(ts))::BIGINT AS min_ts_us,
        |  max(epoch_us(ts))::BIGINT AS max_ts_us,
        |  sum(floor(value * 1e6)::BIGINT)::BIGINT AS sum_v_micro
        |FROM events
        |WHERE epoch_us(ts) >= 1704844800000000
        |  AND epoch_us(ts) < 1705708800000000
        |GROUP BY 1""".stripMargin,

    // q14's cosine fragment on the q189 probe set + the BM25 fragment,
    // fused with q155's integer RRF — all three contracts already pinned
    "q190_hybrid_retrieval" ->
      s"""WITH de AS (
        |  SELECT query_id, cand_id, rank FROM (
        |    ${cosineTopkOracleSql(20, "q.vec_id % 50 = 0")})),
        |lx AS (
        |  SELECT query_id, cand_id, rank FROM (
        |    ${bm25OracleSql(20)})),
        |f AS (
        |  SELECT query_id, cand_id,
        |    de.rank AS rank_dense, lx.rank AS rank_lex,
        |    coalesce(1000000 // (60 + de.rank), 0)
        |      + coalesce(1000000 // (60 + lx.rank), 0) AS rrf_micro
        |  FROM de FULL JOIN lx USING (query_id, cand_id))
        |SELECT query_id, cand_id, rank_dense, rank_lex, rrf_micro,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_micro DESC, cand_id) AS fused_rank
        |FROM f
        |QUALIFY fused_rank <= 5""".stripMargin,

    "q186_l_diversity" ->
      """WITH qi AS (
        |  SELECT c_nationkey, floor(c_acctbal / 1000.0)::BIGINT AS bal_band,
        |         c_mktsegment
        |  FROM customer),
        |g AS (
        |  SELECT c_nationkey, bal_band, count(*)::BIGINT AS gsz,
        |         count(DISTINCT c_mktsegment)::BIGINT AS l
        |  FROM qi GROUP BY 1, 2),
        |h AS (SELECT l, count(*)::BIGINT AS n_groups,
        |        sum(gsz)::BIGINT AS n_rows_l FROM g GROUP BY 1),
        |t AS (SELECT sum(n_rows_l)::BIGINT AS n_rows,
        |        sum(n_groups)::BIGINT AS n_groups_tot FROM h),
        |ls AS (SELECT unnest([2, 3, 5])::BIGINT AS l_req)
        |SELECT l_req, n_groups_tot, n_rows,
        |  coalesce(sum(CASE WHEN l < l_req THEN n_groups END), 0)::BIGINT
        |    AS weak_groups,
        |  coalesce(sum(CASE WHEN l < l_req THEN n_rows_l END), 0)::BIGINT
        |    AS weak_rows,
        |  ((coalesce(sum(CASE WHEN l < l_req THEN n_rows_l END), 0)
        |    * 1000000) // n_rows)::BIGINT AS risk_ppm
        |FROM ls CROSS JOIN h CROSS JOIN t
        |GROUP BY 1, 2, 3""".stripMargin,

    "q187_hll_rollup" -> {
      import graft.ops.Sketch.{HllM, HllP, HllMaxRho}
      s"""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |h AS (SELECT source, ${fingerprintSql("tok")} AS h FROM tok),
        |r AS (SELECT source, h & ${HllM - 1} AS bucket, h >> $HllP AS w FROM h),
        |reg AS (SELECT source, bucket,
        |          max(CASE WHEN w = 0 THEN $HllMaxRho
        |                   ELSE bit_count((w & (-w)) - 1) + 1 END) AS max_rho
        |        FROM r GROUP BY source, bucket),
        |m AS (SELECT bucket, max(max_rho) AS max_rho FROM reg GROUP BY bucket),
        |e AS (SELECT count(*) AS n_buckets_hit,
        |        (sum(CAST(1 AS BIGINT) << (30 - max_rho)) +
        |         ($HllM - count(*)) * ${1L << 30})::BIGINT AS z_scaled
        |      FROM m),
        |gx AS (SELECT count(DISTINCT h)::BIGINT AS n_exact_global,
        |         count(DISTINCT source)::BIGINT AS n_sources FROM h),
        |sx AS (SELECT sum(ne)::BIGINT AS sum_source_exact FROM (
        |         SELECT source, count(DISTINCT h) AS ne FROM h GROUP BY 1))
        |SELECT n_sources, n_buckets_hit, z_scaled,
        |  (${709L * HllM * HllM} * CAST(${1L << 30} AS BIGINT)) // z_scaled
        |    AS est_milli,
        |  n_exact_global, sum_source_exact
        |FROM e CROSS JOIN gx CROSS JOIN sx""".stripMargin
    },

    "q188_token_surprisal" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |c AS (SELECT tok, count(*)::BIGINT AS cnt FROM tok GROUP BY 1),
        |t AS (SELECT sum(cnt)::BIGINT AS n_total FROM c),
        |sc AS (
        |  SELECT doc_id,
        |    (length(bin(n_total)) - length(bin(cnt)))::BIGINT AS sbits
        |  FROM tok JOIN c USING (tok) CROSS JOIN t)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  sum(sbits)::BIGINT AS surprisal_bits,
        |  ((sum(sbits) * 1000) // count(*))::BIGINT AS mean_surprisal_milli
        |FROM sc GROUP BY doc_id""".stripMargin,

    // utf8proc vs java.text.Normalizer, byte-identical or hash-fail: same
    // decorated forms (chr(233) / 'e'||chr(769)), DuckDB's nfc_normalize
    // and strip_accents against Spark's NFC / NFD+mark-strip
    "q185_unicode_dedup_keys" ->
      s"""WITH b AS (SELECT doc_id, substr(text, 1, 120) AS b FROM documents),
        |dec AS (
        |  SELECT doc_id, CASE WHEN doc_id % 2 = 0
        |    THEN replace(b, 'e', chr(233))
        |    ELSE replace(b, 'e', 'e' || chr(769)) END AS decorated
        |  FROM b),
        |n AS (
        |  SELECT doc_id, length(decorated)::BIGINT AS n_cp_raw,
        |    length(nfc_normalize(decorated))::BIGINT AS n_cp_nfc,
        |    strip_accents(decorated) AS stripped
        |  FROM dec)
        |SELECT doc_id, n_cp_raw, n_cp_nfc,
        |  length(stripped)::BIGINT AS n_cp_stripped,
        |  ${fingerprintSql("stripped")} AS key_fp,
        |  count(*) OVER (PARTITION BY stripped)::BIGINT AS n_sharing_key
        |FROM n""".stripMargin,

    // mirror: same id<8 centroids, same argmax assignment (q65's rounded-
    // cosine + cid tie-break), same priority rule, pairs only within cluster
    "q184_semdedup" ->
      """WITH c AS (
        |  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |scored AS (
        |  SELECT e.vec_id, c.cid, e.v,
        |    round(list_dot_product(e.v, c.cv) /
        |      (sqrt(list_dot_product(e.v, e.v)) *
        |       sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos_r
        |  FROM e, c),
        |assigned AS (
        |  SELECT vec_id, cid AS cluster, cos_r AS ccos, v FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cos_r DESC, cid) AS rk FROM scored)
        |  WHERE rk = 1),
        |dropped AS (
        |  SELECT DISTINCT b.cluster, b.vec_id FROM assigned a
        |  JOIN assigned b ON a.cluster = b.cluster
        |   AND (a.ccos < b.ccos OR (a.ccos = b.ccos AND a.vec_id < b.vec_id))
        |  WHERE round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) *
        |       sqrt(list_dot_product(b.v, b.v))), 6) >= 0.35),
        |dstats AS (
        |  SELECT cluster, count(*)::BIGINT AS n_dropped,
        |    sum(vec_id)::BIGINT AS dropped_id_sum
        |  FROM dropped GROUP BY 1)
        |SELECT t.cluster, count(*)::BIGINT AS n_docs,
        |  coalesce(max(d.n_dropped), 0)::BIGINT AS n_dropped,
        |  (count(*) - coalesce(max(d.n_dropped), 0))::BIGINT AS n_kept,
        |  coalesce(max(d.dropped_id_sum), 0)::BIGINT AS dropped_id_sum
        |FROM assigned t LEFT JOIN dstats d ON t.cluster = d.cluster
        |GROUP BY t.cluster""".stripMargin,

    // q229: the q184 contract with derived k, one Lloyd mean update
    // (exact integer sums → sum::DOUBLE / n / 1e6, the identical float
    // path both engines take), re-assignment, and the 8-per-cluster
    // dropper cap
    "q229_semdedup_auto" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |k AS (SELECT ((count(*) + 31) // 32)::BIGINT AS k FROM e),
        |seed AS (SELECT vec_id AS cid, v AS cv FROM e
        |         WHERE vec_id < (SELECT k FROM k)),
        |s0 AS (
        |  SELECT e.vec_id, e.v, s.cid,
        |    round(list_dot_product(e.v, s.cv) /
        |      (sqrt(list_dot_product(e.v, e.v)) *
        |       sqrt(list_dot_product(s.cv, s.cv))), 6) AS cos_r
        |  FROM e, seed s),
        |a0 AS (
        |  SELECT vec_id, v, cid AS cluster FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cos_r DESC, cid) AS rk FROM s0)
        |  WHERE rk = 1),
        |ux AS (
        |  SELECT cluster, unnest(list_transform(v, (x, i) ->
        |    struct_pack(i := i, fx := floor(x * 1e6)::BIGINT))) AS u
        |  FROM a0),
        |upd AS (
        |  SELECT cluster, (u.i - 1)::BIGINT AS dim,
        |    sum(u.fx)::DOUBLE / count(*) / 1e6 AS cvd
        |  FROM ux GROUP BY 1, 2),
        |cents AS (
        |  SELECT cluster AS cid, list(cvd ORDER BY dim) AS cv
        |  FROM upd GROUP BY 1),
        |s1 AS (
        |  SELECT e.vec_id, e.v, c.cid,
        |    round(list_dot_product(e.v, c.cv) /
        |      (sqrt(list_dot_product(e.v, e.v)) *
        |       sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos_r
        |  FROM e, cents c),
        |asg AS (
        |  SELECT vec_id, v, cid AS cluster, cos_r AS ccos FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cos_r DESC, cid) AS rk FROM s1)
        |  WHERE rk = 1),
        |ex AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, cluster, row_number() OVER (PARTITION BY cluster
        |      ORDER BY ccos ASC, vec_id ASC) AS rk FROM asg)
        |  WHERE rk <= 8),
        |dropped AS (
        |  SELECT DISTINCT b.cluster, b.vec_id
        |  FROM asg a
        |  JOIN ex x ON a.vec_id = x.vec_id AND a.cluster = x.cluster
        |  JOIN asg b ON a.cluster = b.cluster
        |   AND (a.ccos < b.ccos OR (a.ccos = b.ccos AND a.vec_id < b.vec_id))
        |  WHERE round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) *
        |       sqrt(list_dot_product(b.v, b.v))), 6) >= 0.35),
        |dstats AS (
        |  SELECT cluster, count(*)::BIGINT AS n_dropped,
        |    sum(vec_id)::BIGINT AS dropped_id_sum
        |  FROM dropped GROUP BY 1)
        |SELECT t.cluster, count(*)::BIGINT AS n_docs,
        |  coalesce(max(d.n_dropped), 0)::BIGINT AS n_dropped,
        |  (count(*) - coalesce(max(d.n_dropped), 0))::BIGINT AS n_kept,
        |  coalesce(max(d.dropped_id_sum), 0)::BIGINT AS dropped_id_sum
        |FROM asg t LEFT JOIN dstats d ON t.cluster = d.cluster
        |GROUP BY t.cluster""".stripMargin,

    // q230: placement replayed relationally — fp % 8 bucketing, (fp,
    // doc_id) intra-shard order via row_number, HUGEINT order-checksum
    "q230_shard_shuffle" ->
      s"""WITH fp AS (
        |  SELECT doc_id, ${fingerprintSql("text")} AS fp FROM documents),
        |pl AS (
        |  SELECT doc_id, fp, fp % 8 AS shard,
        |    row_number() OVER (PARTITION BY fp % 8 ORDER BY fp, doc_id)
        |      ::BIGINT AS pos
        |  FROM fp)
        |SELECT shard::BIGINT AS shard, count(*)::BIGINT AS n_docs,
        |  min(fp)::BIGINT AS min_fp, max(fp)::BIGINT AS max_fp,
        |  sum((pos * (fp % 1000))::HUGEINT)::BIGINT AS ord_check
        |FROM pl GROUP BY 1""".stripMargin,

    // q231: the fixed linear model replayed feature by feature — identical
    // integer floor divisions, identical stopword list, identical regex
    "q231_quality_classifier" ->
      s"""WITH $QualityMarginCtes
        |SELECT lang, (margin > 0)::BIGINT AS keep,
        |  count(*)::BIGINT AS n_docs,
        |  sum(margin::HUGEINT)::BIGINT AS sum_margin,
        |  min(margin)::BIGINT AS min_margin,
        |  max(margin)::BIGINT AS max_margin
        |FROM qmargin GROUP BY 1, 2""".stripMargin,

    // q232: the KMV algebra replayed relationally — per-source bottom-128
    // distinct shingle hashes, pairwise union re-truncation, shared-below-
    // kth intersection counting, identical floor-division estimators
    "q232_kmv_overlap" ->
      s"""WITH sh0 AS (
        |  SELECT source, unnest(list_distinct(list_transform(
        |    range(0, greatest(len(string_split(text, ' ')) - 2, 0)),
        |    i -> array_to_string(
        |      list_slice(string_split(text, ' '), i + 1, i + 3), ' '))))
        |    AS g
        |  FROM documents
        |  WHERE source IN ('src0', 'src1', 'src10', 'src11')),
        |hs AS (SELECT DISTINCT source, ${fingerprintSql("g")} AS h
        |       FROM sh0),
        |sk AS (SELECT source, h FROM (
        |    SELECT source, h,
        |      row_number() OVER (PARTITION BY source ORDER BY h) AS r
        |    FROM hs) WHERE r <= 128),
        |est AS (
        |  SELECT source, count(*)::BIGINT AS n_kept,
        |    CASE WHEN count(*) < 128 THEN count(*)::BIGINT
        |         ELSE (127::BIGINT * 2147483647) // (max(h) + 1) END
        |      AS kmv_est
        |  FROM sk GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS sa, b.source AS sb,
        |    a.kmv_est AS est_a, b.kmv_est AS est_b
        |  FROM est a, est b WHERE a.source < b.source),
        |uni0 AS (
        |  SELECT DISTINCT p.sa, p.sb, s.h
        |  FROM pairs p JOIN sk s ON s.source = p.sa OR s.source = p.sb),
        |uni AS (SELECT sa, sb, h FROM (
        |    SELECT sa, sb, h,
        |      row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS r
        |    FROM uni0) WHERE r <= 128),
        |us AS (
        |  SELECT sa, sb, count(*)::BIGINT AS n_u, max(h)::BIGINT AS kth_u
        |  FROM uni GROUP BY 1, 2),
        |shared AS (
        |  SELECT u.sa, u.sb, count(*)::BIGINT AS n_shared
        |  FROM uni u
        |  JOIN sk x ON x.source = u.sa AND x.h = u.h
        |  JOIN sk y ON y.source = u.sb AND y.h = u.h
        |  GROUP BY 1, 2)
        |SELECT sa, sb, est_a, est_b, est_union, n_shared,
        |  (n_shared * est_union) // least(128, n_u) AS est_inter
        |FROM (
        |  SELECT p.sa, p.sb, p.est_a, p.est_b,
        |    CASE WHEN us.n_u < 128 THEN us.n_u
        |         ELSE (127::BIGINT * 2147483647) // (us.kth_u + 1) END
        |      AS est_union,
        |    coalesce(sh2.n_shared, 0)::BIGINT AS n_shared, us.n_u
        |  FROM pairs p
        |  JOIN us ON us.sa = p.sa AND us.sb = p.sb
        |  LEFT JOIN shared sh2 ON sh2.sa = p.sa AND sh2.sb = p.sb)""".stripMargin,

    "q233_label_propagation" -> lpaOracleSql(3),

    "q234_pq_adc_topk" -> pqAdcOracleSql(5),

    "q235_recursive_cte" ->
      RecursiveReachSql("lineitem", "orders", "supplier", "customer"),

    "q241_kcenter_coreset" -> kCenterOracleSql(8),

    "q250_ivfpq_residual" -> ivfPqOracleSql(5),

    // q242: samples from the variant formula, Walsh-Hadamard signs via
    // bit_count parity, 32-bit pack, XOR/popcount hamming — all replayed
    "q242_audio_fingerprint" ->
      s"""WITH ${audioFpCtes("doc_id < 200")}
        |SELECT bit_count(xor(a.fp, b.fp))::BIGINT AS hamming,
        |  count(*)::BIGINT AS n_pairs,
        |  sum((a.base = b.base)::INT)::BIGINT AS n_within
        |FROM afp a JOIN afp b ON a.id < b.id
        |GROUP BY 1""".stripMargin,

    // q243: the staged layout replayed — token-band stage, fp mod 8
    // shard, (fp, doc_id) in-shard order, HUGEINT order checksum
    "q243_curriculum_order" ->
      s"""WITH st AS (
        |  SELECT doc_id, ${fingerprintSql("text")} AS fp,
        |    least(len(string_split(text, ' ')) // 25, 3)::BIGINT AS stage
        |  FROM documents),
        |pl AS (
        |  SELECT doc_id, fp, stage, fp % 8 AS shard,
        |    row_number() OVER (PARTITION BY stage, fp % 8
        |      ORDER BY fp, doc_id)::BIGINT AS pos
        |  FROM st)
        |SELECT stage, shard::BIGINT AS shard, count(*)::BIGINT AS n_docs,
        |  sum((pos * (fp % 1000))::HUGEINT)::BIGINT AS ord_check
        |FROM pl GROUP BY 1, 2""".stripMargin,

    // q244: floor quotas + largest-remainder top-ups with the same
    // (remainder DESC, lang) ranking
    "q244_quota_apportionment" ->
      """WITH per AS (
        |  SELECT lang, count(*)::BIGINT AS n_docs FROM documents
        |  GROUP BY 1),
        |tot AS (SELECT sum(n_docs)::BIGINT AS n_total FROM per),
        |q AS (
        |  SELECT lang, n_docs,
        |    (100 * n_docs) // n_total AS quota,
        |    (100 * n_docs) % n_total AS rem
        |  FROM per, tot),
        |s AS (SELECT (100 - sum(quota))::BIGINT AS n_extra FROM q),
        |r AS (
        |  SELECT q.*, s.n_extra,
        |    row_number() OVER (ORDER BY rem DESC, lang)::BIGINT AS rk
        |  FROM q, s)
        |SELECT lang, n_docs, quota::BIGINT AS quota,
        |  (rk <= n_extra)::BIGINT AS extra,
        |  (quota + (rk <= n_extra)::INT)::BIGINT AS alloc
        |FROM r""".stripMargin,

    // q247: islands via RUNNING-MAX interval end (heterogeneous gaps make
    // plain lag-based breaks wrong), session bounds = min start / max end
    "q247_dynamic_session_gap" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CASE WHEN event_type = 'click' THEN 600000000
        |         ELSE 1800000000 END AS gap_us,
        |    floor(value * 1e6)::BIGINT AS vm
        |  FROM events),
        |w AS (
        |  SELECT *, ts_us + gap_us AS iend,
        |    max(ts_us + gap_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_max_end
        |  FROM e),
        |f AS (
        |  SELECT *, CASE WHEN prev_max_end IS NULL
        |                   OR ts_us >= prev_max_end THEN 1 ELSE 0 END
        |              AS brk
        |  FROM w),
        |sids AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f)
        |SELECT user_id, min(ts_us)::BIGINT AS start_us,
        |  max(iend)::BIGINT AS end_us, count(*)::BIGINT AS n_events,
        |  sum(vm)::BIGINT AS sum_value_micro
        |FROM sids GROUP BY user_id, sid""".stripMargin,

    // q249: month-index arithmetic, (rev DESC, clerk) top-5 rank, month+1
    // churn self-join, identical null-handling on entrants
    "q249_trending_topk" ->
      """WITH rev AS (
        |  SELECT (year(o_orderdate) - 1992) * 12
        |      + month(o_orderdate) - 1 AS midx,
        |    p_brand,
        |    sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT
        |      AS rev_cents
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |top AS (
        |  SELECT midx::BIGINT AS midx, p_brand, rev_cents, rk FROM (
        |    SELECT *, row_number() OVER (PARTITION BY midx
        |      ORDER BY rev_cents DESC, p_brand)::BIGINT AS rk
        |    FROM rev) WHERE rk <= 5)
        |SELECT t.midx, count(*)::BIGINT AS n_top,
        |  sum(CASE WHEN p.rk IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_new,
        |  sum(coalesce(abs(t.rk - p.rk), 0))::BIGINT AS sum_abs_delta,
        |  sum(t.rev_cents)::BIGINT AS top_rev_cents
        |FROM top t LEFT JOIN top p
        |  ON p.midx + 1 = t.midx AND p.p_brand = t.p_brand
        |GROUP BY 1""".stripMargin,

    // q251: the same donor splice, canonical form via identical
    // POSIX-safe regex chain, distinct-count census per language
    "q251_canonical_dedup_gain" ->
      """WITH donor AS (
        |  SELECT doc_id + 1 AS doc_id, upper(text) || ' !!!' AS vtext
        |  FROM documents WHERE doc_id % 2 = 0),
        |mixed AS (
        |  SELECT d.doc_id, d.lang,
        |    CASE WHEN d.doc_id < 100 AND dn.vtext IS NOT NULL
        |         THEN dn.vtext ELSE d.text END AS text
        |  FROM documents d LEFT JOIN donor dn ON dn.doc_id = d.doc_id),
        |c AS (
        |  SELECT text,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), '  +', ' ', 'g')) AS ctext
        |  FROM mixed)
        |SELECT count(*)::BIGINT AS n_docs,
        |  count(DISTINCT text)::BIGINT AS raw_groups,
        |  count(DISTINCT ctext)::BIGINT AS canon_groups,
        |  (count(DISTINCT text) - count(DISTINCT ctext))::BIGINT AS gained
        |FROM c""".stripMargin,

    // q252: df-ranked vocabulary (row_number then LIMIT — same top-4000
    // set and ranks as the engine's limit-then-rank), four conditional
    // sums over one token scan
    "q252_vocab_size_sweep" -> {
      val branches = Seq(500L, 1000L, 2000L, 4000L).map { sz =>
        s"""SELECT ${sz}::BIGINT AS vocab_size, n_occ, o$sz AS n_oov,
           |  (o$sz * 1000000) // n_occ AS oov_ppm FROM a""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH tok AS (
        |  SELECT unnest(list_transform(
        |    range(0, greatest(len(string_split(text, ' ')) - 2, 0)),
        |    i -> array_to_string(
        |      list_slice(string_split(text, ' '), i + 1, i + 3), ' ')))
        |    AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, count(*) AS occ FROM tok GROUP BY 1),
        |ranked AS (
        |  SELECT tok, row_number() OVER (ORDER BY occ DESC, tok)::BIGINT
        |    AS rk
        |  FROM vocab ORDER BY occ DESC, tok LIMIT 4000),
        |sc AS (
        |  SELECT coalesce(r.rk, 9223372036854775807) AS rk
        |  FROM tok t LEFT JOIN ranked r ON r.tok = t.tok),
        |a AS (
        |  SELECT count(*)::BIGINT AS n_occ,
        |    sum((rk > 500)::INT)::BIGINT AS o500,
        |    sum((rk > 1000)::INT)::BIGINT AS o1000,
        |    sum((rk > 2000)::INT)::BIGINT AS o2000,
        |    sum((rk > 4000)::INT)::BIGINT AS o4000
        |  FROM sc)
        |$branches""".stripMargin
    },

    // q248: prefix splice, the SAME winnowing chain as q246, distinct-
    // hash pair join, permille score, planted-vs-discovered census
    "q248_moss_similarity" ->
      s"""WITH b0 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 80),
        |donor AS (
        |  SELECT doc_id + 1 AS doc_id,
        |    array_to_string(list_slice(string_split(text, ' '), 1, 12), ' ')
        |      AS pfx
        |  FROM b0 WHERE doc_id % 2 = 0),
        |sp AS (
        |  SELECT b0.doc_id,
        |    CASE WHEN d.pfx IS NOT NULL THEN d.pfx || ' ' || b0.text
        |         ELSE b0.text END AS text
        |  FROM b0 LEFT JOIN donor d ON d.doc_id = b0.doc_id),
        |${winnowSelCtes("sp")},
        |sd AS (SELECT DISTINCT doc_id, sh FROM sel),
        |cnt AS (SELECT doc_id, count(*)::BIGINT AS n_sel FROM sd
        |        GROUP BY 1),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    count(*)::BIGINT AS n_shared
        |  FROM sd a JOIN sd b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT s2.id_a, s2.id_b, s2.n_shared,
        |    (s2.n_shared * 1000) // least(ca.n_sel, cb.n_sel) AS score_pm,
        |    CASE WHEN s2.id_b - s2.id_a = 1 AND s2.id_a % 2 = 0
        |         THEN 1::BIGINT ELSE 0::BIGINT END AS planted
        |  FROM shared s2
        |  JOIN cnt ca ON ca.doc_id = s2.id_a
        |  JOIN cnt cb ON cb.doc_id = s2.id_b
        |  WHERE s2.n_shared >= 2)
        |SELECT planted, count(*)::BIGINT AS n_pairs,
        |  sum(n_shared)::BIGINT AS sum_shared,
        |  max(score_pm)::BIGINT AS max_score_pm,
        |  min(score_pm)::BIGINT AS min_score_pm
        |FROM scored GROUP BY 1""".stripMargin,

    // q246: positional shingles, the encoded (h, pos-desc) window min
    // over the same 4-row frame, full-window filter, distinct selections
    "q246_winnowing" ->
      s"""WITH ${winnowSelCtes("documents")}
        |SELECT doc_id, n_shingles, count(*)::BIGINT AS n_selected,
        |  sum(((sh * 31 + spos) % 2147483647)::HUGEINT)::BIGINT
        |    AS sel_checksum
        |FROM sel GROUP BY 1, 2""".stripMargin,

    // q245: the SAME q239/q242 fragment chains plus the q12 text hash —
    // min-id survivor per exact fingerprint group, cross-modal cell census
    "q245_crossmodal_dedup" ->
      s"""WITH $ImageAHashCtes,
        |${audioFpCtes("TRUE")},
        |tf AS (SELECT doc_id AS id, ${fingerprintSql("text")} AS tfp
        |       FROM documents),
        |im AS (SELECT id,
        |         (id <> min(id) OVER (PARTITION BY lo, hi))::BIGINT
        |           AS d_img FROM halves),
        |au AS (SELECT id,
        |         (id <> min(id) OVER (PARTITION BY fp))::BIGINT
        |           AS d_aud FROM afp),
        |tx AS (SELECT id,
        |         (id <> min(id) OVER (PARTITION BY tfp))::BIGINT
        |           AS d_txt FROM tf)
        |SELECT d_img, d_aud, d_txt, count(*)::BIGINT AS n_docs
        |FROM im JOIN au USING (id) JOIN tx USING (id)
        |GROUP BY 1, 2, 3""".stripMargin,

    // q240: the q72 register/estimate algebra over the per-type user hash
    // — the streaming run must land on these exact registers
    "q240_stream_hll" -> {
      import graft.ops.Sketch.{HllM, HllP, HllMaxRho}
      s"""WITH u AS (
        |  SELECT event_type, (user_id * 48271) % 2147483647 AS h
        |  FROM events),
        |r AS (SELECT event_type, h & ${HllM - 1} AS bucket, h >> $HllP AS w
        |      FROM u),
        |reg AS (SELECT event_type, bucket,
        |          max(CASE WHEN w = 0 THEN $HllMaxRho
        |                   ELSE bit_count((w & (-w)) - 1) + 1 END) AS max_rho
        |        FROM r GROUP BY 1, 2),
        |e AS (SELECT event_type, count(*)::BIGINT AS n_buckets_hit,
        |        (sum(CAST(1 AS BIGINT) << (30 - max_rho)) +
        |         ($HllM - count(*)) * ${1L << 30})::BIGINT AS z_scaled
        |      FROM reg GROUP BY 1),
        |x AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
        |      FROM events GROUP BY 1)
        |SELECT e.event_type, n_buckets_hit, z_scaled,
        |  (${709L * HllM * HllM} * CAST(${1L << 30} AS BIGINT)) // z_scaled
        |    AS est_milli,
        |  n_exact
        |FROM e JOIN x ON e.event_type = x.event_type""".stripMargin
    },

    // q239: every thumbnail pixel re-derived codec-free — the variant
    // raster formula (base seed, +7·variant clamp-255), the nearest-
    // neighbor index mapping, the 64·p > Σp bit rule, the 32-bit packing,
    // and XOR/popcount hamming, all replayed relationally
    "q239_image_phash_dedup" ->
      s"""WITH $ImageAHashCtes
        |SELECT (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))
        |    ::BIGINT AS hamming,
        |  count(*)::BIGINT AS n_pairs
        |FROM halves a JOIN halves b ON a.base = b.base AND a.id < b.id
        |GROUP BY 1""".stripMargin,

    // q238: the Hilbert recurrence unrolled one CTE per level, Morton via
    // the shared zSql bit contract, identical bucket/bbox census
    "q238_hilbert_layout" -> {
      val zExpr = graft.ops.ZOrder.zSql("gx", "gy", 8)
      s"""WITH p AS (
        |  SELECT c_custkey AS id, (c_custkey * 48271) % 100000 AS x,
        |    (c_custkey * 69621) % 100000 AS y
        |  FROM customer),
        |g AS (SELECT id, (x * 256) // 100000 AS gx,
        |             (y * 256) // 100000 AS gy FROM p),
        |${graft.ops.Hilbert.hilbertCtes("g", 8)},
        |keyed AS (
        |  SELECT f.id, f.gx, f.gy, f.d AS hd, $zExpr AS zd FROM hl8 f),
        |hb AS (
        |  SELECT hd // 100 AS bucket, count(*)::BIGINT AS n,
        |    min(gx) AS x0, max(gx) AS x1, min(gy) AS y0, max(gy) AS y1
        |  FROM keyed GROUP BY 1),
        |zb AS (
        |  SELECT zd // 100 AS bucket, count(*)::BIGINT AS n,
        |    min(gx) AS x0, max(gx) AS x1, min(gy) AS y0, max(gy) AS y1
        |  FROM keyed GROUP BY 1)
        |SELECT 'hilbert' AS layout, count(*)::BIGINT AS n_buckets,
        |  sum(n)::BIGINT AS n_points,
        |  sum((x1 - x0 + 1) * (y1 - y0 + 1))::BIGINT AS sum_bbox_area,
        |  max((x1 - x0 + 1) * (y1 - y0 + 1))::BIGINT AS max_bbox_area
        |FROM hb
        |UNION ALL
        |SELECT 'zorder', count(*)::BIGINT, sum(n)::BIGINT,
        |  sum((x1 - x0 + 1) * (y1 - y0 + 1))::BIGINT,
        |  max((x1 - x0 + 1) * (y1 - y0 + 1))::BIGINT
        |FROM zb""".stripMargin
    },

    // q237: the hash draw replayed — same affine pair hash, same 5%
    // acceptance bound, same (h, cand) ranking, same label exclusion
    "q237_negative_sampling" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, label AS ql FROM embeddings
        |  WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, label AS cl FROM embeddings),
        |f AS (
        |  SELECT query_id, cand_id,
        |    (query_id * 131071 + cand_id * 48271) % 2147483647 AS h
        |  FROM q, c
        |  WHERE query_id <> cand_id AND ql <> cl
        |    AND (query_id * 131071 + cand_id * 48271) % 2147483647 * 20
        |        < 2147483647)
        |SELECT query_id, cand_id AS neg_id, h, rank FROM (
        |  SELECT query_id, cand_id, h,
        |    row_number() OVER (PARTITION BY query_id ORDER BY h, cand_id)
        |      AS rank
        |  FROM f)
        |WHERE rank <= 4""".stripMargin,

    // q236: the SQL-UDF body inlined — same CASE, same cents arithmetic
    "q236_sql_udf" ->
      """WITH c AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT CASE WHEN cents < 5000000 THEN 'low'
        |            WHEN cents < 15000000 THEN 'mid'
        |            WHEN cents < 30000000 THEN 'high' ELSE 'jumbo' END
        |    AS tier,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(cents AS HUGEINT)) AS BIGINT) AS sum_cents
        |FROM c GROUP BY 1""".stripMargin,

    // the q163 emission-model oracle on the type grain: batch i's emission
    // for a touched key is the cumulative (count, sum, max) over batches <= i
    "q183_transform_with_state" ->
      """WITH e AS (
        |  SELECT (CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END) AS bb,
        |    event_type, floor(value * 1e6)::BIGINT AS vm
        |  FROM events),
        |bs AS (SELECT unnest([1, 2]) AS i),
        |em AS (
        |  SELECT i, event_type,
        |    count(*)::BIGINT AS n_events, sum(vm)::BIGINT AS sum_value_micro,
        |    max(vm)::BIGINT AS max_value_micro
        |  FROM bs JOIN e ON e.bb <= bs.i
        |  GROUP BY 1, 2
        |  HAVING max(CASE WHEN e.bb = bs.i THEN 1 ELSE 0 END) = 1)
        |SELECT event_type, n_events, sum_value_micro, max_value_micro
        |FROM em""".stripMargin,

    "q164_bfs_hops" ->
      """WITH RECURSIVE edges AS (
        |  SELECT s_nationkey AS src_key, c_nationkey AS dst_key,
        |    count(*)::BIGINT AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |t2 AS (
        |  SELECT src_key, dst_key FROM (
        |    SELECT src_key, dst_key,
        |      row_number() OVER (PARTITION BY src_key
        |        ORDER BY w DESC, dst_key) AS rn
        |    FROM edges)
        |  WHERE rn <= 2),
        |root AS (
        |  SELECT src_key FROM (
        |    SELECT src_key,
        |      row_number() OVER (ORDER BY sum(w) DESC, src_key) AS rn
        |    FROM edges GROUP BY src_key)
        |  WHERE rn = 1),
        |bfs AS (
        |  SELECT src_key::BIGINT AS node, 0::BIGINT AS hop FROM root
        |  UNION ALL
        |  SELECT t2.dst_key, bfs.hop + 1
        |  FROM bfs JOIN t2 ON t2.src_key = bfs.node
        |  WHERE bfs.hop < 6)
        |SELECT node, n_name, min(hop)::BIGINT AS hop
        |FROM bfs JOIN nation ON n_nationkey = node
        |GROUP BY 1, 2""".stripMargin,

    "q165_stream_outer_join" ->
      """WITH c AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type = 'purchase'),
        |inner_j AS (
        |  SELECT c.user_id, c.event_id AS click_id,
        |    p.event_id AS purchase_id, c.ts_us AS click_ts_us,
        |    p.ts_us AS purchase_ts_us, p.ts_us - c.ts_us AS delay_us
        |  FROM c JOIN p ON p.user_id = c.user_id
        |    AND p.ts_us >= c.ts_us AND p.ts_us <= c.ts_us + 600000000),
        |wm AS (
        |  SELECT least((SELECT (max(ts_us) // 1000) * 1000 FROM c),
        |               (SELECT (max(ts_us) // 1000) * 1000 FROM p))
        |    - 1800000000 AS wm_us),
        |un AS (
        |  SELECT c.user_id, c.event_id AS click_id,
        |    NULL::BIGINT AS purchase_id, c.ts_us AS click_ts_us,
        |    NULL::BIGINT AS purchase_ts_us, NULL::BIGINT AS delay_us
        |  FROM c, wm
        |  WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
        |      AND p.ts_us >= c.ts_us AND p.ts_us <= c.ts_us + 600000000)
        |    AND c.ts_us + 600000000 < wm.wm_us)
        |SELECT * FROM inner_j UNION ALL SELECT * FROM un""".stripMargin,

    "q166_snapshot_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, floor(o_totalprice * 100 + 0.5)::BIGINT AS v,
        |    o_orderpriority AS p
        |  FROM orders),
        |ns AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 3 THEN v + 500 ELSE v END AS v, p
        |  FROM o WHERE o_orderkey % 97 != 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000000000, v, p FROM o
        |  WHERE o_orderkey % 101 = 5),
        |d AS (
        |  SELECT o.v AS v_old, o.p AS p_old, ns.v AS v_new, ns.p AS p_new
        |  FROM o FULL JOIN ns ON o.o_orderkey = ns.o_orderkey)
        |SELECT CASE WHEN v_old IS NULL THEN 'added'
        |    WHEN v_new IS NULL THEN 'removed'
        |    WHEN v_old <> v_new OR p_old <> p_new THEN 'changed'
        |    ELSE 'same' END AS status,
        |  count(*)::BIGINT AS n_rows,
        |  sum(coalesce(v_old, 0))::BIGINT AS cents_old,
        |  sum(coalesce(v_new, 0))::BIGINT AS cents_new
        |FROM d GROUP BY 1""".stripMargin,

    "q167_blame_supplier" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    epoch_us(l_shipdate::TIMESTAMP) // 86400000000 AS ship_d
        |  FROM lineitem),
        |o AS (
        |  SELECT o_orderkey,
        |    epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS ord_d
        |  FROM orders),
        |l AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CASE WHEN ship_d > ord_d + 90 THEN 1 ELSE 0 END AS late
        |  FROM li JOIN o ON l_orderkey = o_orderkey),
        |po AS (
        |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS nsupp,
        |    count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS nlate
        |  FROM l GROUP BY 1),
        |blame AS (
        |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM l JOIN po ON l.l_orderkey = po.l_orderkey
        |  WHERE l.late = 1 AND po.nsupp > 1 AND po.nlate = 1),
        |w AS (
        |  SELECT l_suppkey, count(*)::BIGINT AS numwait FROM blame
        |  GROUP BY 1),
        |r AS (
        |  SELECT l_suppkey AS s_suppkey, n_name, numwait,
        |    row_number() OVER (ORDER BY numwait DESC, l_suppkey) AS rnk
        |  FROM w JOIN supplier ON l_suppkey = supplier.s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey)
        |SELECT s_suppkey, n_name, numwait, rnk::BIGINT AS rnk
        |FROM r WHERE rnk <= 20""".stripMargin,

    // the oracle side of corpus parity is the shipped tree ITSELF: DuckDB
    // lists /root/reference/Datasets (read-only reference content) and the
    // hash compare pins the engine's grammar to those 4,320 paths
    "q175_corpus_manifest" ->
      """SELECT replace(file, '/root/reference/Datasets/', '') AS rel_path
        |FROM glob('/root/reference/Datasets/**/*.csv')""".stripMargin,

    "q180_txt_manifest" ->
      """SELECT replace(file, '/root/reference/Datasets/', '') AS rel_path
        |FROM glob('/root/reference/Datasets/**/*.txt')""".stripMargin,

    "q174_gini" ->
      """WITH ov AS (
        |  SELECT floor(o_totalprice * 100 + 0.5)::BIGINT AS v FROM orders),
        |bins AS (
        |  SELECT v // 100000 AS bin, count(*)::BIGINT AS n,
        |    sum(v)::BIGINT AS sv
        |  FROM ov GROUP BY 1),
        |lor AS (
        |  SELECT bin,
        |    ((sum(n) OVER wc * 1000000) // sum(n) OVER ())::BIGINT AS x,
        |    ((sum(sv) OVER wc * 1000000) // sum(sv) OVER ())::BIGINT AS y
        |  FROM bins
        |  WINDOW wc AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)),
        |tz AS (
        |  SELECT bin, x, y,
        |    lag(x, 1, 0) OVER (ORDER BY bin) AS px,
        |    lag(y, 1, 0) OVER (ORDER BY bin) AS py
        |  FROM lor)
        |SELECT count(*)::BIGINT AS n_bins,
        |  sum((x - px) * (y + py))::BIGINT AS trapezoid_ppm2,
        |  ((1000000000000 - sum((x - px) * (y + py))) // 1000000)::BIGINT
        |    AS gini_ppm
        |FROM tz""".stripMargin,

    "q173_kendall_tau" ->
      """WITH m AS (
        |  SELECT c_nationkey AS nk,
        |    sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS rev,
        |    count(DISTINCT o_custkey)::BIGINT AS nc
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |p AS (
        |  SELECT a.rev AS r1, a.nc AS c1, b.rev AS r2, b.nc AS c2
        |  FROM m a JOIN m b ON b.nk > a.nk)
        |SELECT count(*)::BIGINT AS n_pairs,
        |  sum(CASE WHEN (r1 > r2 AND c1 > c2) OR (r1 < r2 AND c1 < c2)
        |    THEN 1 ELSE 0 END)::BIGINT AS n_concordant,
        |  sum(CASE WHEN (r1 > r2 AND c1 < c2) OR (r1 < r2 AND c1 > c2)
        |    THEN 1 ELSE 0 END)::BIGINT AS n_discordant,
        |  sum(CASE WHEN r1 = r2 THEN 1 ELSE 0 END)::BIGINT AS n_tie_x,
        |  sum(CASE WHEN c1 = c2 THEN 1 ELSE 0 END)::BIGINT AS n_tie_y,
        |  floor((sum(CASE WHEN (r1 > r2 AND c1 > c2) OR
        |      (r1 < r2 AND c1 < c2) THEN 1 ELSE 0 END)
        |    - sum(CASE WHEN (r1 > r2 AND c1 < c2) OR
        |      (r1 < r2 AND c1 > c2) THEN 1 ELSE 0 END))::DOUBLE
        |    / count(*)::DOUBLE * 1000 + 0.5)::BIGINT AS tau_a_milli
        |FROM p""".stripMargin,

    "q172_ses_smoothing" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    greatest(floor(value * 1e6), 0)::BIGINT AS vm
        |  FROM events),
        |r AS (
        |  SELECT user_id, vm,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts_us,
        |      event_id) AS rn
        |  FROM e),
        |n AS (SELECT user_id, count(*)::BIGINT AS n_events FROM e
        |  GROUP BY 1),
        |s AS (
        |  SELECT user_id, rn, vm AS lvl FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.rn, (r.vm + 3 * s.lvl) // 4
        |  FROM s JOIN r ON r.user_id = s.user_id AND r.rn = s.rn + 1)
        |SELECT s.user_id, n.n_events, s.lvl::BIGINT AS level_micro
        |FROM s JOIN n ON s.user_id = n.user_id
        |WHERE s.rn = n.n_events""".stripMargin,

    "q171_forecast_backtest" ->
      """WITH dd0 AS (
        |  SELECT epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS dd,
        |    count(*)::BIGINT AS cnt
        |  FROM orders GROUP BY 1),
        |b AS (SELECT min(dd) AS d0, max(dd) AS d1 FROM dd0),
        |grid AS (SELECT unnest(generate_series(d0, d1)) AS dd FROM b),
        |dense AS (
        |  SELECT g.dd, coalesce(dd0.cnt, 0)::BIGINT AS cnt
        |  FROM grid g LEFT JOIN dd0 ON dd0.dd = g.dd),
        |sc AS (
        |  SELECT dd, cnt,
        |    lag(cnt, 7) OVER (ORDER BY dd) AS f_seasonal,
        |    lag(cnt, 1) OVER (ORDER BY dd) AS f_last
        |  FROM dense QUALIFY f_seasonal IS NOT NULL),
        |m AS (
        |  SELECT 'seasonal_naive' AS model, abs(cnt - f_seasonal) AS ae,
        |    cnt - f_seasonal AS err FROM sc
        |  UNION ALL
        |  SELECT 'last_value', abs(cnt - f_last), cnt - f_last FROM sc)
        |SELECT model, count(*)::BIGINT AS n_days,
        |  ((sum(ae) * 1000) // count(*))::BIGINT AS mae_milli,
        |  sum(err)::BIGINT AS sum_err
        |FROM m GROUP BY 1""".stripMargin,

    "q170_sequence_hof" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    floor(value * 1e6)::BIGINT AS vm, event_id
        |  FROM events),
        |o AS (
        |  SELECT user_id, ts_us, event_id, vm,
        |    lag(vm) OVER w AS pvm, lag(ts_us) OVER w AS pts
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us,
        |    event_id)),
        |runs AS (
        |  SELECT user_id, ts_us, vm,
        |    sum(CASE WHEN pvm IS NULL OR vm <= pvm THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        |  FROM o),
        |per_run AS (
        |  SELECT user_id, run_id, count(*)::BIGINT AS rl
        |  FROM runs GROUP BY 1, 2),
        |per_user AS (
        |  SELECT u.user_id, u.n_events, r.best, g.gap
        |  FROM (SELECT user_id, count(*)::BIGINT AS n_events FROM e
        |        GROUP BY 1) u
        |  JOIN (SELECT user_id, max(rl)::BIGINT AS best FROM per_run
        |        GROUP BY 1) r USING (user_id)
        |  JOIN (SELECT user_id, coalesce(max(ts_us - pts), 0)::BIGINT
        |          AS gap FROM o GROUP BY 1) g USING (user_id))
        |SELECT best AS run_len, count(*)::BIGINT AS n_users,
        |  sum(n_events)::BIGINT AS sum_events, max(gap)::BIGINT
        |    AS max_gap_us
        |FROM per_user GROUP BY 1""".stripMargin,

    "q169_stream_scd2_enrich" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |o AS (
        |  SELECT user_id, event_type, ts_us, event_id,
        |    (CASE WHEN lag(event_type) OVER w IS NULL
        |          OR lag(event_type) OVER w <> event_type
        |          THEN 1 ELSE 0 END) AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |r AS (
        |  SELECT user_id, event_type,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id,
        |    ts_us
        |  FROM o),
        |runs AS (
        |  SELECT user_id, run_id, event_type, min(ts_us) AS valid_from
        |  FROM r GROUP BY 1, 2, 3),
        |v AS (
        |  SELECT user_id AS v_user, event_type AS state, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
        |      AS valid_to
        |  FROM runs),
        |p AS (
        |  SELECT user_id, event_id, ts_us FROM e
        |  WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id AS purchase_id, p.ts_us,
        |  coalesce(v.state, 'none') AS state_before
        |FROM p LEFT JOIN v ON p.user_id = v.v_user
        |  AND v.valid_from <= p.ts_us - 1
        |  AND (v.valid_to IS NULL OR v.valid_to > p.ts_us - 1)""".stripMargin,

    "q168_unpivot_measures" ->
      """WITH m AS (
        |  SELECT l_returnflag, 'quantity' AS measure,
        |    floor(l_quantity * 1e6)::BIGINT AS vm FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'extendedprice',
        |    floor(l_extendedprice * 1e6)::BIGINT FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'discount',
        |    floor(l_discount * 1e6)::BIGINT FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'tax',
        |    floor(l_tax * 1e6)::BIGINT FROM lineitem)
        |SELECT l_returnflag, measure, count(*)::BIGINT AS n,
        |  sum(vm::HUGEINT)::BIGINT AS sum_micro
        |FROM m GROUP BY 1, 2""".stripMargin,

    "q191_markov_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, count(*)::BIGINT AS n
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  (sum(n) OVER (PARTITION BY from_type))::BIGINT AS n_from,
        |  ((n * 1000000) // (sum(n) OVER (PARTITION BY from_type)))::BIGINT
        |    AS p_ppm
        |FROM c""".stripMargin,

    "q192_spatial_grid_join" ->
      """WITH p AS (
        |  SELECT c_custkey AS id, (c_custkey * 48271) % 100000 AS x,
        |    (c_custkey * 69621) % 100000 AS y
        |  FROM customer),
        |c AS (SELECT id, x, y, x // 2000 AS cx, y // 2000 AS cy FROM p),
        |o AS (SELECT dx, dy FROM (VALUES (-1), (0), (1)) a(dx),
        |      (VALUES (-1), (0), (1)) b(dy)),
        |pr AS (
        |  SELECT a.id AS a_id, a.x AS ax, a.y AS ay,
        |         b.id AS b_id, b.x AS bx, b.y AS b_y
        |  FROM c a JOIN o ON true
        |  JOIN c b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
        |  WHERE a.id < b.id),
        |q AS (
        |  SELECT a_id, b_id,
        |    (ax - bx) * (ax - bx) + (ay - b_y) * (ay - b_y) AS d2
        |  FROM pr
        |  WHERE (ax - bx) * (ax - bx) + (ay - b_y) * (ay - b_y) <= 4000000),
        |layout AS (
        |  SELECT count(*)::BIGINT AS n_points,
        |    count(DISTINCT cx * 200 + cy)::BIGINT AS n_cells FROM c),
        |agg AS (
        |  SELECT count(*)::BIGINT AS n_pairs,
        |    sum(d2::HUGEINT)::BIGINT AS sum_d2,
        |    min(d2)::BIGINT AS min_d2, max(d2)::BIGINT AS max_d2,
        |    sum(((a_id * 131071 + b_id) % 2147483647)::HUGEINT)::BIGINT
        |      AS pair_checksum
        |  FROM q)
        |SELECT n_points, n_cells, n_pairs, sum_d2, min_d2, max_d2,
        |  pair_checksum
        |FROM layout, agg""".stripMargin,

    "q193_max_concurrency" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    (o_orderdate::DATE - DATE '1970-01-01')::BIGINT AS d0,
        |    (o_orderdate::DATE - DATE '1970-01-01')::BIGINT
        |      + 1 + o_orderkey % 30 AS d1
        |  FROM orders),
        |ev AS (
        |  SELECT c_nationkey, d0 AS day, 1::BIGINT AS delta
        |  FROM o JOIN customer ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT c_nationkey, d1, -1::BIGINT
        |  FROM o JOIN customer ON o_custkey = c_custkey),
        |net AS (
        |  SELECT c_nationkey, day, sum(delta)::BIGINT AS net
        |  FROM ev GROUP BY 1, 2),
        |cum AS (
        |  SELECT c_nationkey, day,
        |    (sum(net) OVER (PARTITION BY c_nationkey ORDER BY day))::BIGINT
        |      AS conc
        |  FROM net),
        |mx AS (
        |  SELECT c_nationkey, max(conc)::BIGINT AS max_conc,
        |    count(*)::BIGINT AS n_days
        |  FROM cum GROUP BY 1)
        |SELECT cum.c_nationkey, max_conc, n_days,
        |  min(day)::BIGINT AS peak_day
        |FROM cum JOIN mx ON cum.c_nationkey = mx.c_nationkey
        |  AND cum.conc = mx.max_conc
        |GROUP BY 1, 2, 3""".stripMargin,

    "q194_bloom_semijoin" -> {
      val hashes = graft.ops.Bloom.Hashes
        .map { case (a, b) => s"(${a}::BIGINT, ${b}::BIGINT)" }.mkString(", ")
      val m = graft.ops.Bloom.BloomBits
      s"""WITH h AS (SELECT * FROM (VALUES $hashes) h(a, b)),
        |bu AS (SELECT DISTINCT c_custkey FROM customer
        |       WHERE c_mktsegment = 'BUILDING'),
        |bits AS (
        |  SELECT DISTINCT ((c_custkey * a + b) % 2147483647) % $m AS bit
        |  FROM bu CROSS JOIN h),
        |pass AS (
        |  SELECT o.o_custkey, o.o_orderpriority, o.o_totalprice
        |  FROM orders o
        |  JOIN bits b1 ON ((o.o_custkey * ${graft.ops.Bloom.Hashes(0)._1}
        |      + ${graft.ops.Bloom.Hashes(0)._2}) % 2147483647) % $m = b1.bit
        |  JOIN bits b2 ON ((o.o_custkey * ${graft.ops.Bloom.Hashes(1)._1}
        |      + ${graft.ops.Bloom.Hashes(1)._2}) % 2147483647) % $m = b2.bit)
        |SELECT o_orderpriority, count(*)::BIGINT AS n_bloom_pass,
        |  sum(CASE WHEN bu.c_custkey IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_member,
        |  sum(CASE WHEN bu.c_custkey IS NOT NULL
        |      THEN floor(o_totalprice * 1e6)::BIGINT ELSE 0 END
        |    ::HUGEINT)::BIGINT AS member_rev_micro
        |FROM pass LEFT JOIN bu ON pass.o_custkey = bu.c_custkey
        |GROUP BY 1""".stripMargin
    },

    "q195_entity_resolution" ->
      s"""WITH RECURSIVE $ErCandCtes,
        |edges AS (SELECT id_a AS a, id_b AS b FROM cand WHERE lev <= 2
        |          UNION SELECT id_b, id_a FROM cand WHERE lev <= 2),
        |reach(id, r) AS (
        |  SELECT id, id FROM regb
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
        |sizes AS (SELECT component, count(*)::BIGINT AS csize
        |          FROM comp GROUP BY component),
        |hist AS (SELECT csize, count(*)::BIGINT AS n_clusters,
        |    sum(component::HUGEINT)::BIGINT AS comp_checksum
        |  FROM sizes GROUP BY csize),
        |funnel AS (SELECT count(*)::BIGINT AS n_candidates,
        |    sum(CASE WHEN lev <= 2 THEN 1 ELSE 0 END)::BIGINT AS n_matches
        |  FROM cand)
        |SELECT csize, n_clusters, comp_checksum, n_candidates, n_matches
        |FROM hist, funnel""".stripMargin,

    "q196_weighted_sssp" -> {
      // MATERIALIZED: each d_i is referenced twice by round i+1 and DuckDB
      // re-inlines plain CTEs (2^8 re-evaluations of the fact join without it)
      val rounds = (1 to 8).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT d.node,
           |    CASE WHEN d.dist IS NULL THEN r.cand
           |         WHEN r.cand IS NULL THEN d.dist
           |         ELSE least(d.dist, r.cand) END AS dist
           |  FROM d${i - 1} d LEFT JOIN (
           |    SELECT e.v AS node, min(d.dist + e.w) AS cand
           |    FROM d${i - 1} d JOIN edges e ON e.u = d.node
           |    WHERE d.dist IS NOT NULL GROUP BY e.v) r USING (node))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH fact AS (
        |  SELECT s_nationkey::BIGINT AS u, c_nationkey::BIGINT AS v,
        |    greatest(l_shipdate::DATE - o_orderdate::DATE, 0)::BIGINT AS wd
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey),
        |edges AS MATERIALIZED (
        |  SELECT u, v, min(wd)::BIGINT AS w FROM fact GROUP BY 1, 2),
        |d0 AS MATERIALIZED (
        |  SELECT n_nationkey::BIGINT AS node,
        |    (CASE WHEN n_nationkey = 0 THEN 0 ELSE NULL END)::BIGINT AS dist
        |  FROM nation),
        |$rounds
        |SELECT node, dist::BIGINT AS dist FROM d8""".stripMargin
    },

    "q197_damerau_vs_lev" ->
      s"""WITH $ErCandCtes
        |SELECT lev, damerau_levenshtein(name_a, name_b)::BIGINT AS dl,
        |  count(*)::BIGINT AS n_pairs
        |FROM cand GROUP BY 1, 2""".stripMargin,

    "q198_woe_binning" ->
      """WITH per AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
        |      AS clicks,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
        |      AS good
        |  FROM events GROUP BY 1),
        |bn AS (
        |  SELECT least(clicks // 4, 5) AS b, count(*)::BIGINT AS n_users,
        |    sum(good)::BIGINT AS n_good, sum(1 - good)::BIGINT AS n_bad
        |  FROM per GROUP BY 1),
        |t AS (
        |  SELECT sum(n_good)::BIGINT AS tot_good,
        |    sum(n_bad)::BIGINT AS tot_bad, count(*)::BIGINT AS n_bins
        |  FROM bn)
        |SELECT b, n_users, n_good, n_bad,
        |  (length(bin((n_good + 1) * (tot_bad + n_bins)))
        |    - length(bin((n_bad + 1) * (tot_good + n_bins))))::BIGINT
        |    AS woe_bits,
        |  (((((n_good + 1) * 1000) // (tot_good + n_bins))
        |      - (((n_bad + 1) * 1000) // (tot_bad + n_bins)))
        |    * (length(bin((n_good + 1) * (tot_bad + n_bins)))
        |      - length(bin((n_bad + 1) * (tot_good + n_bins)))))::BIGINT
        |    AS iv_contrib_milli
        |FROM bn, t""".stripMargin,

    "q199_kcore" -> {
      // MATERIALIZED is load-bearing: each e_i is referenced three times
      // by round i+1, and DuckDB re-inlines plain CTEs, which makes the
      // 5-round unroll ~3^5 re-evaluations of the whole chain
      val rounds = (1 to 5).map { i =>
        s"""k$i AS MATERIALIZED (
           |  SELECT n FROM (
           |    SELECT n, count(*) AS deg FROM (
           |      SELECT u AS n FROM e${i - 1}
           |      UNION ALL SELECT v FROM e${i - 1}) dn
           |    GROUP BY n) dd
           |  WHERE deg >= 3),
           |e$i AS MATERIALIZED (
           |  SELECT e.u, e.v FROM e${i - 1} e
           |  JOIN k$i a ON e.u = a.n JOIN k$i b ON e.v = b.n)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS MATERIALIZED (
        |  SELECT DISTINCT l_suppkey::BIGINT AS u,
        |    (1000000 + l_partkey % 500)::BIGINT AS v
        |  FROM lineitem),
        |$rounds,
        |nodes AS (SELECT DISTINCT n FROM (
        |  SELECT u AS n FROM e5 UNION ALL SELECT v FROM e5) nn),
        |ea AS (SELECT count(*)::BIGINT AS n_edges,
        |  coalesce(sum((u + v)::HUGEINT), 0)::BIGINT AS edge_checksum
        |  FROM e5),
        |na AS (SELECT count(*)::BIGINT AS n_nodes,
        |  coalesce(sum(n::HUGEINT), 0)::BIGINT AS node_checksum FROM nodes)
        |SELECT n_nodes, n_edges, node_checksum, edge_checksum
        |FROM na, ea""".stripMargin
    },

    "q200_feature_hashing" ->
      s"""WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |h AS (SELECT tok, (${fingerprintSql("tok")}) % 64 AS bucket
        |      FROM tok)
        |SELECT bucket, count(*)::BIGINT AS n_occurrences,
        |  count(DISTINCT tok)::BIGINT AS n_distinct_tokens
        |FROM h GROUP BY 1""".stripMargin,

    // the oracle recomputes the shredded census relationally — first_q is
    // the q of the lexicographically-first (ln, q) pair, exactly the
    // sort_array(...)[0] the Spark side reads back through VARIANT
    "q201_variant_shred" ->
      """WITH l AS (
        |  SELECT l_orderkey, l_linenumber::BIGINT AS ln,
        |    floor(l_quantity * 1e6)::BIGINT AS q
        |  FROM lineitem),
        |f AS (
        |  SELECT l_orderkey,
        |    first_value(q) OVER (PARTITION BY l_orderkey
        |      ORDER BY ln, q) AS first_q
        |  FROM l),
        |per AS (
        |  SELECT l_orderkey, count(*)::BIGINT AS n_lines,
        |    min(first_q)::BIGINT AS first_q
        |  FROM f GROUP BY 1)
        |SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
        |  sum(per.first_q::HUGEINT)::BIGINT AS sum_first_q,
        |  sum(per.n_lines::HUGEINT)::BIGINT AS sum_n_lines,
        |  sum(o_custkey::HUGEINT)::BIGINT AS cust_checksum
        |FROM orders JOIN per ON o_orderkey = per.l_orderkey
        |GROUP BY 1""".stripMargin,

    "q202_t_closeness" ->
      """WITH b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    floor(c_acctbal / 2000.0)::BIGINT AS band
        |  FROM customer),
        |gl AS (SELECT band, count(*)::BIGINT AS gcnt FROM b GROUP BY 1),
        |gtot AS (SELECT sum(gcnt)::BIGINT AS n_total,
        |    count(*)::BIGINT AS n_bands FROM gl),
        |gcum AS (
        |  SELECT band,
        |    ((sum(gcnt) OVER (ORDER BY band)) * 1000000 // n_total)::BIGINT
        |      AS gcum_ppm,
        |    n_bands
        |  FROM gl, gtot),
        |groups AS (
        |  SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n_rows
        |  FROM b GROUP BY 1, 2),
        |cells AS (
        |  SELECT c_nationkey, c_mktsegment, band, count(*)::BIGINT AS cnt
        |  FROM b GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT g.c_nationkey, g.c_mktsegment, g.n_rows, gb.band,
        |    coalesce(c.cnt, 0) AS cnt
        |  FROM groups g CROSS JOIN (SELECT band FROM gl) gb
        |  LEFT JOIN cells c ON c.c_nationkey = g.c_nationkey
        |    AND c.c_mktsegment = g.c_mktsegment AND c.band = gb.band),
        |cum AS (
        |  SELECT c_nationkey, c_mktsegment, n_rows, band,
        |    ((sum(cnt) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY band)) * 1000000 // n_rows)::BIGINT AS cum_ppm
        |  FROM grid)
        |SELECT cum.c_nationkey, cum.c_mktsegment, cum.n_rows,
        |  (sum(abs(cum_ppm - gcum_ppm)) // (max(gc.n_bands) - 1))::BIGINT
        |    AS t_ppm
        |FROM cum JOIN gcum gc ON cum.band = gc.band
        |GROUP BY 1, 2, 3""".stripMargin,

    "q203_ndcg" ->
      s"""WITH de AS (
        |  SELECT query_id, cand_id, rank FROM (
        |    ${cosineTopkOracleSql(5, "q.vec_id % 50 = 0")})),
        |lbl AS (SELECT vec_id, label FROM embeddings),
        |r AS (
        |  SELECT de.query_id, de.rank,
        |    (CASE WHEN lq.label = lc.label AND de.cand_id <> de.query_id
        |      THEN 1 ELSE 0 END)::BIGINT AS rel
        |  FROM de JOIN lbl lq ON de.query_id = lq.vec_id
        |  JOIN lbl lc ON de.cand_id = lc.vec_id),
        |per AS (
        |  SELECT query_id,
        |    sum(rel * ($NdcgDiscCaseSql))::BIGINT AS dcg,
        |    sum(rel)::BIGINT AS nrel
        |  FROM r GROUP BY 1),
        |scored AS (
        |  SELECT query_id, dcg, nrel,
        |    ((dcg * 1000000) // ($NdcgIdealCaseSql))::BIGINT AS ndcg_ppm
        |  FROM per WHERE nrel > 0)
        |SELECT count(*)::BIGINT AS n_queries,
        |  (sum(ndcg_ppm) // count(*))::BIGINT AS mean_ndcg_ppm,
        |  min(ndcg_ppm)::BIGINT AS min_ndcg_ppm,
        |  sum(CASE WHEN ndcg_ppm = 1000000 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_perfect
        |FROM scored""".stripMargin,

    "q204_lateral_topk" ->
      """SELECT n_nationkey, c_custkey, bal_micro FROM nation,
        |LATERAL (SELECT c_custkey,
        |           floor(c_acctbal * 1e6)::BIGINT AS bal_micro
        |         FROM customer WHERE c_nationkey = n_nationkey
        |         ORDER BY bal_micro DESC, c_custkey LIMIT 2) t""".stripMargin,

    "q205_collation_dedup" ->
      """WITH reg AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, upper(text) FROM documents
        |  WHERE doc_id % 4 = 0)
        |SELECT count(*)::BIGINT AS n_docs,
        |  count(DISTINCT text)::BIGINT AS n_distinct_binary,
        |  count(DISTINCT lower(text))::BIGINT AS n_distinct_ci
        |FROM reg""".stripMargin,

    // the oracle re-reads the hive-partitioned tree Spark wrote, so the
    // directory layout (partition key in the path, not the files) is
    // itself under test
    "q206_partition_pruning" ->
      """SELECT count(*)::BIGINT AS n_orders,
        |  sum(floor(o_totalprice * 1e6)::BIGINT::HUGEINT)::BIGINT
        |    AS rev_micro,
        |  count(DISTINCT o_custkey)::BIGINT AS n_custs
        |FROM read_parquet(
        |  '__GEN_DIR__/q206_orders_by_priority/*/*.parquet',
        |  hive_partitioning = 1)
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin,

    "q207_compaction_plan" ->
      s"""WITH files AS (
        |  SELECT replace(file, '/root/reference/Datasets/', '') AS rel_path
        |  FROM glob('/root/reference/Datasets/**/*.csv')),
        |sized AS (
        |  SELECT rel_path, split_part(rel_path, '/', 1) AS family,
        |    (${fingerprintSql("rel_path")}) % 9000 + 1000 AS bytes
        |  FROM files),
        |packed AS (
        |  SELECT family, bytes,
        |    (sum(bytes) OVER (PARTITION BY family ORDER BY rel_path)
        |      - bytes) // 65536 AS bin
        |  FROM sized),
        |bins AS (
        |  SELECT family, bin, sum(bytes)::BIGINT AS bin_bytes,
        |    count(*)::BIGINT AS nf
        |  FROM packed GROUP BY 1, 2)
        |SELECT family, sum(nf)::BIGINT AS n_files,
        |  sum(bin_bytes)::BIGINT AS total_bytes,
        |  count(*)::BIGINT AS n_bins, max(bin_bytes)::BIGINT AS max_bin_bytes
        |FROM bins GROUP BY 1""".stripMargin,

    "q208_hierarchy_rollup" ->
      """WITH RECURSIVE anc(v, a) AS (
        |  SELECT c_custkey, c_custkey // 10 FROM customer WHERE c_custkey > 0
        |  UNION
        |  SELECT anc.v, anc.a // 10 FROM anc WHERE anc.a > 0),
        |vals AS (
        |  SELECT c_custkey AS v, floor(c_acctbal * 100 + 0.5)::BIGINT AS cts
        |  FROM customer)
        |SELECT a, count(*)::BIGINT AS n_desc,
        |  sum(cts::HUGEINT)::BIGINT AS subtree_cents
        |FROM anc JOIN vals USING (v)
        |WHERE a < 100 GROUP BY 1""".stripMargin,

    "q209_stream_complete_topk" ->
      """SELECT event_type, count(*)::BIGINT AS n_events,
        |  sum(floor(value * 1e6)::BIGINT::HUGEINT)::BIGINT
        |    AS sum_value_micro
        |FROM events GROUP BY 1
        |ORDER BY n_events DESC, event_type LIMIT 3""".stripMargin,

    "q210_equidepth_binning" ->
      """WITH binned AS (
        |  SELECT floor(o_totalprice * 100 + 0.5)::BIGINT AS v,
        |    floor(o_totalprice * 100 + 0.5)::BIGINT // 10000 AS b
        |  FROM orders),
        |hist AS (SELECT b, count(*)::BIGINT AS n FROM binned GROUP BY 1),
        |tot AS (SELECT sum(n)::BIGINT AS nt FROM hist),
        |cum AS (
        |  SELECT b, nt, (sum(n) OVER (ORDER BY b))::BIGINT AS cum
        |  FROM hist, tot),
        |bounds AS (
        |  SELECT
        |    min(CASE WHEN cum >= (1 * nt + 4) // 5 THEN b END) AS b1,
        |    min(CASE WHEN cum >= (2 * nt + 4) // 5 THEN b END) AS b2,
        |    min(CASE WHEN cum >= (3 * nt + 4) // 5 THEN b END) AS b3,
        |    min(CASE WHEN cum >= (4 * nt + 4) // 5 THEN b END) AS b4
        |  FROM cum)
        |SELECT (1 + (b > b1)::INT + (b > b2)::INT + (b > b3)::INT
        |    + (b > b4)::INT)::BIGINT AS bucket,
        |  count(*)::BIGINT AS n_orders, min(b)::BIGINT AS min_bin,
        |  max(b)::BIGINT AS max_bin, sum(v::HUGEINT)::BIGINT AS sum_cents
        |FROM binned, bounds GROUP BY 1""".stripMargin,

    "q211_set_similarity" ->
      """WITH dt AS (
        |  SELECT DISTINCT user_id, event_type, event_id % 2 AS par
        |  FROM events),
        |per AS (
        |  SELECT user_id,
        |    count(DISTINCT CASE WHEN par = 0 THEN event_type END)::BIGINT
        |      AS na,
        |    count(DISTINCT CASE WHEN par = 1 THEN event_type END)::BIGINT
        |      AS nb,
        |    count(DISTINCT event_type)::BIGINT AS nu
        |  FROM dt GROUP BY 1)
        |SELECT na, nb, (na + nb - nu) AS ni, count(*)::BIGINT AS n_users,
        |  (((na + nb - nu) * 1000000) // nu)::BIGINT AS jaccard_ppm
        |FROM per GROUP BY na, nb, nu""".stripMargin,

    "q212_schema_evolution" ->
      """SELECT coalesce(o_orderpriority, '<pre-evolution>') AS priority,
        |  count(*)::BIGINT AS n_orders,
        |  sum(price_micro::HUGEINT)::BIGINT AS rev_micro,
        |  count(DISTINCT o_custkey)::BIGINT AS n_custs
        |FROM read_parquet(
        |  ['__GEN_DIR__/q212_v1/*.parquet', '__GEN_DIR__/q212_v2/*.parquet'],
        |  union_by_name = 1)
        |GROUP BY 1""".stripMargin,

    "q213_path_census" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        |  FROM events),
        |per AS (
        |  SELECT user_id, ts_us // 3600000000 AS sess, count(*) AS n,
        |    string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
        |  FROM ev GROUP BY 1, 2)
        |SELECT path, count(*)::BIGINT AS n_sessions
        |FROM per WHERE n <= 8
        |GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 5""".stripMargin,

    "q214_chi2_independence" ->
      """WITH cells AS (
        |  SELECT c_nationkey AS r, c_mktsegment AS c, count(*)::BIGINT AS o
        |  FROM customer GROUP BY 1, 2),
        |rt AS (SELECT r, sum(o)::BIGINT AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT c, sum(o)::BIGINT AS ct FROM cells GROUP BY 1),
        |t AS (SELECT sum(o)::BIGINT AS n,
        |  count(DISTINCT r)::BIGINT AS nr, count(DISTINCT c)::BIGINT AS nc
        |  FROM cells)
        |SELECT
        |  sum(((o * n - rt.rt * ct.ct)::HUGEINT * (o * n - rt.rt * ct.ct)
        |    * 1000) // (rt.rt * ct.ct * n))::BIGINT AS chi2_milli,
        |  count(*)::BIGINT AS n_cells,
        |  max((nr - 1) * (nc - 1))::BIGINT AS dof,
        |  max(n)::BIGINT AS n_customers
        |FROM cells JOIN rt USING (r) JOIN ct USING (c), t""".stripMargin,

    "q215_time_decay_score" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    greatest(floor(value * 1e6), 0)::BIGINT AS vm
        |  FROM events),
        |mx AS (SELECT max(ts_us) AS max_us FROM ev),
        |dec AS (
        |  SELECT user_id, vm // (1::BIGINT <<
        |    least((max_us - ts_us) // 604800000000, 20)::INT) AS dec
        |  FROM ev, mx)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  sum(dec::HUGEINT)::BIGINT AS decayed_micro
        |FROM dec GROUP BY 1
        |ORDER BY decayed_micro DESC, user_id LIMIT 10""".stripMargin,

    "q216_sequence_pattern" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        |  FROM events),
        |per AS (
        |  SELECT user_id, ts_us // 3600000000 AS sess,
        |    string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
        |  FROM ev GROUP BY 1, 2)
        |SELECT count(*)::BIGINT AS n_sessions,
        |  sum(CASE WHEN contains(path, 'click>purchase') THEN 1 ELSE 0
        |    END)::BIGINT AS n_click_then_purchase,
        |  sum(CASE WHEN instr(path, 'view') > 0
        |      AND instr(path, 'purchase') > instr(path, 'view')
        |    THEN 1 ELSE 0 END)::BIGINT AS n_view_before_purchase,
        |  sum(CASE WHEN contains(path, 'error') THEN 1 ELSE 0 END)::BIGINT
        |    AS n_with_error
        |FROM per""".stripMargin,

    "q217_sorted_neighborhood" ->
      s"""WITH $ErCandCtes,
        |nbr AS (
        |  SELECT id, name,
        |    lead(name, 1) OVER w AS n1, lead(id, 1) OVER w AS i1,
        |    lead(name, 2) OVER w AS n2, lead(id, 2) OVER w AS i2
        |  FROM regb
        |  WINDOW w AS (PARTITION BY right(name, 2)
        |               ORDER BY blk, name, id)),
        |pairs AS (
        |  SELECT DISTINCT least(ia, ib) AS id_lo, greatest(ia, ib) AS id_hi,
        |    levenshtein(na, nb)::BIGINT AS lev
        |  FROM (
        |    SELECT id AS ia, name AS na, i1 AS ib, n1 AS nb FROM nbr
        |    WHERE i1 IS NOT NULL
        |    UNION ALL
        |    SELECT id, name, i2, n2 FROM nbr WHERE i2 IS NOT NULL) u),
        |truth AS (
        |  SELECT id_a AS id_lo, id_b AS id_hi FROM cand WHERE lev <= 2),
        |hits AS (
        |  SELECT count(*)::BIGINT AS n_hits
        |  FROM pairs JOIN truth USING (id_lo, id_hi) WHERE pairs.lev <= 2),
        |agg AS (
        |  SELECT count(*)::BIGINT AS n_pairs_considered,
        |    sum(CASE WHEN lev <= 2 THEN 1 ELSE 0 END)::BIGINT AS n_matches
        |  FROM pairs),
        |tr AS (SELECT count(*)::BIGINT AS n_true_matches FROM truth)
        |SELECT n_pairs_considered, n_matches, n_true_matches, n_hits,
        |  ((n_hits * 1000000) // n_true_matches)::BIGINT AS recall_ppm
        |FROM agg, tr, hits""".stripMargin,

    "q218_bucket_pruning" ->
      """SELECT c_custkey, c_nationkey,
        |  floor(c_acctbal * 100 + 0.5)::BIGINT AS bal_cents
        |FROM customer WHERE c_custkey IN (7, 42, 100)""".stripMargin,

    "q219_query_observability" ->
      """SELECT count(*)::BIGINT AS n_rows,
        |  sum(floor(l_extendedprice * 100 + 0.5)::BIGINT::HUGEINT)::BIGINT
        |    AS sum_price_cents,
        |  sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_null_qty,
        |  max(floor(l_discount * 100 + 0.5))::BIGINT AS max_disc_cents
        |FROM lineitem""".stripMargin,

    "q220_try_cast_audit" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |  UNION ALL SELECT doc_id, n_chars::VARCHAR FROM documents
        |  UNION ALL SELECT doc_id, '-' || doc_id::VARCHAR FROM documents),
        |probed AS (
        |  SELECT try_cast(tok AS BIGINT) AS num,
        |    (CASE WHEN length(tok) = 3 THEN 1 ELSE 0 END) AS div_null
        |  FROM toks)
        |SELECT count(*)::BIGINT AS n_tokens,
        |  sum(CASE WHEN num IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_numeric,
        |  sum(coalesce(num, 0)::HUGEINT)::BIGINT AS sum_numeric,
        |  sum(div_null)::BIGINT AS n_div_null
        |FROM probed""".stripMargin,

    // nearest-neighbor map: resized pixel ip = (y, x) samples source index
    // (y·h div 6)·w + (x·w div 8) of the position-hashed raster — the same
    // floor divisions the Scala kernel runs
    "q221_image_resize" ->
      """WITH dims AS (
        |  SELECT doc_id, (16 + doc_id % 16)::INTEGER AS width,
        |         (12 + doc_id % 8)::INTEGER AS height
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, width, height, unnest(range(48)) AS ip
        |  FROM dims),
        |b AS (
        |  SELECT doc_id, ip,
        |    ((doc_id * 2654435761 + (((ip // 8) * height // 6) * width
        |       + ((ip % 8) * width // 8)) * 40503) % 2147483648) % 256
        |      AS pix
        |  FROM px)
        |SELECT doc_id AS media_id, 8::INTEGER AS width, 6::INTEGER AS height,
        |  count(*)::BIGINT AS n_pixels, sum(pix)::BIGINT AS sum_pix,
        |  sum(ip * pix)::BIGINT AS moment_pix,
        |  ((1000 * sum(pix)) // 48)::BIGINT AS mean_milli
        |FROM b GROUP BY 1""".stripMargin,

    "q222_stream_foreachbatch_upsert" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    floor(value * 1e6)::BIGINT AS v_micro
        |  FROM events),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM ev)
        |SELECT user_id, ts_us, event_id, event_type, v_micro
        |FROM r WHERE rn = 1""".stripMargin,

    "q223_map_analytics" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |per AS (
        |  SELECT user_id, count(*)::BIGINT AS n_types,
        |    sum(CASE WHEN event_type = 'purchase' THEN n ELSE 0
        |      END)::BIGINT AS n_purchase,
        |    sum(n)::BIGINT AS n_total
        |  FROM c GROUP BY 1)
        |SELECT n_types, count(*)::BIGINT AS n_users,
        |  sum(n_purchase::HUGEINT)::BIGINT AS sum_purchase,
        |  sum(n_total::HUGEINT)::BIGINT AS sum_events
        |FROM per GROUP BY 1""".stripMargin,

    "q224_scalar_subquery" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
        |  sum((SELECT coalesce(floor(max(l_quantity) * 1e6)::BIGINT, 0)
        |       FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |    ::HUGEINT)::BIGINT AS sum_max_qty_micro
        |FROM orders o GROUP BY o_orderpriority""".stripMargin,

    "q225_sql_pivot" ->
      """WITH ev AS (
        |  SELECT user_id % 10 AS cohort, event_type,
        |    floor(value * 1e6)::BIGINT AS vm
        |  FROM events)
        |SELECT cohort,
        |  count(CASE WHEN event_type = 'click' THEN 1 END)::BIGINT
        |    AS click_n,
        |  sum(CASE WHEN event_type = 'click' THEN vm END)::BIGINT
        |    AS click_s,
        |  count(CASE WHEN event_type = 'view' THEN 1 END)::BIGINT
        |    AS view_n,
        |  sum(CASE WHEN event_type = 'view' THEN vm END)::BIGINT AS view_s,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END)::BIGINT
        |    AS purchase_n,
        |  sum(CASE WHEN event_type = 'purchase' THEN vm END)::BIGINT
        |    AS purchase_s
        |FROM ev GROUP BY 1""".stripMargin,

    "q226_null_ordering" ->
      """SELECT o_orderstatus,
        |  nullif(o_orderpriority, '1-URGENT') AS prio_nullable,
        |  o_orderkey, rn
        |FROM (
        |  SELECT o_orderstatus, o_orderpriority, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY nullif(o_orderpriority, '1-URGENT') ASC NULLS LAST,
        |        o_orderkey)::BIGINT AS rn
        |  FROM orders) r
        |WHERE rn <= 3""".stripMargin,

    "q253_dpp_partition_join" ->
      """WITH dim(pri, tier) AS (VALUES
        |  ('1-URGENT', 'hot'), ('2-HIGH', 'hot'), ('3-MEDIUM', 'warm'),
        |  ('4-NOT SPECIFIED', 'cold'), ('5-LOW', 'cold'))
        |SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
        |  sum(floor(o_totalprice * 1e6)::BIGINT::HUGEINT)::BIGINT
        |    AS rev_micro,
        |  count(DISTINCT o_custkey)::BIGINT AS n_custs
        |FROM read_parquet(
        |  '__GEN_DIR__/q253_orders_by_priority/*/*.parquet',
        |  hive_partitioning = 1)
        |JOIN dim ON o_orderpriority = pri
        |WHERE tier = 'hot'
        |GROUP BY 1""".stripMargin,

    "q254_nation_hits" -> {
      // two half-steps per iteration, each max-normalized back to micro
      // units — every CTE is pure integer (HUGEINT sums, // floor-div),
      // mirroring ops/Hits.scala bit-for-bit
      val iters = (1 to 3).map { i =>
        s"""ar$i AS (SELECT e.dst, sum(h.hub_micro::HUGEINT * e.w) AS raw
           |  FROM raw e JOIN hb${i - 1} h ON h.node = e.src GROUP BY 1),
           |am$i AS (SELECT greatest(max(raw), 1) AS mx FROM ar$i),
           |au$i AS (SELECT n.node,
           |    coalesce(((r.raw * 1000000) // m.mx)::BIGINT, 0) AS auth_micro
           |  FROM nodes n LEFT JOIN ar$i r ON r.dst = n.node CROSS JOIN am$i m),
           |hr$i AS (SELECT e.src, sum(a.auth_micro::HUGEINT * e.w) AS raw
           |  FROM raw e JOIN au$i a ON a.node = e.dst GROUP BY 1),
           |hm$i AS (SELECT greatest(max(raw), 1) AS mx FROM hr$i),
           |hb$i AS (SELECT n.node,
           |    coalesce(((r.raw * 1000000) // m.mx)::BIGINT, 0) AS hub_micro
           |  FROM nodes n LEFT JOIN hr$i r ON r.src = n.node CROSS JOIN hm$i m)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH raw AS MATERIALIZED (
        |  SELECT sn.n_name AS src, cn.n_name AS dst, count(*)::BIGINT AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  GROUP BY 1, 2),
        |nodes AS (SELECT src AS node FROM raw UNION SELECT dst FROM raw),
        |hb0 AS (SELECT node, 1000000::BIGINT AS hub_micro FROM nodes),
        |$iters
        |SELECT a.node AS nation, a.auth_micro, h.hub_micro
        |FROM au3 a JOIN hb3 h ON a.node = h.node""".stripMargin
    },

    "q255_boilerplate_strip" ->
      s"""WITH mixed AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN '$BoilerTemplate ' || text
        |         WHEN doc_id % 29 = 0 THEN '$BoilerRareTemplate ' || text
        |         ELSE text END AS text
        |  FROM documents),
        |tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM mixed),
        |sh AS (SELECT doc_id, list_transform(
        |    range(0, greatest(len(tk) - 4, 0)),
        |    i -> array_to_string(list_slice(tk, i + 1, i + 5), ' ')) AS g
        |  FROM tk),
        |pg AS MATERIALIZED (SELECT doc_id, unnest(range(0, len(g))) AS pos,
        |    unnest(g) AS gram FROM sh),
        |nd AS (SELECT count(*) AS n_docs FROM mixed),
        |boiler AS (
        |  SELECT gram FROM (
        |    SELECT gram, count(DISTINCT doc_id) AS gdf FROM pg GROUP BY 1), nd
        |  WHERE gdf * 1000 >= n_docs * 100),
        |cov AS (SELECT DISTINCT p.doc_id, p.pos + u.o AS tokpos
        |  FROM pg p JOIN boiler b USING (gram), unnest(range(0, 5)) AS u(o)),
        |covcnt AS (SELECT doc_id, count(*)::BIGINT AS n_covered
        |  FROM cov GROUP BY 1)
        |SELECT t.doc_id, len(t.tk)::BIGINT AS n_tokens,
        |  coalesce(c.n_covered, 0)::BIGINT AS n_covered,
        |  (len(t.tk) - coalesce(c.n_covered, 0))::BIGINT AS n_retained
        |FROM tk t LEFT JOIN covcnt c USING (doc_id)""".stripMargin,

    "q256_bpe_train" -> bpeOracleSql(6),

    // the weighting identity: corpus-side occurrence counting ≡ vocab-side
    // cnt-weighted counting over the dumped final segmentation
    "q257_bpe_encode" ->
      """SELECT sym, sum(cnt)::BIGINT AS n_occ,
        |  count(DISTINCT w)::BIGINT AS n_words
        |FROM read_parquet('__GEN_DIR__/q257_bpe/final/*.parquet')
        |GROUP BY sym""".stripMargin,

    "q258_closeness_centrality" -> {
      val iters = (1 to 8).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT src, node, min(dist) AS dist FROM (
           |    SELECT src, node, dist FROM d${i - 1}
           |    UNION ALL
           |    SELECT p.src, e.v AS node, p.dist + 1 AS dist
           |    FROM d${i - 1} p JOIN top3 e ON e.u = p.node)
           |  GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH raw AS MATERIALIZED (
        |  SELECT sn.n_name AS src, cn.n_name AS dst, count(*)::BIGINT AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  GROUP BY 1, 2),
        |top3 AS MATERIALIZED (
        |  SELECT src AS u, dst AS v FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src
        |        ORDER BY w DESC, dst) AS rk
        |    FROM raw) WHERE rk <= 3),
        |d0 AS (SELECT n_name AS src, n_name AS node, 0::BIGINT AS dist
        |       FROM nation),
        |$iters
        |SELECT src AS nation, count(*)::BIGINT AS n_reached,
        |  sum(dist)::BIGINT AS sum_dist,
        |  CASE WHEN sum(dist) > 0
        |    THEN ((count(*) - 1) * 1000000) // sum(dist)
        |    ELSE 0 END::BIGINT AS closeness_micro
        |FROM d8 GROUP BY 1""".stripMargin
    },

    "q259_cuped_ab_adjust" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS tu, event_type,
        |    floor(value * 1e6)::BIGINT AS vm
        |  FROM events),
        |piv AS (SELECT min(tu) AS mn, max(tu) AS mx FROM ev),
        |per AS MATERIALIZED (
        |  SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' AND tu * 2 < mn + mx
        |        THEN vm ELSE 0 END)::BIGINT AS x,
        |    sum(CASE WHEN event_type = 'purchase' AND tu * 2 >= mn + mx
        |        THEN vm ELSE 0 END)::BIGINT AS y
        |  FROM ev, piv GROUP BY 1),
        |st AS (
        |  SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
        |    sum(y)::HUGEINT AS sy, sum(x::HUGEINT * x) AS sxx,
        |    sum(x::HUGEINT * y) AS sxy
        |  FROM per),
        |th AS (
        |  SELECT CASE WHEN n * sxx - sx * sx = 0 THEN 0
        |    ELSE ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
        |    END::BIGINT AS theta_micro,
        |    (sx // n)::BIGINT AS xbar_micro
        |  FROM st),
        |adj AS (
        |  SELECT p.user_id, p.y,
        |    p.y - (t.theta_micro::HUGEINT * (p.x - t.xbar_micro)) // 1000000
        |      AS adj,
        |    t.theta_micro
        |  FROM per p, th t)
        |SELECT user_id % 2 AS arm, count(*)::BIGINT AS n_users,
        |  (sum(y::HUGEINT) // count(*))::BIGINT AS mean_y_micro,
        |  (sum(adj::HUGEINT) // count(*))::BIGINT AS mean_adj_micro,
        |  max(theta_micro)::BIGINT AS theta_micro
        |FROM adj GROUP BY 1""".stripMargin,

    "q260_region_modularity" ->
      """WITH raw AS MATERIALIZED (
        |  SELECT sn.n_name AS src, cn.n_name AS dst, count(*)::BIGINT AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  GROUP BY 1, 2),
        |regs AS (SELECT n_name AS nname, r_name AS reg
        |  FROM nation JOIN region ON n_regionkey = r_regionkey),
        |el AS MATERIALIZED (
        |  SELECT e.w, rs.reg AS rsrc, rd.reg AS rdst
        |  FROM raw e JOIN regs rs ON rs.nname = e.src
        |  JOIN regs rd ON rd.nname = e.dst),
        |mm AS (SELECT sum(w)::HUGEINT AS m FROM el),
        |intra AS (SELECT rsrc AS reg, sum(w)::BIGINT AS e_w FROM el
        |  WHERE rsrc = rdst GROUP BY 1),
        |outs AS (SELECT rsrc AS reg, sum(w)::BIGINT AS out_w FROM el
        |  GROUP BY 1),
        |ins AS (SELECT rdst AS reg, sum(w)::BIGINT AS in_w FROM el
        |  GROUP BY 1)
        |SELECT r.r_name AS reg,
        |  coalesce(i.e_w, 0)::BIGINT AS e_w,
        |  coalesce(o.out_w, 0)::BIGINT AS out_w,
        |  coalesce(n.in_w, 0)::BIGINT AS in_w,
        |  CASE WHEN mm.m > 0 THEN
        |    ((mm.m * coalesce(i.e_w, 0)
        |      - coalesce(o.out_w, 0)::HUGEINT * coalesce(n.in_w, 0))
        |      * 1000000) // (mm.m * mm.m)
        |  ELSE 0 END::BIGINT AS contrib_micro
        |FROM region r
        |LEFT JOIN intra i ON i.reg = r.r_name
        |LEFT JOIN outs o ON o.reg = r.r_name
        |LEFT JOIN ins n ON n.reg = r.r_name
        |CROSS JOIN mm""".stripMargin,

    "q261_target_encoding" ->
      """WITH grid AS (
        |  SELECT o_orderpriority AS cat, o_custkey % 5 AS fold,
        |    count(*)::BIGINT AS n_cf,
        |    sum(floor(o_totalprice * 100 + 0.5)::BIGINT::HUGEINT) AS s_cf
        |  FROM orders GROUP BY 1, 2),
        |tot AS (SELECT cat, sum(n_cf)::BIGINT AS n_cat,
        |    sum(s_cf) AS s_cat FROM grid GROUP BY 1)
        |SELECT g.cat, g.fold, (t.n_cat - g.n_cf)::BIGINT AS n_oof,
        |  CASE WHEN t.n_cat - g.n_cf > 0
        |    THEN (t.s_cat - g.s_cf) // (t.n_cat - g.n_cf)
        |    ELSE 0 END::BIGINT AS enc_cents
        |FROM grid g JOIN tot t ON t.cat = g.cat""".stripMargin,

    "q262_dsir_resample" ->
      s"""WITH big AS (
        |  SELECT doc_id, lang, unnest(list_transform(
        |    range(0, greatest(len(string_split(text, ' ')) - 1, 0)),
        |    i -> array_to_string(
        |      list_slice(string_split(text, ' '), i + 1, i + 2), ' '))) AS g
        |  FROM documents),
        |hb AS MATERIALIZED (
        |  SELECT doc_id, lang, (${fingerprintSql("g", "fi")}) % 256 AS b
        |  FROM big),
        |raw AS (SELECT b, count(*)::BIGINT AS r_cnt FROM hb GROUP BY 1),
        |tgt AS (SELECT b, count(*)::BIGINT AS t_cnt FROM hb
        |  WHERE lang = 'en' GROUP BY 1),
        |lr AS (SELECT r.b, length(bin(
        |    (coalesce(t.t_cnt, 0) + 1) * 1024 // (r.r_cnt + 1)))::BIGINT
        |    AS lr
        |  FROM raw r LEFT JOIN tgt t ON t.b = r.b),
        |sc AS (SELECT hb.doc_id, sum(lr.lr)::BIGINT AS score
        |  FROM hb JOIN lr ON lr.b = hb.b GROUP BY 1),
        |scored AS (SELECT d.doc_id, d.text,
        |    coalesce(s.score, 0)::BIGINT AS score
        |  FROM documents d LEFT JOIN sc s ON s.doc_id = d.doc_id)
        |SELECT doc_id, score AS weight,
        |  (((${fingerprintSql("text", "fi")}) % 1000000) * 1000)
        |    // greatest(score, 1) AS priority
        |FROM scored
        |ORDER BY priority, doc_id LIMIT 100""".stripMargin,

    "q263_substring_dedup" ->
      s"""WITH donor AS (
        |  SELECT doc_id + 1 AS doc_id,
        |    array_to_string(list_slice(string_split(text, ' '), 1, 12), ' ')
        |      AS pfx
        |  FROM documents WHERE doc_id % 2 = 0 AND doc_id < 80),
        |mixed AS (
        |  SELECT d.doc_id,
        |    CASE WHEN o.pfx IS NOT NULL THEN o.pfx || ' ' || d.text
        |         ELSE d.text END AS text
        |  FROM documents d LEFT JOIN donor o ON o.doc_id = d.doc_id),
        |tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM mixed),
        |sh AS (SELECT doc_id, list_transform(
        |    range(0, greatest(len(tk) - 9, 0)),
        |    i -> array_to_string(list_slice(tk, i + 1, i + 10), ' ')) AS g
        |  FROM tk),
        |pg AS MATERIALIZED (
        |  SELECT doc_id, unnest(range(0, len(g))) AS pos, unnest(
        |    list_transform(g, s -> (${fingerprintSql("s", "fi")}))) AS h
        |  FROM sh),
        |rk AS (SELECT doc_id, pos, h,
        |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
        |    count(*) OVER (PARTITION BY h) AS cnt
        |  FROM pg),
        |dups AS (SELECT doc_id, pos FROM rk WHERE cnt >= 2 AND rn >= 2),
        |cov AS (SELECT DISTINCT d.doc_id, d.pos + u.o AS tp
        |  FROM dups d, unnest(range(0, 10)) AS u(o)),
        |covcnt AS (SELECT doc_id, count(*)::BIGINT AS n_dup FROM cov
        |  GROUP BY 1)
        |SELECT t.doc_id, len(t.tk)::BIGINT AS n_tokens,
        |  coalesce(c.n_dup, 0)::BIGINT AS n_dup,
        |  (len(t.tk) - coalesce(c.n_dup, 0))::BIGINT AS n_kept
        |FROM tk t LEFT JOIN covcnt c USING (doc_id)""".stripMargin,

    "q264_bigram_perplexity" ->
      """WITH big AS MATERIALIZED (
        |  SELECT doc_id,
        |    unnest(list_slice(string_split(text, ' '), 1,
        |      len(string_split(text, ' ')) - 1)) AS a,
        |    unnest(list_slice(string_split(text, ' '), 2,
        |      len(string_split(text, ' ')))) AS b
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |cab AS (SELECT a, b, count(*)::BIGINT AS c_ab FROM big GROUP BY 1, 2),
        |ca AS (SELECT a, sum(c_ab)::BIGINT AS c_a FROM cab GROUP BY 1),
        |sc AS (
        |  SELECT g.doc_id,
        |    (length(bin(ca.c_a)) - length(bin(cab.c_ab)))::BIGINT AS sbits
        |  FROM big g
        |  JOIN cab ON cab.a = g.a AND cab.b = g.b
        |  JOIN ca ON ca.a = g.a)
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |  sum(sbits)::BIGINT AS sum_bits,
        |  ((sum(sbits) * 1000) // count(*))::BIGINT AS mean_milli,
        |  (CASE WHEN (sum(sbits) * 1000) // count(*) <= 4500
        |    THEN 1 ELSE 0 END)::BIGINT AS keep
        |FROM sc GROUP BY doc_id""".stripMargin,

    "q265_bpe_pack_manifest" ->
      """WITH wlen AS (
        |  SELECT w, count(*)::BIGINT AS n_syms
        |  FROM read_parquet('__GEN_DIR__/q265_bpe/final/*.parquet')
        |  GROUP BY w),
        |enc AS (
        |  SELECT doc_id, sum(n_syms)::BIGINT AS enc_len FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents) t
        |  JOIN wlen USING (w) GROUP BY doc_id),
        |pl AS (
        |  SELECT doc_id, doc_id % 8 AS shard, enc_len,
        |    sum(enc_len) OVER (PARTITION BY doc_id % 8
        |      ORDER BY doc_id) AS tok_end
        |  FROM enc)
        |SELECT doc_id, shard, enc_len,
        |  (tok_end - enc_len)::BIGINT AS tok_start,
        |  ((tok_end - enc_len) // 512)::BIGINT AS first_seq,
        |  ((tok_end - 1) // 512)::BIGINT AS last_seq,
        |  ((tok_end - 1) // 512 - (tok_end - enc_len) // 512 + 1)::BIGINT
        |    AS n_seqs
        |FROM pl""".stripMargin,

    "q266_fd_audit" -> {
      def fd(name: String, det: String, dep: String) =
        s"""SELECT '$name' AS fd, count(*)::BIGINT AS n_groups,
           |  sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END)::BIGINT
           |    AS n_violating,
           |  (CASE WHEN sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) = 0
           |    THEN 1 ELSE 0 END)::BIGINT AS holds
           |FROM (SELECT $det, count(DISTINCT $dep) AS ndep FROM orders
           |      GROUP BY 1)""".stripMargin
      Seq(
        fd("orderkey_to_custkey", "o_orderkey", "o_custkey"),
        fd("custkey_to_status", "o_custkey", "o_orderstatus"),
        fd("orderkey_to_priority", "o_orderkey", "o_orderpriority"),
        fd("orderdate_to_priority", "o_orderdate", "o_orderpriority"))
        .mkString("\nUNION ALL\n")
    },

    // every frame's raster re-derived codec-free from the shot-structured
    // synth formula (base raster of the frame's shot seed + the mod-29
    // jitter), motion via the (doc, pixel, f−1) self-join
    "q267_shot_keyframes" ->
      """WITH dims AS (
        |  SELECT doc_id, (16 + doc_id % 8)::BIGINT AS w,
        |    (12 + doc_id % 4)::BIGINT AS h,
        |    (4 + doc_id % 3)::BIGINT AS n,
        |    (1 + doc_id % (3 + doc_id % 3))::BIGINT AS cut
        |  FROM documents),
        |fx AS (SELECT doc_id, w, h, cut, unnest(range(n)) AS f FROM dims),
        |pxi AS (SELECT doc_id, f, cut, unnest(range(w * h)) AS i FROM fx),
        |px AS MATERIALIZED (
        |  SELECT doc_id, f, i,
        |    CASE WHEN (i + 40503 * f) % 29 = 0
        |      THEN ((((doc_id + CASE WHEN f >= cut THEN 777777 ELSE 0 END)
        |               * 2654435761 + i * 40503) % 2147483648) % 256 + f)
        |           % 256
        |      ELSE (((doc_id + CASE WHEN f >= cut THEN 777777 ELSE 0 END)
        |              * 2654435761 + i * 40503) % 2147483648) % 256
        |    END AS pix
        |  FROM pxi),
        |fr AS (
        |  SELECT a.doc_id, a.f, sum(a.pix)::BIGINT AS sum_pix,
        |    coalesce(sum(abs(a.pix - b.pix)), 0)::BIGINT AS motion_abs
        |  FROM px a LEFT JOIN px b
        |    ON b.doc_id = a.doc_id AND b.i = a.i AND b.f = a.f - 1
        |  GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(motion_abs) AS total FROM fr GROUP BY 1)
        |SELECT f.doc_id AS media_id, f.f::BIGINT AS frame_idx, f.sum_pix,
        |  f.motion_abs,
        |  (CASE WHEN f.f = 0 OR 2 * f.motion_abs >= t.total
        |    THEN 1 ELSE 0 END)::BIGINT AS is_key
        |FROM fr f JOIN tot t USING (doc_id)""".stripMargin,

    "q268_matryoshka_recall" ->
      s"""WITH e16 AS (
        |  SELECT vec_id, embedding[1:16] AS embedding FROM embeddings),
        |ex AS (${cosineTopkOracleSql(5)}),
        |tr AS (${cosineTopkOracleSql(5, table = "e16")}),
        |m AS (SELECT count(*)::BIGINT AS n_full FROM ex),
        |l AS (SELECT count(*)::BIGINT AS n_trunc FROM tr),
        |ht AS (SELECT count(*)::BIGINT AS n_hit
        |       FROM ex e JOIN tr t
        |         ON e.query_id = t.query_id AND e.cand_id = t.cand_id)
        |SELECT m.n_full, l.n_trunc, ht.n_hit,
        |  ((ht.n_hit * 1000000) // m.n_full)::BIGINT AS recall_ppm
        |FROM m, l, ht""".stripMargin,

    "q269_granger_census" ->
      s"""WITH $CausalPanelCte,
        |${graft.metrics.Causal.grangerSqlCtes("panel")}
        |SELECT * FROM granger_out""".stripMargin,

    "q270_pc_skeleton" ->
      s"""WITH $CausalPanelCte,
        |${graft.metrics.Causal.pcSkeletonSqlCtes("panel")}
        |SELECT * FROM pc_out""".stripMargin,

    "q271_granger_recovery" ->
      s"""WITH $CausalPanelCte,
        |b AS (
        |  SELECT day, v, row_number() OVER (ORDER BY day) AS i,
        |    lag(v, 1) OVER (ORDER BY day) AS bl,
        |    lag(v, 2) OVER (ORDER BY day) AS bl2
        |  FROM panel WHERE series = 'view'),
        |bi AS (SELECT * FROM b WHERE i >= 3),
        |synth AS (
        |  SELECT 's1' AS series, day, v FROM bi
        |  UNION ALL SELECT 's2', day,
        |    bl + ((i * 2654435761) % 1001) FROM bi
        |  UNION ALL SELECT 's3', day, (i * 2246822519) % 100000 FROM bi
        |  UNION ALL SELECT 's4', day,
        |    bl2 + (((i - 1) * 2654435761) % 1001)
        |        + ((i * 1779033703) % 1001) FROM bi),
        |${graft.metrics.Causal.grangerSqlCtes("synth")},
        |pred AS (SELECT cause AS source, effect AS target
        |  FROM granger_out WHERE granger = 1),
        |truth(source, target) AS (VALUES ('s1', 's2'), ('s2', 's4')),
        |conf AS (SELECT
        |  (SELECT count(*) FROM truth t JOIN pred p
        |     ON p.source = t.source AND p.target = t.target) AS tp,
        |  (SELECT count(*) FROM pred p LEFT JOIN truth t
        |     ON p.source = t.source AND p.target = t.target
        |   WHERE t.source IS NULL) AS fp,
        |  (SELECT count(*) FROM truth t LEFT JOIN pred p
        |     ON p.source = t.source AND p.target = t.target
        |   WHERE p.source IS NULL) AS fn)
        |SELECT 'panel' AS graph_id, tp::BIGINT AS tp, fp::BIGINT AS fp,
        |  fn::BIGINT AS fn, (12 - tp - fp - fn)::BIGINT AS tn,
        |  round(CASE WHEN tp + fn = 0 THEN 0.0
        |    ELSE tp / (tp + fn)::DOUBLE END, 6) AS tpr,
        |  round(CASE WHEN fp + tp = 0 THEN 0.0
        |    ELSE fp / (fp + tp)::DOUBLE END, 6) AS fdr,
        |  (fp + fn)::BIGINT AS shd
        |FROM conf""".stripMargin,

    "q272_transfer_entropy" ->
      s"""WITH $CausalPanelCte,
        |means AS (SELECT series, sum(v) // count(*) AS mean_v
        |  FROM panel GROUP BY 1),
        |binned AS (SELECT p.series, p.day,
        |    CASE WHEN p.v > m.mean_v THEN 1 ELSE 0 END AS bit
        |  FROM panel p JOIN means m USING (series)),
        |lagged AS (
        |  SELECT x.series AS cause, y.series AS effect, y.day,
        |    y.bit AS ynow,
        |    lag(y.bit) OVER (PARTITION BY x.series, y.series
        |      ORDER BY y.day) AS yprev,
        |    lag(x.bit) OVER (PARTITION BY x.series, y.series
        |      ORDER BY y.day) AS xprev
        |  FROM binned y JOIN binned x USING (day)
        |  WHERE x.series <> y.series),
        |lv AS (SELECT * FROM lagged WHERE yprev IS NOT NULL),
        |trip AS (SELECT cause, effect, ynow, yprev, xprev,
        |    count(*)::BIGINT AS c3
        |  FROM lv GROUP BY 1, 2, 3, 4, 5),
        |cy AS (SELECT cause, effect, yprev, count(*)::BIGINT AS c_y
        |  FROM lv GROUP BY 1, 2, 3),
        |cyx AS (SELECT cause, effect, yprev, xprev,
        |    count(*)::BIGINT AS c_yx
        |  FROM lv GROUP BY 1, 2, 3, 4),
        |cyy AS (SELECT cause, effect, ynow, yprev,
        |    count(*)::BIGINT AS c_yy
        |  FROM lv GROUP BY 1, 2, 3, 4)
        |SELECT cause, effect, sum(c3)::BIGINT AS n,
        |  sum(c3 * ((${lnMicroCaseSql("c3")})
        |    + (${lnMicroCaseSql("c_y")})
        |    - (${lnMicroCaseSql("c_yx")})
        |    - (${lnMicroCaseSql("c_yy")})))::BIGINT AS te_micro_n
        |FROM trip
        |JOIN cy USING (cause, effect, yprev)
        |JOIN cyx USING (cause, effect, yprev, xprev)
        |JOIN cyy USING (cause, effect, ynow, yprev)
        |GROUP BY 1, 2""".stripMargin,

    "q273_benford_audit" ->
      s"""WITH obs AS (
        |  SELECT substr(floor(l_extendedprice * 1e6)::BIGINT::VARCHAR,
        |      1, 1)::INT AS digit, count(*)::BIGINT AS n_obs
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(n_obs)::HUGEINT AS n FROM obs)
        |SELECT digit, n_obs, ($BenfordPpmCaseSql)::BIGINT AS exp_ppm,
        |  ((n_obs::HUGEINT * 1000000 - ($BenfordPpmCaseSql) * n)
        |   * (n_obs::HUGEINT * 1000000 - ($BenfordPpmCaseSql) * n)
        |   // (($BenfordPpmCaseSql) * n))::BIGINT AS chi2_micro
        |FROM obs, tot""".stripMargin,

    "q274_pmi_collocations" ->
      """WITH pr AS (
        |  SELECT unnest(list_transform(
        |    range(0, greatest(len(string_split(text, ' ')) - 1, 0)),
        |    i -> array_to_string(list_slice(string_split(text, ' '),
        |      i + 1, i + 2), ' '))) AS pair
        |  FROM documents),
        |bi AS MATERIALIZED (
        |  SELECT string_split(pair, ' ')[1] AS x,
        |    string_split(pair, ' ')[2] AS y, count(*)::BIGINT AS cxy
        |  FROM pr GROUP BY 1, 2),
        |lft AS (SELECT x, sum(cxy)::BIGINT AS cx FROM bi GROUP BY 1),
        |rgt AS (SELECT y, sum(cxy)::BIGINT AS cy FROM bi GROUP BY 1),
        |tot AS (SELECT sum(cxy)::BIGINT AS nbi FROM bi)
        |SELECT b.x, b.y, b.cxy, l.cx, r.cy, t.nbi,
        |  CASE WHEN b.cxy * t.nbi > 8 * l.cx * r.cy
        |  THEN 1 ELSE 0 END AS pmi8
        |FROM bi b JOIN lft l USING (x) JOIN rgt r USING (y), tot t
        |WHERE b.cxy >= 5
        |ORDER BY b.cxy DESC, b.x, b.y LIMIT 50""".stripMargin,

    "q275_conformal_interval" ->
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |    floor(value * 1e6)::BIGINT AS vm
        |  FROM events),
        |mu AS (SELECT event_type, sum(vm) // count(*) AS mu_micro
        |  FROM ev WHERE event_id % 3 = 0 GROUP BY 1),
        |calib AS (
        |  SELECT e.event_type, abs(e.vm - m.mu_micro) AS r,
        |    row_number() OVER (PARTITION BY e.event_type
        |      ORDER BY abs(e.vm - m.mu_micro), e.event_id) AS rk,
        |    count(*) OVER (PARTITION BY e.event_type) AS nc
        |  FROM ev e JOIN mu m USING (event_type)
        |  WHERE e.event_id % 3 = 1),
        |qh AS (SELECT event_type, r AS qhat_micro, nc AS n_calib
        |  FROM calib WHERE rk = (9 * nc + 18) // 10)
        |SELECT e.event_type, m.mu_micro::BIGINT AS mu_micro, q.n_calib,
        |  q.qhat_micro::BIGINT AS qhat_micro,
        |  count(*)::BIGINT AS n_test,
        |  ((sum(CASE WHEN abs(e.vm - m.mu_micro) <= q.qhat_micro
        |      THEN 1 ELSE 0 END) * 1000000) // count(*))::BIGINT
        |    AS coverage_ppm
        |FROM ev e JOIN mu m USING (event_type)
        |JOIN qh q USING (event_type)
        |WHERE e.event_id % 3 = 2
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    "q276_holt_smoothing" ->
      s"""WITH RECURSIVE $CausalPanelCte,
        |${graft.ops.Smoothing.holtSqlCtes("panel")}
        |SELECT * FROM holt_out""".stripMargin,

    "q277_weekly_decompose" ->
      s"""WITH $CausalPanelCte,
        |tr AS (
        |  SELECT series, day, v,
        |    count(*) OVER w AS wn, sum(v) OVER w AS trend
        |  FROM panel
        |  WINDOW w AS (PARTITION BY series ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |detr AS (
        |  SELECT series, day, v - (trend // 7) AS dt
        |  FROM tr WHERE wn = 7),
        |seas AS (
        |  SELECT series, day % 7 AS dow,
        |    sum(dt) // count(*) AS seasonal_milli,
        |    count(*)::BIGINT AS n
        |  FROM detr GROUP BY 1, 2)
        |SELECT s.series, s.dow, s.seasonal_milli::BIGINT AS seasonal_milli,
        |  s.n,
        |  sum(abs(d.dt - s.seasonal_milli))::BIGINT AS sum_abs_rem
        |FROM detr d JOIN seas s
        |  ON s.series = d.series AND s.dow = d.day % 7
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    "q278_ipf_raking" ->
      """WITH li AS (
        |  SELECT l_returnflag AS rf, l_linestatus AS ls, l_quantity
        |  FROM lineitem),
        |cells AS (SELECT rf, ls, count(*)::BIGINT AS c
        |  FROM li GROUP BY 1, 2),
        |rt AS (SELECT rf, count(*)::BIGINT AS rt FROM li
        |  WHERE l_quantity > 25 GROUP BY 1),
        |ct AS (SELECT ls, count(*)::BIGINT AS ct FROM li
        |  WHERE l_quantity > 25 GROUP BY 1),
        |w0 AS (SELECT rf, ls, c, 1000000::BIGINT AS w FROM cells),
        |m1 AS (SELECT rf, sum(c * w)::BIGINT AS rm FROM w0 GROUP BY 1),
        |w1 AS (SELECT w0.rf, w0.ls, w0.c,
        |    (w0.w * ((rt.rt * 1000000000000) // m1.rm)) // 1000000 AS w
        |  FROM w0 JOIN m1 ON m1.rf = w0.rf JOIN rt ON rt.rf = w0.rf),
        |m2 AS (SELECT ls, sum(c * w)::BIGINT AS cm FROM w1 GROUP BY 1),
        |w2 AS (SELECT w1.rf, w1.ls, w1.c,
        |    (w1.w * ((ct.ct * 1000000000000) // m2.cm)) // 1000000 AS w
        |  FROM w1 JOIN m2 ON m2.ls = w1.ls JOIN ct ON ct.ls = w1.ls),
        |m3 AS (SELECT rf, sum(c * w)::BIGINT AS rm FROM w2 GROUP BY 1),
        |w3 AS (SELECT w2.rf, w2.ls, w2.c,
        |    (w2.w * ((rt.rt * 1000000000000) // m3.rm)) // 1000000 AS w
        |  FROM w2 JOIN m3 ON m3.rf = w2.rf JOIN rt ON rt.rf = w2.rf),
        |m4 AS (SELECT ls, sum(c * w)::BIGINT AS cm FROM w3 GROUP BY 1),
        |w4 AS (SELECT w3.rf, w3.ls, w3.c,
        |    (w3.w * ((ct.ct * 1000000000000) // m4.cm)) // 1000000 AS w
        |  FROM w3 JOIN m4 ON m4.ls = w3.ls JOIN ct ON ct.ls = w3.ls)
        |SELECT rf, ls, c, w AS w_ppm, (c * w) // 1000000 AS fitted
        |FROM w4""".stripMargin,

    "q279_mann_kendall" ->
      s"""WITH $CausalPanelCte,
        |pairs AS (
        |  SELECT a.series,
        |    CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1
        |    ELSE 0 END AS sg
        |  FROM panel a JOIN panel b
        |    ON a.series = b.series AND a.day < b.day),
        |st AS (SELECT series, sum(sg)::BIGINT AS s_stat
        |  FROM pairs GROUP BY 1),
        |ns AS (SELECT series, count(*)::BIGINT AS n
        |  FROM panel GROUP BY 1),
        |ties AS (
        |  SELECT series,
        |    sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_term
        |  FROM (SELECT series, v, count(*)::BIGINT AS t
        |        FROM panel GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT st.series, ns.n, st.s_stat,
        |  (ns.n * (ns.n - 1) * (2 * ns.n + 5) - ties.tie_term)::BIGINT
        |    AS varnum,
        |  (CASE WHEN 180000 * greatest(abs(st.s_stat) - 1, 0)
        |          * greatest(abs(st.s_stat) - 1, 0)
        |          > 38416 *
        |            (ns.n * (ns.n - 1) * (2 * ns.n + 5) - ties.tie_term)
        |   THEN CASE WHEN st.s_stat > 0 THEN 1 ELSE -1 END
        |   ELSE 0 END)::INT AS trend
        |FROM st JOIN ns ON ns.series = st.series
        |JOIN ties ON ties.series = st.series""".stripMargin,

    "q280_ks_two_sample" ->
      """WITH ev AS (
        |  SELECT event_type, floor(value * 1e6)::BIGINT AS vm
        |  FROM events WHERE event_type IN ('click', 'error')),
        |byv AS (
        |  SELECT vm,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
        |      AS a_v,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
        |      AS b_v
        |  FROM ev GROUP BY 1),
        |cum AS (
        |  SELECT vm,
        |    sum(a_v) OVER (ORDER BY vm ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS ca,
        |    sum(b_v) OVER (ORDER BY vm ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cb
        |  FROM byv),
        |tot AS (
        |  SELECT
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
        |      AS na,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
        |      AS nb
        |  FROM ev),
        |ds AS (
        |  SELECT max(t.na)::BIGINT AS na, max(t.nb)::BIGINT AS nb,
        |    max(abs(c.ca * t.nb - c.cb * t.na))::BIGINT AS d_star
        |  FROM cum c, tot t)
        |SELECT na, nb, d_star,
        |  (CASE WHEN 10000 * d_star::HUGEINT * d_star
        |          > 18442 * na::HUGEINT * nb * (na + nb)
        |   THEN 1 ELSE 0 END)::INT AS reject
        |FROM ds""".stripMargin,

    "q281_lateral_topn" -> LateralTopnSql("orders"),

    "q282_binseg_changepoint" ->
      s"""WITH $CausalPanelCte,
        |pre AS (
        |  SELECT series, day, v,
        |    row_number() OVER w AS i,
        |    sum(v) OVER w AS cs, sum(v * v) OVER w AS cs2
        |  FROM panel
        |  WINDOW w AS (PARTITION BY series ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT series, count(*)::BIGINT AS n,
        |    sum(v)::BIGINT AS st, sum(v * v)::BIGINT AS qt
        |  FROM panel GROUP BY 1),
        |cand AS (
        |  SELECT p.series, t.n, p.day, p.i,
        |    ((p.i::HUGEINT * p.cs2 - p.cs::HUGEINT * p.cs) * 1000000
        |       // p.i)
        |     + (((t.n - p.i)::HUGEINT * (t.qt - p.cs2)
        |         - (t.st - p.cs)::HUGEINT * (t.st - p.cs)) * 1000000
        |       // (t.n - p.i)) AS cost_micro,
        |    ((t.n::HUGEINT * t.qt - t.st::HUGEINT * t.st) * 1000000
        |       // t.n) AS total_micro
        |  FROM pre p JOIN tot t ON t.series = p.series
        |  WHERE p.i >= 2 AND p.i <= t.n - 2),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY series
        |    ORDER BY cost_micro, i) AS r
        |  FROM cand)
        |SELECT series, n, day AS split_day, cost_micro::BIGINT AS cost_micro,
        |  total_micro::BIGINT AS total_micro,
        |  (total_micro - cost_micro)::BIGINT AS gain_micro
        |FROM rk WHERE r = 1""".stripMargin,

    "q283_periodogram" ->
      s"""WITH $CausalPanelCte,
        |b7 AS (
        |  SELECT series, 7 AS period,
        |    sum(v * (${trigCase("cos", 7)}))::BIGINT AS re,
        |    sum(v * (${trigCase("sin", 7)}))::BIGINT AS im
        |  FROM panel GROUP BY 1),
        |b5 AS (
        |  SELECT series, 5 AS period,
        |    sum(v * (${trigCase("cos", 5)}))::BIGINT AS re,
        |    sum(v * (${trigCase("sin", 5)}))::BIGINT AS im
        |  FROM panel GROUP BY 1),
        |u AS (SELECT * FROM b7 UNION ALL SELECT * FROM b5)
        |SELECT series, period, re, im,
        |  ((re::HUGEINT * re + im::HUGEINT * im)
        |    // 1000000000000)::BIGINT AS power
        |FROM u""".stripMargin,

    "q284_attribution" ->
      s"""WITH ev AS (
        |  SELECT event_id, epoch_us(ts) * 1000 AS tsn, user_id,
        |    event_type
        |  FROM events),
        |purch AS (SELECT user_id, event_id AS pid, tsn AS pts
        |  FROM ev WHERE event_type = 'purchase'),
        |prior AS (SELECT user_id, event_type AS channel,
        |    event_id AS eid, tsn AS ets
        |  FROM ev WHERE event_type <> 'purchase'),
        |j AS MATERIALIZED (
        |  SELECT p.pid, r.channel, r.eid, r.ets,
        |    (CASE age_d ${(0 to 6).map(k =>
             s"WHEN $k THEN ${Math.round(1e6 / Math.pow(2, k))}")
             .mkString(" ")} ELSE 0 END)::BIGINT AS w
        |  FROM purch p JOIN prior r ON r.user_id = p.user_id,
        |  LATERAL (SELECT (p.pts - r.ets) // 86400000000000 AS age_d) a
        |  WHERE r.ets < p.pts AND p.pts - r.ets <= 604800000000000),
        |lastt AS (
        |  SELECT channel, count(*)::BIGINT AS n_last FROM (
        |    SELECT pid, channel,
        |      row_number() OVER (PARTITION BY pid
        |        ORDER BY ets DESC, eid DESC) AS r
        |    FROM j) WHERE r = 1 GROUP BY 1),
        |mass AS (SELECT pid, sum(w)::BIGINT AS m FROM j GROUP BY 1),
        |decay AS (
        |  SELECT j.channel,
        |    sum((j.w * 1000000) // s.m)::BIGINT AS decay_ppm
        |  FROM j JOIN mass s ON s.pid = j.pid GROUP BY 1)
        |SELECT coalesce(d.channel, l.channel) AS channel,
        |  coalesce(l.n_last, 0)::BIGINT AS n_last,
        |  coalesce(d.decay_ppm, 0)::BIGINT AS decay_ppm
        |FROM decay d FULL OUTER JOIN lastt l ON l.channel = d.channel"""
        .stripMargin,

    "q285_repetition_rules" ->
      """WITH pr AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(0, greatest(len(string_split(text, ' ')) - 1, 0)),
        |    i -> array_to_string(list_slice(string_split(text, ' '),
        |      i + 1, i + 2), ' '))) AS pair
        |  FROM documents),
        |bi AS (SELECT doc_id, pair, count(*)::BIGINT AS cnt
        |  FROM pr GROUP BY 1, 2),
        |per AS (
        |  SELECT doc_id, sum(cnt) + 1 AS n_tok,
        |    (2 * max(cnt) * 1000000) // (sum(cnt) + 1) AS cov_ppm,
        |    ((sum(cnt) - count(*)) * 1000000) // sum(cnt) AS dup_ppm
        |  FROM bi GROUP BY 1)
        |SELECT CASE WHEN cov_ppm <= 200000 THEN 1 ELSE 0 END AS keep_cov,
        |  CASE WHEN dup_ppm <= 300000 THEN 1 ELSE 0 END AS keep_dup,
        |  count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS sum_tok
        |FROM per GROUP BY 1, 2""".stripMargin,

    "q286_calibration_ece" ->
      s"""WITH $QualityMarginCtes,
        |lb AS (
        |  SELECT greatest(least(margin // 200, 10), -10) AS bin,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM qmargin),
        |bb AS (SELECT bin, count(*)::BIGINT AS n_b,
        |    sum(pos)::BIGINT AS npos
        |  FROM lb GROUP BY 1)
        |SELECT bin, n_b, ($SigmoidPpmCaseSql)::BIGINT AS conf_ppm,
        |  ((npos * 1000000) // n_b)::BIGINT AS acc_ppm,
        |  (abs((npos * 1000000) // n_b - ($SigmoidPpmCaseSql)) * n_b)
        |    ::BIGINT AS ece_contrib
        |FROM bb""".stripMargin,

    "q287_auc_exact" ->
      s"""WITH $QualityMarginCtes,
        |lb AS (SELECT margin,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM qmargin),
        |byv AS (SELECT margin, count(*)::BIGINT AS t,
        |    sum(pos)::BIGINT AS p
        |  FROM lb GROUP BY 1),
        |grp AS (
        |  SELECT t, p,
        |    coalesce(sum(t) OVER (ORDER BY margin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
        |  FROM byv),
        |ag AS (
        |  SELECT sum(p)::BIGINT AS n_pos, sum(t - p)::BIGINT AS n_neg,
        |    sum(p * (2 * c + t + 1))::BIGINT AS two_sum_rp
        |  FROM grp)
        |SELECT n_pos, n_neg,
        |  (two_sum_rp - n_pos * (n_pos + 1))::BIGINT AS two_u,
        |  (((two_sum_rp - n_pos * (n_pos + 1)) * 1000000)
        |    // (2 * n_pos * n_neg))::BIGINT AS auc_ppm
        |FROM ag""".stripMargin,

    "q288_neyman_sampling" ->
      s"""WITH ev AS (
        |  SELECT event_type, event_id, floor(value * 1e6)::BIGINT AS vm
        |  FROM events),
        |st AS (
        |  SELECT event_type, count(*)::BIGINT AS nh,
        |    sum(vm::HUGEINT) AS sv, sum(vm::HUGEINT * vm) AS sq
        |  FROM ev GROUP BY 1),
        |sg AS (
        |  SELECT event_type, nh,
        |    ((nh * sq - sv * sv) // (nh::HUGEINT * nh))::BIGINT AS varq,
        |    floor(sqrt(((nh * sq - sv * sv)
        |      // (nh::HUGEINT * nh))::DOUBLE))::BIGINT AS s0
        |  FROM st),
        |sh AS (
        |  SELECT event_type, nh, varq,
        |    CASE WHEN (s0 + 1) * (s0 + 1) <= varq THEN s0 + 1
        |    WHEN s0 * s0 > varq THEN s0 - 1 ELSE s0 END AS s_h
        |  FROM sg),
        |wh AS (SELECT event_type, nh, s_h, nh * s_h AS w_h FROM sh),
        |tt AS (SELECT sum(w_h)::BIGINT AS w FROM wh),
        |qta AS (
        |  SELECT wh.*, (1000 * w_h) // t.w AS q0, (1000 * w_h) % t.w
        |    AS rem
        |  FROM wh, tt t),
        |shrt AS (SELECT 1000 - sum(q0) AS left1 FROM qta),
        |alc AS (
        |  SELECT event_type, nh, s_h, w_h,
        |    q0 + (CASE WHEN row_number() OVER
        |      (ORDER BY rem DESC, event_type) <= s.left1
        |      THEN 1 ELSE 0 END) AS alloc
        |  FROM qta, shrt s),
        |drawn AS (
        |  SELECT e.event_type, e.event_id, a.nh, a.s_h, a.alloc,
        |    row_number() OVER (PARTITION BY e.event_type
        |      ORDER BY ${fingerprintSql("e.event_id::VARCHAR")} % 1000000,
        |        e.event_id) AS r
        |  FROM ev e JOIN alc a USING (event_type))
        |SELECT event_type, nh, s_h, alloc,
        |  count(*)::BIGINT AS n_drawn,
        |  sum(event_id)::BIGINT AS drawn_id_sum
        |FROM drawn WHERE r <= alloc
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    "q289_stream_drift_monitor" ->
      """WITH hist AS (
        |  SELECT (epoch_us(ts) // 86400000000) * 86400000000
        |      AS day_start_us,
        |    floor(value * 1e6)::BIGINT // 50000000 AS bin,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |ref AS (SELECT bin, sum(n)::BIGINT AS rn FROM hist GROUP BY 1),
        |spine AS (
        |  SELECT d.day_start_us, r.bin, r.rn
        |  FROM (SELECT DISTINCT day_start_us FROM hist) d, ref r),
        |grid AS (
        |  SELECT s.day_start_us, s.bin, s.rn, coalesce(h.n, 0) AS n
        |  FROM spine s LEFT JOIN hist h
        |    ON h.day_start_us = s.day_start_us AND h.bin = s.bin),
        |cum AS (
        |  SELECT day_start_us, sum(n) OVER w AS cd, sum(rn) OVER w AS cr
        |  FROM grid
        |  WINDOW w AS (PARTITION BY day_start_us ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |nd AS (SELECT day_start_us, sum(n)::BIGINT AS nd
        |  FROM hist GROUP BY 1),
        |tt AS (SELECT sum(n)::BIGINT AS ntot FROM hist),
        |ds AS (
        |  SELECT c.day_start_us, d.nd, t.ntot,
        |    max(abs(c.cd * t.ntot - c.cr * d.nd))::BIGINT AS d_star
        |  FROM cum c JOIN nd d USING (day_start_us), tt t
        |  GROUP BY 1, 2, 3)
        |SELECT day_start_us, nd, d_star,
        |  (CASE WHEN 10000 * d_star::HUGEINT * d_star
        |     > 18442 * nd::HUGEINT * ntot * (nd + ntot)
        |   THEN 1 ELSE 0 END)::INT AS drift
        |FROM ds""".stripMargin,

    "q290_hash_walks" ->
      s"""WITH raw AS MATERIALIZED (
        |  SELECT sn.n_name AS src, cn.n_name AS dst, count(*)::BIGINT AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  GROUP BY 1, 2),
        |el AS (SELECT DISTINCT src, dst FROM raw),
        |n0 AS (SELECT DISTINCT src AS start, src AS cur FROM el),
        |s1 AS (SELECT n.start, coalesce(c.nxt, n.cur) AS hop1
        |  FROM n0 n LEFT JOIN (SELECT start, dst AS nxt FROM (
        |    SELECT n.start, e.dst, row_number() OVER (
        |      PARTITION BY n.start
        |      ORDER BY ${fingerprintSql("'1|' || n.cur || '|' || e.dst")}
        |        % 1000000000, e.dst) AS rk
        |    FROM n0 n JOIN el e ON e.src = n.cur) WHERE rk = 1) c
        |  ON c.start = n.start),
        |s2 AS (SELECT n.start, coalesce(c.nxt, n.hop1) AS hop2
        |  FROM s1 n LEFT JOIN (SELECT start, dst AS nxt FROM (
        |    SELECT n.start, e.dst, row_number() OVER (
        |      PARTITION BY n.start
        |      ORDER BY ${fingerprintSql("'2|' || n.hop1 || '|' || e.dst")}
        |        % 1000000000, e.dst) AS rk
        |    FROM s1 n JOIN el e ON e.src = n.hop1) WHERE rk = 1) c
        |  ON c.start = n.start),
        |s3 AS (SELECT n.start, coalesce(c.nxt, n.hop2) AS hop3
        |  FROM s2 n LEFT JOIN (SELECT start, dst AS nxt FROM (
        |    SELECT n.start, e.dst, row_number() OVER (
        |      PARTITION BY n.start
        |      ORDER BY ${fingerprintSql("'3|' || n.hop2 || '|' || e.dst")}
        |        % 1000000000, e.dst) AS rk
        |    FROM s2 n JOIN el e ON e.src = n.hop2) WHERE rk = 1) c
        |  ON c.start = n.start)
        |SELECT start, hop1, hop2, hop3
        |FROM s1 JOIN s2 USING (start) JOIN s3 USING (start)""".stripMargin,

    "q291_isotonic_minimax" ->
      s"""WITH $CausalPanelCte,
        |pre AS (
        |  SELECT series, day, v, row_number() OVER w AS i,
        |    sum(v) OVER w AS cs
        |  FROM panel
        |  WINDOW w AS (PARTITION BY series ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |js AS (
        |  SELECT series, i + 1 AS j, cs AS csj1 FROM pre
        |  UNION ALL
        |  SELECT series, 1, 0 FROM pre WHERE i = 1),
        |seg AS (
        |  SELECT a.series, a.j, b.i AS k,
        |    ((b.cs - a.csj1) * 1000) // (b.i - a.j + 1) AS avg_micro
        |  FROM js a JOIN pre b
        |    ON b.series = a.series AND a.j <= b.i),
        |mm AS (
        |  SELECT p.series, p.day, p.v, s.j, min(s.avg_micro) AS minv
        |  FROM pre p JOIN seg s
        |    ON s.series = p.series AND s.j <= p.i AND s.k >= p.i
        |  GROUP BY 1, 2, 3, 4)
        |SELECT series, day, v, max(minv)::BIGINT AS fitted_micro
        |FROM mm GROUP BY 1, 2, 3""".stripMargin,

    "q292_kaplan_meier" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type
        |  FROM events),
        |hz AS (SELECT max(day) AS hz FROM ev),
        |us AS (
        |  SELECT user_id, min(day) AS origin,
        |    min(CASE WHEN event_type = 'purchase' THEN day END) AS pday
        |  FROM ev GROUP BY 1),
        |uu AS (
        |  SELECT coalesce(pday - origin, h.hz - origin) AS t,
        |    (pday IS NOT NULL)::INT AS e
        |  FROM us, hz h),
        |tm AS (SELECT t, sum(e)::BIGINT AS d, count(*)::BIGINT AS c
        |  FROM uu GROUP BY 1),
        |tt AS (SELECT count(*)::BIGINT AS ntot FROM uu),
        |risk AS (
        |  SELECT t, d, n_risk FROM (
        |    SELECT t, d, ntot - coalesce(sum(c) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |    FROM tm, tt)
        |  WHERE d > 0),
        |ord AS (SELECT t, d, n_risk,
        |    row_number() OVER (ORDER BY t) AS i
        |  FROM risk),
        |km AS (
        |  SELECT i, t, n_risk, d,
        |    (1000000 * (n_risk - d)) // n_risk AS s_ppm
        |  FROM ord WHERE i = 1
        |  UNION ALL
        |  SELECT o.i, o.t, o.n_risk, o.d,
        |    (k.s_ppm * (o.n_risk - o.d)) // o.n_risk
        |  FROM km k JOIN ord o ON o.i = k.i + 1)
        |SELECT t, n_risk::BIGINT AS n_risk, d, s_ppm::BIGINT AS s_ppm
        |FROM km""".stripMargin,

    "q293_diff_in_diff" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS tu, event_type,
        |    floor(value * 1e6)::BIGINT AS vm
        |  FROM events),
        |piv AS (SELECT min(tu) AS mn, max(tu) AS mx FROM ev),
        |cells AS (
        |  SELECT user_id % 2 AS treat,
        |    (tu * 2 >= mn + mx)::INT AS post,
        |    count(*)::BIGINT AS n, sum(vm)::BIGINT AS sv
        |  FROM ev, piv WHERE event_type = 'purchase' GROUP BY 1, 2),
        |m AS (SELECT treat, post, sv // n AS mean_micro FROM cells)
        |SELECT
        |  max(CASE WHEN treat = 0 AND post = 0 THEN mean_micro END)
        |    ::BIGINT AS m_ctl_pre,
        |  max(CASE WHEN treat = 0 AND post = 1 THEN mean_micro END)
        |    ::BIGINT AS m_ctl_post,
        |  max(CASE WHEN treat = 1 AND post = 0 THEN mean_micro END)
        |    ::BIGINT AS m_treat_pre,
        |  max(CASE WHEN treat = 1 AND post = 1 THEN mean_micro END)
        |    ::BIGINT AS m_treat_post,
        |  ((max(CASE WHEN treat = 1 AND post = 1 THEN mean_micro END)
        |    - max(CASE WHEN treat = 1 AND post = 0 THEN mean_micro END))
        |   - (max(CASE WHEN treat = 0 AND post = 1 THEN mean_micro END)
        |    - max(CASE WHEN treat = 0 AND post = 0 THEN mean_micro END)))
        |    ::BIGINT AS did_micro
        |FROM m""".stripMargin,

    "q294_granger_on_generated" ->
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q294_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |  UNION ALL SELECT 'X2', t, floor(X2 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X3', t, floor(X3 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X4', t, floor(X4 * 1000)::BIGINT FROM gen),
        |${graft.metrics.Causal.grangerSqlCtes("panel")}
        |SELECT cause, effect, n, cyy, rss_r, rss_u, f_gain, granger,
        |  ($GrangerGenTruthCase)::INT AS truth_lag1
        |FROM granger_out""".stripMargin,

    "q295_inclusion_deps" -> Seq(
        ("orders.custkey<customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        ("customer<orders.custkey", "customer", "c_custkey",
          "orders", "o_custkey"),
        ("lineitem.partkey<part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        ("part<lineitem.partkey", "part", "p_partkey",
          "lineitem", "l_partkey"),
        ("lineitem.suppkey<supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        ("customer.nationkey<nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        ("nation.regionkey<region", "nation", "n_regionkey",
          "region", "r_regionkey"),
        ("supplier.suppkey<customer", "supplier", "s_suppkey",
          "customer", "c_custkey")
      ).map { case (nm, ta, ca, tb, cb) =>
        s"""SELECT '$nm' AS candidate, n_distinct, n_missing,
           |  (n_missing = 0)::INT AS holds FROM (
           |  SELECT (SELECT count(DISTINCT $ca) FROM $ta)::BIGINT
           |      AS n_distinct,
           |    (SELECT count(*) FROM (SELECT DISTINCT $ca AS v FROM $ta
           |      EXCEPT SELECT DISTINCT $cb FROM $tb))::BIGINT
           |      AS n_missing)""".stripMargin
      }.mkString("\nUNION ALL\n"),

    "q296_padding_efficiency" ->
      """WITH lens AS (
        |  SELECT len(string_split(text, ' '))::BIGINT AS len
        |  FROM documents),
        |g AS (SELECT count(*)::BIGINT AS n_docs, sum(len)::BIGINT
        |    AS token_sum, max(len)::BIGINT AS mx FROM lens),
        |b AS (SELECT len // 64 AS b, count(*)::BIGINT AS n,
        |    sum(len)::BIGINT AS ts, max(len)::BIGINT AS mx
        |  FROM lens GROUP BY 1),
        |bb AS (SELECT sum(n)::BIGINT AS n_docs, sum(ts)::BIGINT
        |    AS token_sum, sum(n * mx - ts)::BIGINT AS padded_tokens,
        |    sum(n * mx)::BIGINT AS padded_total FROM b)
        |SELECT 'global_max_pad' AS strategy, n_docs, token_sum,
        |  (n_docs * mx - token_sum)::BIGINT AS padded_tokens,
        |  (((n_docs * mx - token_sum) * 1000000) // (n_docs * mx))
        |    ::BIGINT AS waste_ppm
        |FROM g
        |UNION ALL
        |SELECT 'bucket64_pad', n_docs, token_sum, padded_tokens,
        |  ((padded_tokens * 1000000) // padded_total)::BIGINT
        |FROM bb""".stripMargin,

    "q297_group_by_all" -> GroupByAllSql("orders"),

    "q298_sortedness_audit" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    floor(l_quantity * 1e6)::BIGINT AS qty,
        |    l_shipdate AS ship, l_partkey
        |  FROM lineitem),
        |lg AS (
        |  SELECT qty, ship, l_partkey,
        |    lag(qty) OVER w AS pqty, lag(ship) OVER w AS pship,
        |    lag(l_partkey) OVER w AS ppart
        |  FROM li
        |  WINDOW w AS (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, qty, ship))
        |SELECT 'l_shipdate' AS col_name, count(*)::BIGINT AS n_pairs,
        |  ((sum(CASE WHEN ship >= pship THEN 1 ELSE 0 END) * 1000000)
        |    // count(*))::BIGINT AS sorted_ppm,
        |  (sum(CASE WHEN ship <> pship THEN 1 ELSE 0 END) + 1)::BIGINT
        |    AS runs_upper
        |FROM lg WHERE pship IS NOT NULL
        |UNION ALL
        |SELECT 'l_quantity', count(*)::BIGINT,
        |  ((sum(CASE WHEN qty >= pqty THEN 1 ELSE 0 END) * 1000000)
        |    // count(*))::BIGINT,
        |  (sum(CASE WHEN qty <> pqty THEN 1 ELSE 0 END) + 1)::BIGINT
        |FROM lg WHERE pqty IS NOT NULL
        |UNION ALL
        |SELECT 'l_partkey', count(*)::BIGINT,
        |  ((sum(CASE WHEN l_partkey >= ppart THEN 1 ELSE 0 END)
        |    * 1000000) // count(*))::BIGINT,
        |  (sum(CASE WHEN l_partkey <> ppart THEN 1 ELSE 0 END) + 1)
        |    ::BIGINT
        |FROM lg WHERE ppart IS NOT NULL""".stripMargin,

    "q299_group_sequential" ->
      s"""WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    floor(value * 1e6)::BIGINT AS vm
        |  FROM events WHERE event_type = 'purchase'),
        |d0 AS (SELECT min(day) AS d0 FROM ev),
        |lk AS (SELECT unnest([1, 2, 3]) AS k),
        |looks AS (
        |  SELECT l.k AS look,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n0,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT
        |      AS n1,
        |    sum(CASE WHEN user_id % 2 = 0 THEN vm ELSE 0 END)::HUGEINT
        |      AS s0,
        |    sum(CASE WHEN user_id % 2 = 1 THEN vm ELSE 0 END)::HUGEINT
        |      AS s1,
        |    count(*)::HUGEINT AS n, sum(vm)::HUGEINT AS sv,
        |    sum(vm::HUGEINT * vm) AS sq
        |  FROM ev e, d0, lk l
        |  WHERE e.day <= d0.d0 + (l.k * 10 - 1) GROUP BY 1),
        |fin AS (
        |  SELECT look, n0, n1,
        |    (s1 * n0 - s0 * n1)::HUGEINT AS dn,
        |    ((n * sq - sv * sv) // (n * n))::HUGEINT AS vq,
        |    (CASE look WHEN 1 THEN ${ObfBoundBp(0)}
        |     WHEN 2 THEN ${ObfBoundBp(1)}
        |     WHEN 3 THEN ${ObfBoundBp(2)} END)::HUGEINT AS bb
        |  FROM looks)
        |SELECT look, n0, n1, dn::BIGINT AS diff_num, vq::BIGINT AS varq,
        |  bb::BIGINT AS bound_bp,
        |  (CASE WHEN n0 > 0 AND n1 > 0 AND vq > 0
        |     AND 10000 * dn * dn > bb * (n0 + n1)::HUGEINT * n0 * n1 * vq
        |   THEN 1 ELSE 0 END)::INT AS reject
        |FROM fin""".stripMargin,

    "q300_pc_on_generated" ->
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q300_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |  UNION ALL SELECT 'X2', t, floor(X2 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X3', t, floor(X3 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X4', t, floor(X4 * 1000)::BIGINT FROM gen),
        |${graft.metrics.Causal.pcSkeletonSqlCtes("panel")}
        |SELECT a, b, n, cab, keep0, sepset, edge,
        |  ($PcGenTruthCase)::INT AS truth_adj
        |FROM pc_out""".stripMargin,

    "q301_unit_root" ->
      s"""WITH $CausalPanelCte,
        |dl AS (
        |  SELECT series, pv AS x, v - pv AS y FROM (
        |    SELECT series, v,
        |      lag(v) OVER (PARTITION BY series ORDER BY day) AS pv
        |    FROM panel)
        |  WHERE pv IS NOT NULL),
        |sm AS (
        |  SELECT series, count(*)::HUGEINT AS n,
        |    sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
        |    sum(x::HUGEINT * x) AS sxx, sum(x::HUGEINT * y) AS sxy,
        |    sum(y::HUGEINT * y) AS syy
        |  FROM dl GROUP BY 1),
        |cc AS (
        |  SELECT series, n, n*sxx - sx*sx AS cxx,
        |    n*sxy - sx*sy AS cxy, n*syy - sy*sy AS cyy
        |  FROM sm)
        |SELECT series, n::BIGINT AS n, cxx::BIGINT AS cxx,
        |  cxy::BIGINT AS cxy,
        |  (CASE WHEN cxy < 0 AND
        |     100 * (n - 2) * cxy * cxy > 876 * (cxx * cyy - cxy * cxy)
        |   THEN 1 ELSE 0 END)::INT AS stationary
        |FROM cc""".stripMargin,

    "q302_lead_lag_ccf" ->
      s"""WITH $CausalPanelCte,
        |lk AS (SELECT unnest([0, 1, 2, 3]) AS lag_d),
        |lagged AS (
        |  SELECT a.series AS cause, b.series AS effect, l.lag_d,
        |    a.v AS av, b.v AS bv
        |  FROM panel b
        |  JOIN lk l ON true
        |  JOIN panel a
        |    ON a.day + l.lag_d = b.day AND a.series <> b.series),
        |sums AS (
        |  SELECT cause, effect, lag_d, count(*)::HUGEINT AS n,
        |    sum(av)::HUGEINT AS sa, sum(bv)::HUGEINT AS sb,
        |    sum(av::HUGEINT * av) AS saa, sum(av::HUGEINT * bv) AS sab,
        |    sum(bv::HUGEINT * bv) AS sbb
        |  FROM lagged GROUP BY 1, 2, 3),
        |cc AS (
        |  SELECT cause, effect, lag_d, n::BIGINT AS n,
        |    n*saa - sa*sa AS caa, n*sab - sa*sb AS cab,
        |    n*sbb - sb*sb AS cbb
        |  FROM sums),
        |fin AS (
        |  SELECT cause, effect, lag_d, n,
        |    (CASE WHEN caa = 0 OR cbb = 0 THEN 0
        |     ELSE (cab * cab * 10000) // (caa * cbb) END)::BIGINT
        |      AS corr_bp,
        |    (CASE WHEN cab < 0 THEN -1 ELSE 1 END)::INT AS sign
        |  FROM cc)
        |SELECT cause, effect, lag_d, n, corr_bp, sign,
        |  (row_number() OVER (PARTITION BY cause, effect
        |    ORDER BY corr_bp DESC, lag_d) = 1)::INT AS is_best
        |FROM fin""".stripMargin,

    "q303_ewma_chart" ->
      s"""WITH RECURSIVE $CausalPanelCte,
        |ix AS (SELECT series, day, v,
        |    row_number() OVER (PARTITION BY series ORDER BY day) AS i
        |  FROM panel),
        |ew AS (
        |  SELECT series, i, day, v::BIGINT AS z FROM ix WHERE i = 1
        |  UNION ALL
        |  SELECT x.series, x.i, x.day, (20 * x.v + 80 * e.z) // 100
        |  FROM ew e JOIN ix x ON x.series = e.series AND x.i = e.i + 1),
        |st AS (SELECT series, count(*)::HUGEINT AS n,
        |    sum(v)::HUGEINT AS sv, sum(v::HUGEINT * v) AS sq
        |  FROM panel GROUP BY 1),
        |mu AS (SELECT series, (sv // n)::BIGINT AS mu,
        |    ((n * sq - sv * sv) // (n * n))::BIGINT AS varq
        |  FROM st)
        |SELECT e.series, e.day, e.z AS z_milli,
        |  (CASE WHEN (e.z - m.mu) * (e.z - m.mu) > m.varq
        |   THEN 1 ELSE 0 END)::INT AS breach
        |FROM ew e JOIN mu m ON m.series = e.series""".stripMargin,

    "q304_png_metadata" ->
      """SELECT source AS src, count(*)::BIGINT AS n_docs,
        |  sum(doc_id)::BIGINT AS id_sum,
        |  sum((16 + doc_id % 16) * (12 + doc_id % 8))::BIGINT
        |    AS pixel_sum,
        |  count(DISTINCT lang)::BIGINT AS n_langs
        |FROM documents GROUP BY 1""".stripMargin,

    "q309_embedding_outliers" ->
      """WITH vecs AS (
        |  SELECT vec_id, label, u.d AS dim,
        |    floor(embedding[u.d + 1] * 1e6)::BIGINT AS m
        |  FROM embeddings,
        |  LATERAL (SELECT unnest(range(0, 64)) AS d) u),
        |cent AS (SELECT label, dim, count(*)::BIGINT AS n,
        |    sum(m)::BIGINT AS sm
        |  FROM vecs GROUP BY 1, 2),
        |d2 AS (
        |  SELECT v.vec_id, v.label,
        |    sum((c.n * v.m - c.sm)::HUGEINT * (c.n * v.m - c.sm))
        |      // (max(c.n)::HUGEINT * max(c.n)) AS d2
        |  FROM vecs v JOIN cent c
        |    ON c.label = v.label AND c.dim = v.dim
        |  GROUP BY 1, 2),
        |sv AS (
        |  SELECT label, count(*)::BIGINT AS nv,
        |    (sum(d2) // count(*))::BIGINT AS mu_d2,
        |    (count(*)::HUGEINT * sum(d2::HUGEINT * d2)
        |       - sum(d2)::HUGEINT * sum(d2))
        |     // (count(*)::HUGEINT * count(*)) AS varq
        |  FROM d2 GROUP BY 1),
        |sg AS (
        |  SELECT label, nv, mu_d2, varq,
        |    floor(sqrt(varq::DOUBLE))::BIGINT AS s0
        |  FROM sv),
        |st AS (
        |  SELECT label, nv, mu_d2,
        |    (CASE WHEN (s0 + 1)::HUGEINT * (s0 + 1) <= varq THEN s0 + 1
        |     WHEN s0::HUGEINT * s0 > varq THEN s0 - 1
        |     ELSE s0 END)::BIGINT AS sig_d2
        |  FROM sg)
        |SELECT d.label, s.nv, s.mu_d2, s.sig_d2,
        |  sum(CASE WHEN d.d2 > s.mu_d2 + 2 * s.sig_d2
        |    THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        |FROM d2 d JOIN st s ON s.label = d.label
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    "q311_sax_similarity" ->
      s"""WITH $CausalPanelCte,
        |mm AS (SELECT series, min(v) AS mn, max(v) AS mx
        |  FROM panel GROUP BY 1),
        |sym AS (
        |  SELECT p.series, p.day,
        |    chr((97 + (((p.v - m.mn) * 8) // (m.mx - m.mn + 1)))::INT)
        |      AS sym
        |  FROM panel p JOIN mm m USING (series)),
        |words AS (
        |  SELECT series, string_agg(sym, '' ORDER BY day) AS word
        |  FROM sym GROUP BY 1)
        |SELECT a.series AS a, b.series AS b,
        |  length(a.word)::BIGINT AS len_a,
        |  levenshtein(a.word, b.word)::BIGINT AS dist,
        |  ((levenshtein(a.word, b.word)::BIGINT * 1000000)
        |   // greatest(length(a.word), length(b.word)))::BIGINT
        |    AS dist_ppm
        |FROM words a JOIN words b ON a.series < b.series""".stripMargin,

    "q312_structure_parse_census" ->
      """WITH f AS (
        |  SELECT content
        |  FROM read_text('/root/reference/Datasets/**/*.txt')
        |  WHERE filename NOT LIKE '%_statistics.txt'),
        |ln AS (
        |  SELECT trim(unnest(string_split(content, chr(10)))) AS line
        |  FROM f),
        |ar AS (
        |  SELECT regexp_extract(line,
        |      '^(\S+) --\((\w+), lag=(\d+)\)--> ([^:]+): (-?[0-9.]+)$', 2)
        |      AS func,
        |    regexp_extract(line,
        |      '^(\S+) --\((\w+), lag=(\d+)\)--> ([^:]+): (-?[0-9.]+)$', 3)
        |      ::BIGINT AS lag,
        |    regexp_extract(line,
        |      '^(\S+) --\((\w+), lag=(\d+)\)--> ([^:]+): (-?[0-9.]+)$', 1)
        |      AS src,
        |    trim(regexp_extract(line,
        |      '^(\S+) --\((\w+), lag=(\d+)\)--> ([^:]+): (-?[0-9.]+)$', 4))
        |      AS tgt,
        |    regexp_extract(line,
        |      '^(\S+) --\((\w+), lag=(\d+)\)--> ([^:]+): (-?[0-9.]+)$', 5)
        |      ::DOUBLE AS coef
        |  FROM ln WHERE regexp_matches(line,
        |    '^(\S+) --\((\w+), lag=(\d+)\)--> ([^:]+): (-?[0-9.]+)$')),
        |qt AS (
        |  SELECT 'linear' AS func,
        |    abs(regexp_extract(line,
        |      '^\(''([^'']+)'', (-?\d+), ''([^'']+)''\) => (-?[0-9.]+)$', 2)
        |      ::BIGINT) AS lag,
        |    trim(regexp_extract(line,
        |      '^\(''([^'']+)'', (-?\d+), ''([^'']+)''\) => (-?[0-9.]+)$', 1))
        |      AS src,
        |    trim(regexp_extract(line,
        |      '^\(''([^'']+)'', (-?\d+), ''([^'']+)''\) => (-?[0-9.]+)$', 3))
        |      AS tgt,
        |    regexp_extract(line,
        |      '^\(''([^'']+)'', (-?\d+), ''([^'']+)''\) => (-?[0-9.]+)$', 4)
        |      ::DOUBLE AS coef
        |  FROM ln WHERE regexp_matches(line,
        |    '^\(''([^'']+)'', (-?\d+), ''([^'']+)''\) => (-?[0-9.]+)$')),
        |bc AS (
        |  SELECT 'linear' AS func,
        |    abs(regexp_extract(line,
        |      '^\(([^,]+), (-?\d+), ([^)]+)\) => (-?[0-9.]+) \[base coefficient\]$',
        |      2)::BIGINT) AS lag,
        |    trim(regexp_extract(line,
        |      '^\(([^,]+), (-?\d+), ([^)]+)\) => (-?[0-9.]+) \[base coefficient\]$',
        |      1)) AS src,
        |    trim(regexp_extract(line,
        |      '^\(([^,]+), (-?\d+), ([^)]+)\) => (-?[0-9.]+) \[base coefficient\]$',
        |      3)) AS tgt,
        |    regexp_extract(line,
        |      '^\(([^,]+), (-?\d+), ([^)]+)\) => (-?[0-9.]+) \[base coefficient\]$',
        |      4)::DOUBLE AS coef
        |  FROM ln WHERE regexp_matches(line,
        |    '^\(([^,]+), (-?\d+), ([^)]+)\) => (-?[0-9.]+) \[base coefficient\]$')),
        |pl AS (
        |  SELECT 'linear' AS func,
        |    abs(regexp_extract(line,
        |      '^\(([^,]+), (-?\d+), ([^)]+)\) => (-?[0-9.]+)$', 2)::BIGINT)
        |      AS lag,
        |    trim(regexp_extract(line,
        |      '^\(([^,]+), (-?\d+), ([^)]+)\) => (-?[0-9.]+)$', 1)) AS src,
        |    trim(regexp_extract(line,
        |      '^\(([^,]+), (-?\d+), ([^)]+)\) => (-?[0-9.]+)$', 3)) AS tgt,
        |    regexp_extract(line,
        |      '^\(([^,]+), (-?\d+), ([^)]+)\) => (-?[0-9.]+)$', 4)::DOUBLE
        |      AS coef
        |  FROM ln WHERE regexp_matches(line,
        |      '^\(([^,]+), (-?\d+), ([^)]+)\) => (-?[0-9.]+)$')
        |    AND NOT regexp_matches(line,
        |      '^\(''([^'']+)'', (-?\d+), ''([^'']+)''\) => (-?[0-9.]+)$')),
        |u AS (
        |  SELECT * FROM ar UNION ALL SELECT * FROM qt
        |  UNION ALL SELECT * FROM bc UNION ALL SELECT * FROM pl),
        |norm AS (
        |  SELECT func, lag,
        |    CASE WHEN regexp_matches(src, '^[0-9]+$') THEN 'X' || src
        |      ELSE src END AS src,
        |    CASE WHEN regexp_matches(tgt, '^[0-9]+$') THEN 'X' || tgt
        |      ELSE tgt END AS tgt,
        |    coef
        |  FROM u)
        |SELECT func, lag, count(*)::BIGINT AS n_links,
        |  sum(floor(coef * 1e6 + 0.5)::BIGINT)::BIGINT AS sum_coef_micro,
        |  count(DISTINCT src)::BIGINT AS n_sources,
        |  count(DISTINCT tgt)::BIGINT AS n_targets
        |FROM norm GROUP BY 1, 2""".stripMargin,

    "q315_shd_panel_scale" ->
      s"""WITH gs AS (SELECT unnest(range(0, 1200))::BIGINT AS g),
        |ed AS (SELECT * FROM (VALUES $ShdPanelEdgesSqlValues)
        |  AS t(idx, source, lag, target)),
        |ta AS (SELECT g, source, target, lag FROM gs, ed),
        |keep AS (SELECT g, idx, source, lag, target FROM gs, ed
        |  WHERE (g + 3 * idx) % 5 <> 0),
        |fl AS (
        |  SELECT g,
        |    CASE WHEN (g + idx) % 7 = 1 THEN target ELSE source END
        |      AS source,
        |    CASE WHEN (g + idx) % 7 = 1 THEN source ELSE target END
        |      AS target,
        |    lag
        |  FROM keep),
        |sp AS (
        |  SELECT g, 'X' || ((g + idx) % 4 + 1) AS source,
        |    'X' || ((g + idx) % 4 + 1) AS target, 0 AS lag
        |  FROM gs, ed WHERE (g + idx) % 11 = 2),
        |pred AS (SELECT DISTINCT * FROM (
        |  SELECT g, source, target, lag FROM fl
        |  UNION ALL SELECT g, source, target, lag FROM sp)),
        |tc AS (
        |  SELECT g, least(source, target) AS u, greatest(source, target)
        |      AS v, lag,
        |    max(CASE WHEN source <= target THEN 1 ELSE 0 END) AS t_fwd,
        |    max(CASE WHEN source > target THEN 1 ELSE 0 END) AS t_rev
        |  FROM ta GROUP BY 1, 2, 3, 4),
        |pc AS (
        |  SELECT g, least(source, target) AS u, greatest(source, target)
        |      AS v, lag,
        |    max(CASE WHEN source <= target THEN 1 ELSE 0 END) AS p_fwd,
        |    max(CASE WHEN source > target THEN 1 ELSE 0 END) AS p_rev
        |  FROM pred GROUP BY 1, 2, 3, 4),
        |j AS (
        |  SELECT coalesce(tc.g, pc.g) AS g,
        |    coalesce(t_fwd, 0) AS t_fwd, coalesce(t_rev, 0) AS t_rev,
        |    coalesce(p_fwd, 0) AS p_fwd, coalesce(p_rev, 0) AS p_rev
        |  FROM tc FULL OUTER JOIN pc
        |    ON tc.g = pc.g AND tc.u = pc.u AND tc.v = pc.v
        |      AND tc.lag = pc.lag),
        |sc AS (
        |  SELECT g,
        |    sum(t_fwd * p_fwd + t_rev * p_rev)::BIGINT AS tp,
        |    sum(p_fwd * (1 - t_fwd) + p_rev * (1 - t_rev))::BIGINT AS fp,
        |    sum(t_fwd * (1 - p_fwd) + t_rev * (1 - p_rev))::BIGINT AS fn,
        |    sum(CASE WHEN t_fwd + t_rev = 1 AND p_fwd + p_rev = 1
        |          AND t_fwd <> p_fwd THEN 1
        |        ELSE abs(t_fwd - p_fwd) + abs(t_rev - p_rev) END)::BIGINT
        |      AS shd_structural
        |  FROM j GROUP BY 1)
        |SELECT g AS graph_id, tp, fp, fn,
        |  ($ShdPanelTotalCells - tp - fp - fn)::BIGINT AS tn,
        |  (fp + fn)::BIGINT AS shd_xor, shd_structural
        |FROM sc""".stripMargin,

    "q317_pca_power_iteration" ->
      s"""WITH $PcaSqlCtes
        |SELECT dim::BIGINT AS dim, w::BIGINT AS w_ppm FROM w$PcaIters"""
        .stripMargin,

    "q331_embedding_covariance" ->
      s"""WITH $PcaSqlCtes
        |SELECT c.da::BIGINT AS da, c.db::BIGINT AS db,
        |  (c.c // (n.n * n.n))::BIGINT AS cov_n2
        |FROM cov c, nn n""".stripMargin,

    "q335_pca_spectrum" ->
      s"""WITH $PcaSqlCtes,
        |sp_cells AS (
        |  SELECT c.da, c.db, c.c // (n.n * n.n) AS cn2
        |  FROM cov c, nn n),
        |sp_rq AS (
        |  SELECT sum(cl.cn2 * wa.w * wb.w) AS num
        |  FROM sp_cells cl
        |  JOIN w$PcaIters wa ON wa.dim = cl.da
        |  JOIN w$PcaIters wb ON wb.dim = cl.db),
        |sp_den AS (SELECT sum(w * w) AS den FROM w$PcaIters),
        |sp_tr AS (
        |  SELECT sum(cn2) AS trace_n2 FROM sp_cells WHERE da = db)
        |SELECT t.trace_n2::BIGINT AS trace_n2,
        |  (r.num // d.den)::BIGINT AS lambda1_n2,
        |  (CASE WHEN t.trace_n2 = 0 THEN 0
        |    ELSE (1000 * (r.num // d.den)) // t.trace_n2 END)::BIGINT
        |    AS explained_permille
        |FROM sp_rq r, sp_den d, sp_tr t""".stripMargin,

    "q332_pc_orientation_scored" ->
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q332_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |  UNION ALL SELECT 'X2', t, floor(X2 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X3', t, floor(X3 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X4', t, floor(X4 * 1000)::BIGINT FROM gen),
        |${graft.metrics.Causal.pcSkeletonSqlCtes("panel", PcOrientTauSqBp)},
        |${graft.metrics.Causal.pcOrientSqlCtes(PcMeekRounds)},
        |${pcScoringSqlTail(PcMeekRounds, pcDirectedTruthValuesSql)}""".stripMargin,

    "q336_pc_order2_scored" ->
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q336_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |  UNION ALL SELECT 'X2', t, floor(X2 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X3', t, floor(X3 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X4', t, floor(X4 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X5', t, floor(X5 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X6', t, floor(X6 * 1000)::BIGINT FROM gen),
        |${graft.metrics.Causal.pcSkeleton2SqlCtes("panel", Pc2TauSqBp)}
        |SELECT a, b, edge::INT AS edge, sepset, sepset2,
        |  edge2::INT AS edge2, ($PcTruth6Case)::INT AS truth_adj
        |FROM pc2_out""".stripMargin,

    "q337_pc_order2_oriented" ->
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q336_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |  UNION ALL SELECT 'X2', t, floor(X2 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X3', t, floor(X3 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X4', t, floor(X4 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X5', t, floor(X5 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X6', t, floor(X6 * 1000)::BIGINT FROM gen),
        |${graft.metrics.Causal.pcSkeleton2SqlCtes("panel", Pc2TauSqBp)},
        |${graft.metrics.Causal.pcOrient2SqlCtes(PcMeekRounds2)},
        |${pcScoringSqlTail(PcMeekRounds2, pcTruthValuesSql(PcDirectedTruth6))}""".stripMargin,

    "q333_shipped_tree_scored" ->
      s"""WITH $shippedD3TreeCsvCte,
        |$shippedD3TreeGrangerSqlCtes,
        |st_pred AS (
        |  SELECT split_part(cause, '|', 1) AS graphId,
        |    split_part(cause, '|', 2) AS source,
        |    split_part(effect, '|', 2) AS target
        |  FROM granger_out WHERE granger = 1),
        |st_truth AS (SELECT * FROM $shippedD3TreeTruthValuesSql),
        |${scoreByGraphSqlCtes()}
        |SELECT g AS cfg, tp::BIGINT AS tp, fp::BIGINT AS fp,
        |  fn::BIGINT AS fn, shd_structural::BIGINT AS shd_structural,
        |  (fp + fn)::BIGINT AS shd_xor,
        |  (CASE WHEN tp + fn = 0 THEN 0
        |    ELSE (1000 * tp) // (tp + fn) END)::BIGINT AS tpr_permille,
        |  (CASE WHEN tp + fp = 0 THEN 0
        |    ELSE (1000 * fp) // (tp + fp) END)::BIGINT AS fdr_permille
        |FROM st_sc""".stripMargin,

    "q334_granger_multilag_irregular" ->
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q334_gen/*.parquet')),
        |sp AS (SELECT t, "time" AS ts FROM gen),
        |${graft.ops.Lagged.nearestLagIndexSqlCtes("sp", "ts",
          lagMult = 1, sfx = "1", outCol = "li1", materialized = true)},
        |${graft.ops.Lagged.nearestLagIndexSqlCtes("sp", "ts",
          lagMult = 2, sfx = "2", outCol = "li2", materialized = true)},
        |pan AS MATERIALIZED (
        |  SELECT 'X1' AS series, t, floor(X1 * 100)::BIGINT AS v
        |  FROM gen
        |  UNION ALL SELECT 'X2', t, floor(X2 * 100)::BIGINT FROM gen
        |  UNION ALL SELECT 'X3', t, floor(X3 * 100)::BIGINT FROM gen
        |  UNION ALL SELECT 'X4', t, floor(X4 * 100)::BIGINT FROM gen),
        |gl AS (
        |  SELECT cq1.series AS cause, e.series AS effect, e.v AS y,
        |    ep1.v AS p1, ep2.v AS p2,
        |    cq1.v * cq1.v AS q1, cq2.v * cq2.v AS q2
        |  FROM lx1
        |  JOIN lx2 ON lx2.t = lx1.t
        |  JOIN pan e ON e.t = lx1.t
        |  JOIN pan ep1 ON ep1.series = e.series AND ep1.t = lx1.li1
        |  JOIN pan ep2 ON ep2.series = e.series AND ep2.t = lx2.li2
        |  JOIN pan cq1 ON cq1.t = lx1.li1
        |  JOIN pan cq2 ON cq2.series = cq1.series AND cq2.t = lx2.li2
        |  WHERE cq1.series <> e.series),
        |${graft.metrics.Causal.grangerMultiDecideSqlCtes("gl", 2, 300L)}
        |SELECT cause, effect, n, cyy, rss_r, rss_u, f_gain, granger,
        |  (${grangerTruthCaseAnyLag("B2", 4, 2)})::INT AS truth_any
        |FROM granger_ml_out""".stripMargin,

    "q318_pca_projection_census" ->
      s"""WITH $PcaSqlCtes,
        |proj AS (
        |  SELECT v.vec_id, sum(v.m * w.w::BIGINT)::BIGINT AS p
        |  FROM vm v JOIN w$PcaIters w ON w.dim = v.dim
        |  GROUP BY 1)
        |SELECT p // 100000000000 AS bin, count(*)::BIGINT AS n_vecs,
        |  (sum(p) // count(*))::BIGINT AS mean_proj_trunc,
        |  min(p)::BIGINT AS min_proj, max(p)::BIGINT AS max_proj
        |FROM proj GROUP BY 1""".stripMargin,

    "q321_theil_sen" ->
      s"""WITH $CausalPanelCte,
        |sl AS (
        |  SELECT a.series,
        |    ((b.v - a.v) * 1000000) // (b.day - a.day) AS sl
        |  FROM panel a JOIN panel b
        |    ON b.series = a.series AND a.day < b.day),
        |rk AS (
        |  SELECT series, sl,
        |    row_number() OVER (PARTITION BY series ORDER BY sl) AS rk,
        |    count(*) OVER (PARTITION BY series) AS n
        |  FROM sl)
        |SELECT series, n::BIGINT AS n_pairs,
        |  sl::BIGINT AS median_slope_micro, sign(sl)::BIGINT AS trend_sign
        |FROM rk WHERE rk = (n + 1) // 2""".stripMargin,

    "q329_pc_confounded" ->
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q329_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |  UNION ALL SELECT 'X2', t, floor(X2 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X3', t, floor(X3 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X4', t, floor(X4 * 1000)::BIGINT FROM gen),
        |${graft.metrics.Causal.pcSkeletonSqlCtes("panel")}
        |SELECT a, b, n, cab, keep0, sepset, edge,
        |  (${pcTruthCase("A1C")})::INT AS truth_adj
        |FROM pc_out""".stripMargin,

    "q330_granger_multilag" ->
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q330_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |  UNION ALL SELECT 'X2', t, floor(X2 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X3', t, floor(X3 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X4', t, floor(X4 * 1000)::BIGINT FROM gen),
        |${graft.metrics.Causal.grangerMultiSqlCtes("panel", 4)}
        |SELECT cause, effect, n, cyy, rss_r, rss_u, f_gain, granger,
        |  (${grangerTruthCaseAnyLag("A1", 4, 4)})::INT AS truth_any
        |FROM granger_ml_out""".stripMargin,

    "q328_nelson_aalen" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type
        |  FROM events),
        |hz AS (SELECT max(day) AS hz FROM ev),
        |us AS (
        |  SELECT user_id, min(day) AS origin,
        |    min(CASE WHEN event_type = 'purchase' THEN day END) AS pday
        |  FROM ev GROUP BY 1),
        |uu AS (
        |  SELECT coalesce(pday - origin, h.hz - origin) AS t,
        |    (pday IS NOT NULL)::INT AS e
        |  FROM us, hz h),
        |tm AS (SELECT t, sum(e)::BIGINT AS d, count(*)::BIGINT AS c
        |  FROM uu GROUP BY 1),
        |tt AS (SELECT count(*)::BIGINT AS ntot FROM uu),
        |risk AS (
        |  SELECT t, d,
        |    (ntot - coalesce(sum(c) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |      ::BIGINT AS n_risk
        |  FROM tm, tt)
        |SELECT t, n_risk, d,
        |  (sum((d * 1000000) // n_risk) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
        |    AS cum_hazard_ppm
        |FROM risk WHERE d > 0""".stripMargin,

    "q327_kruskal_wallis" ->
      s"""WITH $CausalPanelCte,
        |rk AS (
        |  SELECT series,
        |    row_number() OVER (ORDER BY v, series, day)::BIGINT AS r
        |  FROM panel),
        |g AS (SELECT series, count(*)::BIGINT AS n_g,
        |    sum(r)::BIGINT AS r_g
        |  FROM rk GROUP BY 1),
        |agg AS (
        |  SELECT sum(n_g)::BIGINT AS n, count(*)::BIGINT AS k,
        |    sum((r_g * r_g) // n_g)::BIGINT AS t_sum
        |  FROM g)
        |SELECT n AS n_days, k AS k_groups, t_sum,
        |  (CASE WHEN
        |     1000 * (12 * t_sum - 3 * (n + 1) * (n + 1) * n)
        |     > 9488 * n * (n + 1)
        |   THEN 1 ELSE 0 END)::INT AS distributions_differ
        |FROM agg""".stripMargin,

    "q326_anova_oneway" ->
      s"""WITH $CausalPanelCte,
        |g AS (
        |  SELECT series, count(*)::HUGEINT AS n_g,
        |    sum(v)::HUGEINT AS s_g, sum(v::HUGEINT * v) AS q_g
        |  FROM panel GROUP BY 1),
        |tt AS (SELECT sum(n_g) AS n, sum(s_g) AS s, count(*)::HUGEINT AS k
        |  FROM g),
        |terms AS (
        |  SELECT ((s_g * n - s * n_g) * (s_g * n - s * n_g)) // n_g
        |      AS b_g,
        |    (n_g * q_g - s_g * s_g) // n_g AS w_g,
        |    n, k
        |  FROM g, tt)
        |SELECT max(n)::BIGINT AS n_days, max(k)::BIGINT AS k_groups,
        |  (sum(b_g) // max(n))::BIGINT AS ssb_n,
        |  sum(w_g)::BIGINT AS ssw,
        |  (CASE WHEN sum(w_g) > 0 AND
        |     1000 * (max(n) - max(k)) * (sum(b_g) // max(n))
        |     > 2372 * (max(k) - 1) * sum(w_g) * max(n)
        |   THEN 1 ELSE 0 END)::INT AS means_differ
        |FROM terms""".stripMargin,

    "q325_granger_on_shipped" ->
      s"""WITH csv AS (
        |  SELECT X1, X2, X3, X4, "time",
        |    row_number() OVER (ORDER BY "time") - 1 AS t
        |  FROM read_csv('$ShippedD3Base${"_missing.csv"}', header=true,
        |    columns={'X1': 'DOUBLE', 'X2': 'DOUBLE', 'X3': 'DOUBLE',
        |      'X4': 'DOUBLE', 'time': 'DOUBLE'})),
        |${graft.ops.Lagged.nearestLagIndexSqlCtes("csv", "\"time\"")},
        |pan AS (
        |  SELECT 'X1' AS series, t, floor(X1 * 1000)::BIGINT AS v
        |  FROM csv WHERE X1 IS NOT NULL
        |  UNION ALL SELECT 'X2', t, floor(X2 * 1000)::BIGINT FROM csv
        |  WHERE X2 IS NOT NULL
        |  UNION ALL SELECT 'X3', t, floor(X3 * 1000)::BIGINT FROM csv
        |  WHERE X3 IS NOT NULL
        |  UNION ALL SELECT 'X4', t, floor(X4 * 1000)::BIGINT FROM csv
        |  WHERE X4 IS NOT NULL),
        |gl AS (
        |  SELECT cp.series AS cause, e.series AS effect,
        |    e.v AS yv, ep.v AS pv, cp.v AS qv
        |  FROM lx
        |  JOIN pan e ON e.t = lx.t
        |  JOIN pan ep ON ep.t = lx.lag_idx AND ep.series = e.series
        |  JOIN pan cp ON cp.t = lx.lag_idx AND cp.series <> e.series),
        |${graft.metrics.Causal.grangerDecideSqlCtes("gl")}
        |SELECT cause, effect, n, cyy, rss_r, rss_u, f_gain, granger,
        |  ($ShippedD3TruthCase)::INT AS truth_lag1
        |FROM granger_out""".stripMargin,

    "q338_pc_on_shipped" ->
      s"""WITH $shippedD3PanelCtes,
        |${graft.metrics.Causal.pcSkeletonSqlCtes("panel")}
        |SELECT a, b, n, cab, keep0, sepset, edge,
        |  ($ShippedD3AdjCase)::INT AS truth_adj
        |FROM pc_out""".stripMargin,

    "q339_pc_oriented_on_shipped" ->
      s"""WITH $shippedD3PanelCtes,
        |${graft.metrics.Causal.pcSkeletonSqlCtes("panel")},
        |${graft.metrics.Causal.pcOrientSqlCtes(PcMeekRounds)},
        |${pcScoringSqlTail(PcMeekRounds, pcTruthValuesSql(ShippedD3DirectedTruth))}""".stripMargin,

    "q340_pc_corpus_sweep" ->
      s"""WITH $shippedD3TreeCsvCte,
        |$shippedD3TreePcFoldSqlCtes,
        |${graft.metrics.Causal.pcOrientSqlCtes(PcMeekRounds)},
        |st_pred AS (
        |  SELECT split_part(a, '|', 1) AS graphId,
        |    split_part(a, '|', 2) AS source, split_part(b, '|', 2) AS target
        |  FROM pc_st$PcMeekRounds WHERE dir = 1
        |  UNION ALL SELECT split_part(a, '|', 1), split_part(b, '|', 2),
        |    split_part(a, '|', 2) FROM pc_st$PcMeekRounds WHERE dir = 2
        |  UNION ALL SELECT split_part(a, '|', 1), split_part(a, '|', 2),
        |    split_part(b, '|', 2) FROM pc_st$PcMeekRounds WHERE dir = 0
        |  UNION ALL SELECT split_part(a, '|', 1), split_part(b, '|', 2),
        |    split_part(a, '|', 2) FROM pc_st$PcMeekRounds WHERE dir = 0),
        |st_truth AS (SELECT * FROM $shippedD3TreeDirectedTruthValuesSql),
        |st_cnt AS (
        |  SELECT split_part(a, '|', 1) AS g, count(*) AS n_edges,
        |    sum(CASE WHEN dir <> 0 THEN 1 ELSE 0 END) AS n_directed
        |  FROM pc_st$PcMeekRounds GROUP BY 1),
        |${scoreByGraphSqlCtes()}
        |SELECT s.g AS cfg,
        |  coalesce(c.n_edges, 0)::BIGINT AS n_edges,
        |  coalesce(c.n_directed, 0)::BIGINT AS n_directed,
        |  s.tp::BIGINT AS tp, s.fp::BIGINT AS fp, s.fn::BIGINT AS fn,
        |  s.shd_structural::BIGINT AS shd_structural,
        |  (s.fp + s.fn)::BIGINT AS shd_xor,
        |  (CASE WHEN s.tp + s.fn = 0 THEN 0
        |    ELSE (1000 * s.tp) // (s.tp + s.fn) END)::BIGINT AS tpr_permille,
        |  (CASE WHEN s.tp + s.fp = 0 THEN 0
        |    ELSE (1000 * s.fp) // (s.tp + s.fp) END)::BIGINT AS fdr_permille
        |FROM st_sc s LEFT JOIN st_cnt c ON c.g = s.g""".stripMargin,

    "q341_method_agreement" ->
      s"""WITH $shippedD3TreeCsvCte,
        |$shippedD3TreeGrangerSqlCtes,
        |$shippedD3TreePcFoldSqlCtes,
        |gp AS MATERIALIZED (
        |  SELECT DISTINCT split_part(cause, '|', 1) AS cfg,
        |    least(split_part(cause, '|', 2),
        |      split_part(effect, '|', 2)) AS u,
        |    greatest(split_part(cause, '|', 2),
        |      split_part(effect, '|', 2)) AS v
        |  FROM granger_out WHERE granger = 1),
        |pp AS MATERIALIZED (
        |  SELECT split_part(a, '|', 1) AS cfg,
        |    split_part(a, '|', 2) AS u, split_part(b, '|', 2) AS v
        |  FROM pc_out WHERE edge = 1),
        |jj AS (
        |  SELECT coalesce(g.cfg, p.cfg) AS cfg,
        |    CASE WHEN g.cfg IS NOT NULL THEN 1 ELSE 0 END AS gf,
        |    CASE WHEN p.cfg IS NOT NULL THEN 1 ELSE 0 END AS pf
        |  FROM gp g FULL JOIN pp p
        |    ON p.cfg = g.cfg AND p.u = g.u AND p.v = g.v),
        |ag AS (
        |  SELECT cfg, sum(gf) AS n_granger, sum(pf) AS n_pc,
        |    sum(gf * pf) AS n_both, count(*) AS n_union
        |  FROM jj GROUP BY 1)
        |SELECT c.cfg,
        |  coalesce(n_granger, 0)::BIGINT AS n_granger,
        |  coalesce(n_pc, 0)::BIGINT AS n_pc,
        |  coalesce(n_both, 0)::BIGINT AS n_both,
        |  coalesce(n_union, 0)::BIGINT AS n_union,
        |  (CASE WHEN coalesce(n_union, 0) = 0 THEN 0
        |    ELSE (1000 * n_both) // n_union END)::BIGINT AS jaccard_permille
        |FROM (SELECT DISTINCT cfg FROM csv) c
        |LEFT JOIN ag ON ag.cfg = c.cfg""".stripMargin,

    "q343_pc_edge_support" ->
      s"""WITH csvf AS (
        |  SELECT X1, X2, X3, X4,
        |    row_number() OVER (ORDER BY "time") - 1 AS t
        |  FROM read_csv('$ShippedD3Base${"_missing.csv"}', header=true,
        |    columns={'X1': 'DOUBLE', 'X2': 'DOUBLE', 'X3': 'DOUBLE',
        |      'X4': 'DOUBLE', 'time': 'DOUBLE'})),
        |panel AS (
        |  SELECT (t // 200)::VARCHAR || '|X1' AS series,
        |    (t // 200)::VARCHAR || '|' ||
        |      lpad((t % 200)::VARCHAR, 3, '0') AS day,
        |    floor(X1 * 1000)::BIGINT AS v
        |  FROM csvf WHERE X1 IS NOT NULL
        |  UNION ALL
        |  SELECT (t // 200)::VARCHAR || '|X2', (t // 200)::VARCHAR ||
        |    '|' || lpad((t % 200)::VARCHAR, 3, '0'),
        |    floor(X2 * 1000)::BIGINT FROM csvf WHERE X2 IS NOT NULL
        |  UNION ALL
        |  SELECT (t // 200)::VARCHAR || '|X3', (t // 200)::VARCHAR ||
        |    '|' || lpad((t % 200)::VARCHAR, 3, '0'),
        |    floor(X3 * 1000)::BIGINT FROM csvf WHERE X3 IS NOT NULL
        |  UNION ALL
        |  SELECT (t // 200)::VARCHAR || '|X4', (t // 200)::VARCHAR ||
        |    '|' || lpad((t % 200)::VARCHAR, 3, '0'),
        |    floor(X4 * 1000)::BIGINT FROM csvf WHERE X4 IS NOT NULL),
        |${graft.metrics.Causal.pcSkeletonSqlCtes("panel")}
        |SELECT a, b, n_blocks, support, support_permille,
        |  ($ShippedD3AdjCase)::INT AS truth_adj
        |FROM (
        |  SELECT split_part(a, '|', 2) AS a, split_part(b, '|', 2) AS b,
        |    count(*)::BIGINT AS n_blocks, sum(edge)::BIGINT AS support,
        |    ((1000 * sum(edge)) // count(*))::BIGINT AS support_permille
        |  FROM pc_out GROUP BY 1, 2) s""".stripMargin,

    "q344_stream_granger" ->
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q344_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |  UNION ALL SELECT 'X2', t, floor(X2 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X3', t, floor(X3 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X4', t, floor(X4 * 1000)::BIGINT FROM gen),
        |gj AS (
        |  SELECT x.series AS cause, y.series AS effect, y.day,
        |    y.v AS yv, x.v AS xv
        |  FROM panel y JOIN panel x USING (day)
        |  WHERE x.series <> y.series),
        |glag AS (
        |  SELECT cause, effect, day, yv,
        |    lag(yv) OVER (PARTITION BY cause, effect ORDER BY day) AS pv,
        |    lag(xv) OVER (PARTITION BY cause, effect ORDER BY day) AS qv
        |  FROM gj),
        |bs AS (SELECT unnest([1, 2]) AS i),
        |tb AS (
        |  SELECT DISTINCT (CASE WHEN day < 200 THEN 1 ELSE 2 END) AS i,
        |    cause, effect
        |  FROM glag WHERE pv IS NOT NULL),
        |gl AS (
        |  SELECT bs.i || '|' || g.cause AS cause,
        |    bs.i || '|' || g.effect AS effect, yv, pv, qv
        |  FROM bs
        |  JOIN glag g
        |    ON (CASE WHEN g.day < 200 THEN 1 ELSE 2 END) <= bs.i
        |  JOIN tb ON tb.i = bs.i AND tb.cause = g.cause
        |    AND tb.effect = g.effect
        |  WHERE pv IS NOT NULL),
        |${graft.metrics.Causal.grangerDecideSqlCtes("gl", 422L)}
        |SELECT cause, effect, n, cyy, rss_r, rss_u, f_gain, granger,
        |  ($GrangerGenTruthCase)::INT AS truth_lag1
        |FROM (
        |  SELECT split_part(cause, '|', 2) AS cause,
        |    split_part(effect, '|', 2) AS effect,
        |    n, cyy, rss_r, rss_u, f_gain, granger
        |  FROM granger_out) u""".stripMargin,

    "q342_pc_tau_stability" ->
      s"""WITH $shippedD3PanelCtes,
        |${graft.metrics.Causal.pcMomentSqlCtes("panel")},
        |${PcTauSweepBps.map(t =>
          graft.metrics.Causal.pcDecisionSqlCtes(t, s"_t$t"))
          .mkString(",\n")}
        |${PcTauSweepBps.map(t =>
          s"SELECT ${t}::BIGINT AS tau_sq_bp, a, b, n, cab, keep0, " +
            s"sepset, edge, ($ShippedD3AdjCase)::INT AS truth_adj " +
            s"FROM pc_out_t$t")
          .mkString("\nUNION ALL\n")}""".stripMargin,

    "q324_deletion_cascade" ->
      """WITH fc AS (SELECT c_custkey FROM customer
        |  WHERE c_custkey % 97 = 0),
        |fo AS (SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM fc))
        |SELECT 'customer' AS table_name,
        |  (SELECT count(*) FROM customer)::BIGINT AS n_total,
        |  (SELECT count(*) FROM fc)::BIGINT AS n_delete,
        |  ((SELECT count(*) FROM fc) * 1000000
        |    // (SELECT count(*) FROM customer))::BIGINT AS delete_ppm
        |UNION ALL
        |SELECT 'orders',
        |  (SELECT count(*) FROM orders)::BIGINT,
        |  (SELECT count(*) FROM fo)::BIGINT,
        |  ((SELECT count(*) FROM fo) * 1000000
        |    // (SELECT count(*) FROM orders))::BIGINT
        |UNION ALL
        |SELECT 'lineitem',
        |  (SELECT count(*) FROM lineitem)::BIGINT,
        |  (SELECT count(*) FROM lineitem
        |     WHERE l_orderkey IN (SELECT o_orderkey FROM fo))::BIGINT,
        |  ((SELECT count(*) FROM lineitem
        |      WHERE l_orderkey IN (SELECT o_orderkey FROM fo)) * 1000000
        |    // (SELECT count(*) FROM lineitem))::BIGINT
        |UNION ALL
        |SELECT 'events',
        |  (SELECT count(*) FROM events)::BIGINT,
        |  (SELECT count(*) FROM events WHERE user_id % 97 = 0)::BIGINT,
        |  ((SELECT count(*) FROM events WHERE user_id % 97 = 0) * 1000000
        |    // (SELECT count(*) FROM events))::BIGINT""".stripMargin,

    "q323_log_rank" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type
        |  FROM events),
        |hz AS (SELECT max(day) AS hz FROM ev),
        |us AS (
        |  SELECT user_id, min(day) AS origin,
        |    min(CASE WHEN event_type = 'purchase' THEN day END) AS pday
        |  FROM ev GROUP BY 1),
        |uu AS (
        |  SELECT user_id % 2 AS g,
        |    coalesce(pday - origin, h.hz - origin) AS t,
        |    (pday IS NOT NULL)::BIGINT AS e
        |  FROM us, hz h),
        |tm AS (
        |  SELECT t, sum(CASE WHEN g = 1 THEN e ELSE 0 END)::BIGINT AS d1,
        |    sum(e)::BIGINT AS dt,
        |    sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS c1,
        |    count(*)::BIGINT AS ct
        |  FROM uu GROUP BY 1),
        |tt AS (SELECT count(*)::BIGINT AS ntot,
        |    sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS n1tot
        |  FROM uu),
        |risk AS (
        |  SELECT t, d1, dt,
        |    (ntot - coalesce(sum(ct) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |      ::BIGINT AS nt,
        |    (n1tot - coalesce(sum(c1) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |      ::BIGINT AS n1t
        |  FROM tm, tt),
        |rq AS (
        |  SELECT t, d1, dt, nt, n1t,
        |    (dt * n1t * 1000000) // nt AS e1_ppm,
        |    CASE WHEN nt <= 1 THEN 0 ELSE
        |      ((dt * n1t)::HUGEINT * (nt - n1t) * (nt - dt) * 1000000)
        |      // (nt::HUGEINT * nt * (nt - 1)) END AS v_ppm
        |  FROM risk WHERE dt > 0)
        |SELECT count(*)::BIGINT AS n_times,
        |  sum(d1 * 1000000 - e1_ppm)::BIGINT AS o_minus_e_ppm,
        |  sum(v_ppm)::BIGINT AS v_ppm,
        |  (CASE WHEN sum(v_ppm) > 0 AND
        |     sum(d1 * 1000000 - e1_ppm)::HUGEINT
        |       * sum(d1 * 1000000 - e1_ppm)
        |       > 3841600::HUGEINT * sum(v_ppm)
        |   THEN 1 ELSE 0 END)::INT AS groups_differ
        |FROM rq""".stripMargin,

    "q322_psm_matching" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, floor(value * 1e6)::BIGINT AS vm
        |  FROM events),
        |u AS (
        |  SELECT user_id, count(*)::BIGINT AS score,
        |    coalesce(
        |      sum(CASE WHEN event_type = 'purchase' THEN vm END)
        |        // nullif(sum(CASE WHEN event_type = 'purchase'
        |            THEN 1 ELSE 0 END), 0),
        |      0)::BIGINT AS out,
        |    user_id % 2 AS treat
        |  FROM ev GROUP BY user_id),
        |pts AS (
        |  SELECT score AS s, 0 AS kind, user_id AS uid, out
        |  FROM u WHERE treat = 0
        |  UNION ALL
        |  SELECT score, 1, user_id, out FROM u WHERE treat = 1),
        |car AS (
        |  SELECT s, kind, uid, out,
        |    last_value(CASE WHEN kind = 0 THEN s END IGNORE NULLS)
        |      OVER wb AS bs,
        |    last_value(CASE WHEN kind = 0 THEN out END IGNORE NULLS)
        |      OVER wb AS bout,
        |    first_value(CASE WHEN kind = 0 THEN s END IGNORE NULLS)
        |      OVER wf AS fs,
        |    first_value(CASE WHEN kind = 0 THEN out END IGNORE NULLS)
        |      OVER wf AS fout
        |  FROM pts
        |  WINDOW wb AS (ORDER BY s, kind, uid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (ORDER BY s, kind, uid
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |mt AS (
        |  SELECT s, out,
        |    CASE WHEN fs IS NOT NULL AND (bs IS NULL OR fs - s < s - bs)
        |      THEN fs ELSE bs END AS ms,
        |    CASE WHEN fs IS NOT NULL AND (bs IS NULL OR fs - s < s - bs)
        |      THEN fout ELSE bout END AS mout
        |  FROM car WHERE kind = 1),
        |ok AS (SELECT * FROM mt WHERE ms IS NOT NULL
        |  AND abs(ms - s) <= 5),
        |tt AS (SELECT count(*)::BIGINT AS n_treated FROM u
        |  WHERE treat = 1)
        |SELECT t.n_treated, count(*)::BIGINT AS n_matched,
        |  (sum(out) // count(*))::BIGINT AS mean_treated_micro,
        |  (sum(mout) // count(*))::BIGINT AS mean_control_micro,
        |  ((sum(out) // count(*)) - (sum(mout) // count(*)))::BIGINT
        |    AS att_micro
        |FROM ok, tt t GROUP BY t.n_treated""".stripMargin,

    "q320_zipf_slope" ->
      s"""WITH tf AS (
        |  SELECT source, tok, count(*)::BIGINT AS f
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |top AS (
        |  SELECT source, f, r FROM (
        |    SELECT source, tok, f,
        |      row_number() OVER (PARTITION BY source
        |        ORDER BY f DESC, tok) AS r
        |    FROM tf) WHERE r <= 64),
        |xy AS (
        |  SELECT source,
        |    ${qlog2Expr("r", isSpark = false)} AS x,
        |    ${qlog2Expr("f", isSpark = false)} AS y
        |  FROM top),
        |mo AS (
        |  SELECT source, count(*)::HUGEINT AS n_top,
        |    sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
        |    sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx
        |  FROM xy GROUP BY 1)
        |SELECT source, n_top::BIGINT AS n_top,
        |  (n_top * sxy - sx * sy)::BIGINT AS cxy,
        |  (n_top * sxx - sx * sx)::BIGINT AS cxx,
        |  (((n_top * sxy - sx * sy) * 1000)
        |    // (n_top * sxx - sx * sx))::BIGINT AS slope_milli
        |FROM mo""".stripMargin,

    "q319_ddsketch_quantiles" ->
      """WITH ov AS (
        |  SELECT o_orderpriority AS pri,
        |    floor(o_totalprice * 100 + 0.5)::BIGINT AS v
        |  FROM orders),
        |keyed AS (
        |  SELECT pri, v, length(bin(v)) AS b,
        |    (v // (1::BIGINT << greatest(length(bin(v)) - 4, 0)))
        |      * (1::BIGINT << greatest(length(bin(v)) - 4, 0)) AS lb
        |  FROM ov),
        |sk AS (SELECT pri, b, lb, count(*)::BIGINT AS cnt
        |  FROM keyed GROUP BY 1, 2, 3),
        |cs AS (
        |  SELECT pri, b, lb, cnt,
        |    sum(cnt) OVER (PARTITION BY pri ORDER BY b, lb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY pri) AS total
        |  FROM sk),
        |est AS (
        |  SELECT pri, max(total)::BIGINT AS n_rows,
        |    count(*)::BIGINT AS n_buckets,
        |    min(CASE WHEN cum * 100 >= total * 50 THEN lb END)::BIGINT
        |      AS p50_est,
        |    min(CASE WHEN cum * 100 >= total * 90 THEN lb END)::BIGINT
        |      AS p90_est,
        |    min(CASE WHEN cum * 100 >= total * 99 THEN lb END)::BIGINT
        |      AS p99_est
        |  FROM cs GROUP BY 1),
        |vg AS (SELECT pri, v, count(*)::BIGINT AS cnt
        |  FROM ov GROUP BY 1, 2),
        |cv AS (
        |  SELECT pri, v, cnt,
        |    sum(cnt) OVER (PARTITION BY pri ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY pri) AS total
        |  FROM vg),
        |ex AS (
        |  SELECT pri,
        |    min(CASE WHEN cum * 100 >= total * 50 THEN v END)::BIGINT
        |      AS p50_exact,
        |    min(CASE WHEN cum * 100 >= total * 90 THEN v END)::BIGINT
        |      AS p90_exact,
        |    min(CASE WHEN cum * 100 >= total * 99 THEN v END)::BIGINT
        |      AS p99_exact
        |  FROM cv GROUP BY 1)
        |SELECT e.pri, n_rows, n_buckets,
        |  p50_est, p50_exact,
        |  (((p50_exact - p50_est) * 1000000) // p50_exact)::BIGINT
        |    AS p50_err_ppm,
        |  p90_est, p90_exact,
        |  (((p90_exact - p90_est) * 1000000) // p90_exact)::BIGINT
        |    AS p90_err_ppm,
        |  p99_est, p99_exact,
        |  (((p99_exact - p99_est) * 1000000) // p99_exact)::BIGINT
        |    AS p99_err_ppm
        |FROM est e JOIN ex USING (pri)""".stripMargin,

    "q316_resample_d3c_masked" ->
      """WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q316_gen/*.parquet')),
        |sm AS (
        |  SELECT 'X1' AS series, t_us, x1_micro AS v_micro FROM gen
        |  WHERE mask1 = 0
        |  UNION ALL SELECT 'U', t_us, u_micro FROM gen),
        |s AS (
        |  SELECT series, t_us, v_micro,
        |    lead(t_us) OVER (PARTITION BY series ORDER BY t_us) AS t_next,
        |    lead(v_micro) OVER (PARTITION BY series ORDER BY t_us)
        |      AS v_next
        |  FROM sm),
        |g AS (
        |  SELECT sr.series, grid_us
        |  FROM (SELECT DISTINCT series FROM sm) sr,
        |    (SELECT unnest(range(0, 100000001, 500000))::BIGINT
        |       AS grid_us)),
        |j AS (
        |  SELECT s.series, grid_us, v_micro, t_next,
        |    (v_next - v_micro) * (grid_us - t_us) AS num,
        |    t_next - t_us AS den
        |  FROM g JOIN s ON s.series = g.series AND grid_us >= t_us
        |    AND (t_next IS NULL OR grid_us < t_next))
        |SELECT series, grid_us,
        |  CASE WHEN t_next IS NULL THEN v_micro
        |       ELSE v_micro + (num - ((num % den + den) % den)) // den
        |  END AS v_interp_micro
        |FROM j""".stripMargin,

    "q313_granger_confounded" ->
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q313_gen/*.parquet')),
        |panel AS (
        |  SELECT 'X1' AS series, t AS day, floor(X1 * 1000)::BIGINT AS v
        |  FROM gen
        |  UNION ALL SELECT 'X2', t, floor(X2 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X3', t, floor(X3 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X4', t, floor(X4 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'U', t, floor(U * 1000)::BIGINT FROM gen),
        |${graft.metrics.Causal.grangerSqlCtes("panel")}
        |SELECT cause, effect, n, cyy, rss_r, rss_u, f_gain, granger,
        |  (${grangerTruthCase("A1C")})::INT AS truth_lag1
        |FROM granger_out""".stripMargin,

    "q314_granger_irregular" ->
      s"""WITH gen AS (
        |  SELECT * FROM read_parquet('__GEN_DIR__/q314_gen/*.parquet')),
        |${graft.ops.Lagged.nearestLagIndexSqlCtes("gen", "\"time\"")},
        |pan AS (
        |  SELECT 'X1' AS series, t, floor(X1 * 1000)::BIGINT AS v FROM gen
        |  UNION ALL SELECT 'X2', t, floor(X2 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X3', t, floor(X3 * 1000)::BIGINT FROM gen
        |  UNION ALL SELECT 'X4', t, floor(X4 * 1000)::BIGINT FROM gen),
        |gl AS (
        |  SELECT cp.series AS cause, e.series AS effect,
        |    e.v AS yv, ep.v AS pv, cp.v AS qv
        |  FROM lx
        |  JOIN pan e ON e.t = lx.t
        |  JOIN pan ep ON ep.t = lx.lag_idx AND ep.series = e.series
        |  JOIN pan cp ON cp.t = lx.lag_idx AND cp.series <> e.series),
        |${graft.metrics.Causal.grangerDecideSqlCtes("gl")}
        |SELECT cause, effect, n, cyy, rss_r, rss_u, f_gain, granger,
        |  (${grangerTruthCase("A2")})::INT AS truth_lag1
        |FROM granger_out""".stripMargin,

    "q310_tfidf_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
        |  FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
        |sc AS (
        |  SELECT t.doc_id, t.tok,
        |    t.tf * length(bin(n.n_docs // d.df)) AS score
        |  FROM tf t JOIN dfq d USING (tok), nd n),
        |top AS (
        |  SELECT doc_id, tok AS keyword FROM (
        |    SELECT doc_id, tok, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, tok DESC) AS r
        |    FROM sc) WHERE r = 1)
        |SELECT keyword, count(*)::BIGINT AS n_docs_top
        |FROM top GROUP BY 1
        |ORDER BY n_docs_top DESC, keyword LIMIT 20""".stripMargin,

    "q307_average_precision" ->
      s"""WITH $QualityMarginCtes,
        |lb AS (SELECT margin,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM qmargin),
        |byv AS (SELECT margin, count(*)::BIGINT AS t,
        |    sum(pos)::BIGINT AS p
        |  FROM lb GROUP BY 1),
        |cum AS (SELECT p, sum(p) OVER w AS cp, sum(t) OVER w AS ct
        |  FROM byv
        |  WINDOW w AS (ORDER BY margin DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT sum(p)::BIGINT AS n_pos,
        |  (sum(p * ((cp * 1000000) // ct)) // sum(p))::BIGINT AS ap_ppm
        |FROM cum""".stripMargin,

    "q308_brier_decomposition" ->
      s"""WITH $QualityMarginCtes,
        |lb AS (SELECT margin,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM qmargin),
        |bb AS (SELECT greatest(least(margin // 200, 10), -10) AS bin,
        |    count(*)::BIGINT AS n_b, sum(pos)::BIGINT AS p_b
        |  FROM lb GROUP BY 1),
        |cf AS (SELECT bin, n_b, p_b,
        |    ($SigmoidPpmCaseSql)::BIGINT AS conf,
        |    (p_b * 1000000) // n_b AS acc
        |  FROM bb),
        |tt AS (SELECT sum(n_b)::BIGINT AS n,
        |    (sum(p_b) * 1000000) // sum(n_b) AS base
        |  FROM cf)
        |SELECT t.n, t.base::BIGINT AS base_ppm,
        |  (sum(p_b * (conf - 1000000)::HUGEINT * (conf - 1000000)
        |     + (n_b - p_b) * conf::HUGEINT * conf) // t.n)::BIGINT
        |    AS brier_pm2,
        |  (sum(n_b * (conf - acc)::HUGEINT * (conf - acc)) // t.n)
        |    ::BIGINT AS rel_pm2,
        |  (sum(n_b * (acc - t.base)::HUGEINT * (acc - t.base)) // t.n)
        |    ::BIGINT AS res_pm2,
        |  (t.base * (1000000 - t.base))::BIGINT AS unc_pm2,
        |  ((sum(p_b * (conf - 1000000)::HUGEINT * (conf - 1000000)
        |      + (n_b - p_b) * conf::HUGEINT * conf) // t.n)
        |   - ((sum(n_b * (conf - acc)::HUGEINT * (conf - acc)) // t.n)
        |      - (sum(n_b * (acc - t.base)::HUGEINT * (acc - t.base))
        |         // t.n)
        |      + t.base * (1000000 - t.base)))::BIGINT AS quant_residual
        |FROM cf, tt t GROUP BY t.n, t.base""".stripMargin,

    "q305_block_bootstrap" ->
      s"""WITH $CausalPanelCte,
        |ix AS (SELECT series, v,
        |    row_number() OVER (PARTITION BY series ORDER BY day) AS i
        |  FROM panel),
        |spine AS (
        |  SELECT r.r AS rep, j.j AS slot,
        |    1 + (((r.r * 31 + j.j) * 2654435761) % 26)::INT AS start
        |  FROM (SELECT unnest(range(1, 21)) AS r) r,
        |       (SELECT unnest(range(0, 6)) AS j) j),
        |picked AS (
        |  SELECT x.series, s.rep, sum(x.v) // 30 AS m
        |  FROM ix x JOIN spine s
        |    ON x.i >= s.start AND x.i <= s.start + 4
        |  GROUP BY 1, 2)
        |SELECT series, count(*)::BIGINT AS n_reps,
        |  (sum(m) // count(*))::BIGINT AS boot_mean_milli,
        |  ((count(*)::HUGEINT * sum(m::HUGEINT * m)
        |     - sum(m)::HUGEINT * sum(m))
        |   // (count(*)::HUGEINT * count(*)))::BIGINT AS boot_var
        |FROM picked GROUP BY 1""".stripMargin,

    "q306_ljung_box" ->
      s"""WITH $CausalPanelCte,
        |st AS (SELECT series, count(*)::BIGINT AS n, sum(v)::BIGINT
        |    AS sv FROM panel GROUP BY 1),
        |dev AS (SELECT p.series, s.n, p.day, s.n * p.v - s.sv AS dt
        |  FROM panel p JOIN st s USING (series)),
        |lagd AS (SELECT series, n, dt,
        |    lag(dt, 1) OVER w AS d1, lag(dt, 2) OVER w AS d2,
        |    lag(dt, 3) OVER w AS d3
        |  FROM dev WINDOW w AS (PARTITION BY series ORDER BY day)),
        |cs AS (SELECT series, n,
        |    sum(dt::HUGEINT * dt)::BIGINT AS c0,
        |    sum(dt::HUGEINT * d1)::BIGINT AS c1,
        |    sum(dt::HUGEINT * d2)::BIGINT AS c2,
        |    sum(dt::HUGEINT * d3)::BIGINT AS c3
        |  FROM lagd GROUP BY 1, 2)
        |SELECT series, n, c0, c1, c2, c3,
        |  (CASE WHEN 1000 * n * (n + 2) *
        |      (c1::HUGEINT * c1 * (n-2) * (n-3)
        |        + c2::HUGEINT * c2 * (n-1) * (n-3)
        |        + c3::HUGEINT * c3 * (n-1) * (n-2))
        |    > 7815 * (n-1) * (n-2) * (n-3) * c0::HUGEINT * c0
        |   THEN 0 ELSE 1 END)::INT AS white
        |FROM cs""".stripMargin
  )

  /** The q231/q286/q287 linear quality margin as CTEs — THE DuckDB mirror
    * of [[graft.text.TextOps.linearQualityMargin]]; yields
    * `qmargin(lang, margin)`.
    */
  private val QualityMarginCtes: String =
    """qm_f AS (
      |  SELECT lang,
      |    len(string_split(text, ' '))::BIGINT AS n_tokens,
      |    length(text)::BIGINT AS n_chars,
      |    len(list_filter(string_split(text, ' '), t -> t IN
      |      ('the','a','of','and','to','in','is','on','for','with')))
      |      ::BIGINT AS n_stop,
      |    length(regexp_replace(text, '[^a-z]', '', 'g'))::BIGINT
      |      AS n_alpha
      |  FROM documents),
      |qm_g AS (
      |  SELECT lang, n_tokens,
      |    (n_stop * 1000) // n_tokens AS stop_pm,
      |    (n_alpha * 1000) // greatest(n_chars, 1) AS alpha_pm,
      |    ((n_chars - n_tokens + 1) * 1000) // n_tokens AS mtl_milli
      |  FROM qm_f),
      |qmargin AS (
      |  SELECT lang, (4 * n_tokens + 2 * stop_pm + alpha_pm
      |    - abs(mtl_milli - 4500) // 2 - 800)::BIGINT AS margin
      |  FROM qm_g)""".stripMargin

  /** The causal suite's shared daily panel — milli-unit day means per
    * event_type (mirrors [[graft.metrics.Causal.dailyMeanPanel]]): means,
    * not sums, so the integer magnitudes are corpus-scale-invariant.
    */
  private val CausalPanelCte: String =
    """panel AS (
      |  SELECT event_type AS series, epoch_us(ts) // 86400000000 AS day,
      |    (sum(floor(value * 1e6)::BIGINT) // (count(*) * 1000))::BIGINT
      |      AS v
      |  FROM events GROUP BY 1, 2)""".stripMargin

  private def lnMicroCaseSql(operand: String): String =
    graft.metrics.Causal.lnMicroCase(operand, 64)

  /** Per-round BPE cross-check over the positional dumps Spark wrote
    * (`Bpe.train` dumpDir): round r's argmax pair is re-derived from dump r
    * by weighted adjacent-pair counting, and the merge APPLICATION is
    * re-derived via candidate-chain parity — a chain of L consecutive
    * candidate positions (only possible when pa = pb) merges ceil(L/2)
    * times under the left-to-right fold — giving an independent
    * n_tokens_after from the same rows.
    */
  private def bpeOracleSql(rounds: Int): String = {
    val per = (0 until rounds).map { r =>
      s"""b$r AS MATERIALIZED (
         |  SELECT * FROM read_parquet('__GEN_DIR__/q256_bpe/r$r/*.parquet')),
         |p$r AS (SELECT a.sym AS pa, b.sym AS pb, sum(a.cnt)::BIGINT AS cnt
         |  FROM b$r a JOIN b$r b ON a.w = b.w AND b.pos = a.pos + 1
         |  GROUP BY 1, 2),
         |t$r AS (SELECT pa, pb, cnt FROM p$r
         |  ORDER BY cnt DESC, pa, pb LIMIT 1),
         |c$r AS (SELECT a.w, a.cnt, a.pos
         |  FROM b$r a JOIN b$r b ON a.w = b.w AND b.pos = a.pos + 1
         |  JOIN t$r t ON a.sym = t.pa AND b.sym = t.pb),
         |g$r AS (SELECT w, cnt, count(*) AS chain FROM (
         |    SELECT w, cnt, pos,
         |      pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS grp
         |    FROM c$r) GROUP BY w, cnt, grp),
         |m$r AS (SELECT coalesce(sum(cnt * ((chain + 1) // 2)), 0)::BIGINT
         |    AS merges FROM g$r),
         |n$r AS (SELECT sum(cnt)::BIGINT AS total FROM b$r),
         |r$r AS (SELECT $r::BIGINT AS round, t.pa, t.pb, t.cnt,
         |    (n.total - m.merges)::BIGINT AS n_tokens_after
         |  FROM t$r t, n$r n, m$r m)""".stripMargin
    }.mkString(",\n")
    val unions = (0 until rounds).map(r => s"SELECT * FROM r$r")
      .mkString("\nUNION ALL ")
    s"WITH $per\n$unions"
  }

  /** q195/q197's shared SQL fragment — the dirty registry and its blocked
    * candidate pairs, mirroring [[erRegistry]]/[[erCandidates]] literally
    * so the two oracles cannot drift from the Spark side or each other.
    */
  private val ErCandCtes: String =
    """cust AS (SELECT c_custkey, c_name FROM customer),
      |reg AS (
      |  SELECT c_custkey AS id, c_name AS name FROM cust
      |  UNION ALL
      |  SELECT c_custkey + 10000000,
      |    replace(c_name, 'Customer#', 'Custmoer#')
      |  FROM cust WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey + 20000000,
      |    replace(c_name, 'Customer#', 'Custmer#')
      |  FROM cust WHERE c_custkey % 5 = 0
      |  UNION ALL
      |  SELECT c_custkey + 30000000,
      |    replace(c_name, 'Customer#', 'Vendor#')
      |  FROM cust WHERE c_custkey % 7 = 0),
      |regb AS (SELECT id, name, right(name, 9) AS blk FROM reg),
      |cand AS (
      |  SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a,
      |    b.name AS name_b, levenshtein(a.name, b.name)::BIGINT AS lev
      |  FROM regb a JOIN regb b ON a.blk = b.blk AND a.id < b.id)"""
      .stripMargin
}
