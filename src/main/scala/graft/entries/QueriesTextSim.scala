package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._
import graft.generate.Generate
import graft.ops.{AsOf, ExactStats, Lagged}
import graft.text.{Dedup, TextOps}
import graft.sim.Similarity

/** TextSim slice of [[SparkEntry.queries]] — mechanical split of the
  * single registry map; entry bodies are verbatim. */
private[graft] trait QueriesTextSim { this: SparkEntry.type =>

  private[graft] def queriesTextSim: Map[String, (SparkSession, String) => DataFrame] = Map(

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
    })
  )
}
