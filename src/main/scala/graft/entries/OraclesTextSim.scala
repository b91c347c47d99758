package graft

/** TextSim slice of [[SparkEntry.oracleSql]] — the DuckDB twins of
  * [[QueriesTextSim]], split mechanically from the single map. */
private[graft] trait OraclesTextSim { this: SparkEntry.type =>

  private[graft] def oracleSqlTextSim: Map[String, String] = Map(

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

    "q49_ivf_topk" -> IvfTopkOracleSql
  )
}
