package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs & authorities) over a contracted weighted digraph, with a
  * PURE INTEGER contract — the companion of [[PageRank.rankMicro]].
  *
  * Scores are micro-units (1.0 → 1 000 000). One iteration is two
  * half-steps, each followed by a max-normalization so state never leaves
  * the micro-unit range:
  *
  *   authRaw(v) = Σ_{u→v} hub(u) · w(u,v)          (exact, DECIMAL(38,0))
  *   auth(v)    = (authRaw(v) · 1 000 000) div max_v authRaw(v)
  *   hubRaw(u)  = Σ_{u→v} auth(v) · w(u,v)
  *   hub(u)     = (hubRaw(u) · 1 000 000) div max_u hubRaw(u)
  *
  * Every product/sum is exact integer arithmetic (sums widen to
  * DECIMAL(38,0) — hub ≤ 1e6 and w is unbounded fact-derived weight, so a
  * LONG sum would overflow around Σw ≈ 9e12 per node); the only division is
  * integer floor-division of non-negative operands, so Spark's `div` and
  * DuckDB's `//` (on HUGEINT) agree bit-for-bit. The fixpoint is a
  * deterministic function of the edge multiset, independent of partitioning
  * and join order. Safe bound: authRaw·1e6 must fit DECIMAL(38,0), i.e.
  * Σ_{u→v} hub·w < 1e26 per node — at hub ≤ 1e6 that allows Σw < 1e20 per
  * node, far beyond any real corpus.
  *
  * Scale design: identical to PageRank — the heavy distributed stage is the
  * fact-side edge derivation (caller's joins + groupBy); iterations run on
  * the contracted |nodes| ≪ |rows| graph with the score state broadcast, so
  * no iteration ever shuffles fact rows. `broadcastScores = false` degrades
  * to shuffle joins keyed on node for huge node sets.
  *
  * Reference anchor: the reference stops at causal edge lists and confusion
  * counts (helper_funcs/); link-structure centrality is an engine addition
  * (SURVEY §3.4 class: iterative graph analytics).
  */
object Hits {

  /** Run `iterations` HITS steps over `edges` (columns `src`, `dst`, `w`).
    * Returns (`node`, `auth_micro`, `hub_micro`). Nodes appearing only as
    * sources have auth 0 after round 1; only-sinks have hub 0 — standard.
    */
  def scoresMicro(edges: DataFrame, iterations: Int,
      broadcastScores: Boolean = true): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // truncate the fact-scale derivation lineage once (see PageRank)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val bc = (df: DataFrame) => if (broadcastScores) broadcast(df) else df

    def normalize(raw: DataFrame, keyCol: String, rawCol: String,
        outCol: String): DataFrame = {
      // max over |nodes| rows — a 1-row aggregate, broadcast to the join.
      // max ≥ 1 whenever any edge exists; guard the empty side with
      // greatest(1) so div never sees 0
      val mx = raw.agg(greatest(max(col(rawCol)), lit(1).cast("decimal(38,0)"))
        .as("mx"))
      raw.crossJoin(broadcast(mx))
        .select(col(keyCol),
          expr(s"cast(($rawCol * 1000000) div mx as bigint)").as(outCol))
    }

    var hubs = nodes.withColumn("hub_micro", lit(1000000L))
    var auths = nodes.withColumn("auth_micro", lit(1000000L))
    for (_ <- 1 to iterations) {
      val h = bc(hubs)
      val authRaw = e.join(h, e("src") === h("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("cast(hub_micro as decimal(38,0)) * w")).as("raw"))
      val authScaled = normalize(authRaw, "dst", "raw", "a")
      auths = nodes.join(bc(authScaled), nodes("node") === authScaled("dst"), "left")
        .select(nodes("node"), coalesce(col("a"), lit(0L)).as("auth_micro"))
      // snap the round's state: each score table is referenced multiple
      // times (normalize max, the next half-step's join, the final join) —
      // without truncation the plan tree duplicates per reference and
      // grows geometrically over iterations (measured: 848 exchanges at
      // 3 iterations un-snapped vs ~30 snapped). |nodes|-sized, so the
      // checkpoint is tiny
      auths = auths.localCheckpoint(false)
      val a = bc(auths)
      val hubRaw = e.join(a, e("dst") === a("node"))
        .groupBy(col("src"))
        .agg(sum(expr("cast(auth_micro as decimal(38,0)) * w")).as("raw"))
      val hubScaled = normalize(hubRaw, "src", "raw", "h")
      hubs = nodes.join(bc(hubScaled), nodes("node") === hubScaled("src"), "left")
        .select(nodes("node"), coalesce(col("h"), lit(0L)).as("hub_micro"))
        .localCheckpoint(false)
    }
    auths.join(hubs, "node")
  }
}
