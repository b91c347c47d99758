package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank over a contracted graph, with a PURE INTEGER contract.
  *
  * Ranks are micro-units (1.0 → 1 000 000); damping is milli (0.85 → 850).
  * One iteration is
  *
  *   rank'(m) = (1000 − d)·1000  +  (d · Σ_{n→m} ⌊rank(n)·w(n,m) / outW(n)⌋) div 1000
  *
  * — every division is integer floor-division of non-negative operands, so
  * Spark's `div` and DuckDB's `//` agree bit-for-bit and the fixpoint is a
  * deterministic function of the edge multiset, independent of partitioning
  * or join order.
  *
  * Scale design: the intended use is rank-over-a-CONTRACTED graph — e.g.
  * domains of a 100 TB crawl, nations of a fact table — where deriving the
  * weighted edge list is the heavy distributed stage (joins + one groupBy on
  * the fact data) and the iteration then runs on |nodes| ≪ |rows|. Each
  * iteration joins the edge table (partitioned by src) against a BROADCAST
  * rank table and reduces by dst: no iteration ever shuffles fact rows, and
  * rank state never leaves the driver-broadcast size class. For graphs whose
  * node set is itself huge, set `broadcastRanks = false` to fall back to
  * shuffle joins keyed on node — same results, Pregel-shaped cost.
  *
  * Reference anchor: the reference's causal-graph handling stops at edge
  * lists and confusion counts (helper_funcs); centrality over the link
  * structure is an engine addition (SURVEY §3.4 class: iterative graph
  * analytics).
  */
object PageRank {

  /** Run `iterations` weighted PageRank steps over `edges` (columns
    * `src`, `dst`, `w`). Returns (`node`, `rank_micro`). Nodes with no
    * outgoing edges contribute nothing (standard dangling-mass loss), so
    * total mass is not conserved — acceptable and deterministic.
    */
  def rankMicro(edges: DataFrame, iterations: Int, dampingMilli: Long = 850L,
      broadcastRanks: Boolean = true): DataFrame = {
    require(iterations >= 1 && dampingMilli >= 0 && dampingMilli <= 1000)
    // truncate the (possibly fact-scale) edge-derivation lineage ONCE: every
    // iteration re-reads the contracted edge table, and without this each
    // re-read would replay the upstream joins over the raw data per iteration
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val bc = (df: DataFrame) => if (broadcastRanks) broadcast(df) else df
    // out_w is one row per source node — the same size class as the rank
    // state, so it rides the same broadcast-vs-shuffle switch (checkpointed
    // inputs carry no stats, so Catalyst won't pick broadcast by itself)
    val ew = e.join(bc(e.groupBy("src").agg(sum("w").as("out_w"))), "src")
    val base = (1000L - dampingMilli) * 1000L
    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to iterations) {
      val r = bc(ranks)
      val contrib = ew.join(r, ew("src") === r("node"))
        .select(col("dst"), expr("(rank_micro * w) div out_w").as("c"))
        .groupBy("dst").agg(sum("c").as("contrib"))
      ranks = nodes.join(bc(contrib), nodes("node") === contrib("dst"), "left")
        .select(nodes("node"),
          (lit(base) +
            expr(s"($dampingMilli * coalesce(contrib, 0L)) div 1000")).as("rank_micro"))
    }
    ranks
  }
}
