package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) for community
  * detection — the lightweight complement to [[ConnectedComponents]]: CC
  * merges everything reachable, LPA stops at densely-connected regions, so
  * it is the tool when a near-dup graph's transitive closure over-merges
  * (the failure mode the q96 triangle census measures).
  *
  * Semantics (identical in the SQL oracle): per round, every node
  * simultaneously adopts the most frequent label among its neighbors PLUS
  * its own current label (the self-vote), ties broken by the SMALLEST
  * label; isolated nodes therefore keep their label. The self-vote is
  * load-bearing, not a convenience: pure-neighbor synchronous LPA
  * oscillates on any symmetric pair (the two endpoints swap labels every
  * round, so no community ever forms), while the self-vote + min
  * tie-break anchors the smaller label and lets it absorb the
  * neighborhood. Fixed round count — deterministic, no convergence
  * flakiness, and the oracle can unroll the same rounds.
  *
  * Scale shape (the Pregel shape, like q86/q196/q199): per round ONE
  * vote aggregate — the (node, label) count reduces map-side, and the
  * winner is a partially-aggregable min-of-struct, so no per-node window
  * sort exists — plus one left join back to the label state, with
  * `localCheckpoint` snapping lineage so round r+1 never replays round r.
  */
object LabelProp {

  /** `edges`: directed rows (u, v) — pass both directions for an undirected
    * graph. `nodes`: (node, lbl) initial labels. Returns (node, lbl).
    */
  def propagate(edges: DataFrame, nodes: DataFrame, rounds: Int): DataFrame = {
    // drop edges touching unregistered endpoints up front: a neighbor
    // vote would otherwise manufacture label rows for nodes the caller
    // never supplied — and those phantoms would get no self-vote,
    // violating the update rule documented above
    val reg = nodes.select(col("node"))
    val e = edges
      .join(reg.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
      .join(reg.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
      .localCheckpoint()
    var lbl = nodes
    for (_ <- 1 to rounds) {
      val votes = e.join(lbl.withColumnRenamed("node", "v"), Seq("v"))
        .select(col("u").as("node"), col("lbl"))
        .union(lbl) // the self-vote — also keeps isolated nodes present
      lbl = votes
        .groupBy("node", "lbl").agg(count(lit(1)).as("c"))
        // (max count, min label) winner as min(struct(-c, lbl)): partial
        // aggregation applies, so the vote table never fully shuffles
        .groupBy("node")
        .agg(min(struct((-col("c")).as("neg_c"), col("lbl"))).as("best"))
        .select(col("node"), col("best.lbl").as("lbl"))
        .localCheckpoint()
    }
    lbl
  }
}
