package graft.metrics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Causal-graph scoring (R6-R10, metrics_helper.py).
  *
  * Edge sets are tiny (p ≤ 9, L ≤ 4) per graph, but the engine scores MANY
  * graphs at once — so everything is expressed as DataFrame joins/aggs keyed
  * by graphId: a full-outer join on (graphId, source, target, lag) + conditional
  * sums. At scale this is one broadcast-or-shuffle join over all predicted
  * graphs; no driver loops.
  */
object Metrics {

  /** Confusion counts per graph: truth ⟗ predicted on (source, target, lag).
    * `total` = p*p*(L+1) cells per graph for TN computation
    * (metrics_helper.py:7-18).
    */
  def confusion(truth: DataFrame, predicted: DataFrame, totalCells: DataFrame): DataFrame = {
    val t = truth.select(col("graphId"), col("source"), col("target"), col("lag"))
      .withColumn("_t", lit(1))
    val p = predicted.select(col("graphId"), col("source"), col("target"), col("lag"))
      .withColumn("_p", lit(1))
    val joined = t.join(p, Seq("graphId", "source", "target", "lag"), "full_outer")
    val counts = joined.groupBy("graphId").agg(
      sum(when(col("_t").isNotNull && col("_p").isNotNull, 1).otherwise(0)).as("tp"),
      sum(when(col("_t").isNull && col("_p").isNotNull, 1).otherwise(0)).as("fp"),
      sum(when(col("_t").isNotNull && col("_p").isNull, 1).otherwise(0)).as("fn"))
    // anchor on totalCells so a graph with empty truth AND prediction still
    // reports tp=fp=fn=0, tn=total instead of vanishing
    totalCells.join(counts, Seq("graphId"), "left_outer")
      .na.fill(0L, Seq("tp", "fp", "fn"))
      .withColumn("tn", col("total") - col("tp") - col("fp") - col("fn"))
  }

  /** TPR/FDR (metrics_helper.py:20-27): tpr = tp/(tp+fn), fdr = fp/(fp+tp). */
  def tprFdr(conf: DataFrame): DataFrame =
    conf.withColumn("tpr",
        when(col("tp") + col("fn") === 0, 0.0).otherwise(col("tp") / (col("tp") + col("fn"))))
      .withColumn("fdr",
        when(col("fp") + col("tp") === 0, 0.0).otherwise(col("fp") / (col("fp") + col("tp"))))

  /** F1 (metrics_helper.py:29-35). */
  def f1(conf: DataFrame): DataFrame =
    conf.withColumn("precision",
        when(col("tp") + col("fp") === 0, 0.0).otherwise(col("tp") / (col("tp") + col("fp"))))
      .withColumn("recall",
        when(col("tp") + col("fn") === 0, 0.0).otherwise(col("tp") / (col("tp") + col("fn"))))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0.0, 0.0)
          .otherwise(lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall"))))

  /** SHD by XOR (metrics_helper.py:37-43): cells where truth != predicted. */
  def shdXor(truth: DataFrame, predicted: DataFrame): DataFrame = {
    val t = truth.select(col("graphId"), col("source"), col("target"), col("lag")).withColumn("_t", lit(1))
    val p = predicted.select(col("graphId"), col("source"), col("target"), col("lag")).withColumn("_p", lit(1))
    t.join(p, Seq("graphId", "source", "target", "lag"), "full_outer")
      .groupBy("graphId")
      .agg(sum(when(col("_t").isNull || col("_p").isNull, 1).otherwise(0)).as("shd"))
  }

  /** All the R7-R10 scores per graph in ONE pair-level join pass — the
    * panel-scale path ("score a million predicted graphs in one shuffle").
    * Each side collapses to canonical unordered-pair direction flags FIRST
    * (grouped on the exact join key, so the pre-aggregation and the join
    * share one hash partitioning per side); the full-outer join then yields
    * per-pair flags from which tp/fp/fn, XOR-SHD (= fp + fn on distinct
    * edge sets) and the orientation-aware structural SHD all derive in a
    * single per-graph reduce of already-collapsed rows. Equivalence to
    * [[confusion]]/[[shdXor]]/[[shdStructural]] is property-tested.
    * Inputs must carry DISTINCT (graphId, source, target, lag) edges.
    */
  def scoreAll(truth: DataFrame, predicted: DataFrame): DataFrame = {
    def canon(df: DataFrame, tag: String): DataFrame =
      df.select(col("graphId"), col("source"), col("target"), col("lag"))
        .withColumn("u", least(col("source"), col("target")))
        .withColumn("v", greatest(col("source"), col("target")))
        .withColumn("fwd", (col("source") <= col("target")).cast("int"))
        .groupBy("graphId", "u", "v", "lag")
        .agg(max(when(col("fwd") === 1, 1).otherwise(0)).as(s"${tag}_fwd"),
             max(when(col("fwd") === 0, 1).otherwise(0)).as(s"${tag}_rev"))
    val j = canon(truth, "t")
      .join(canon(predicted, "p"), Seq("graphId", "u", "v", "lag"),
        "full_outer")
      .na.fill(0)
    val cost = when(
        col("t_fwd") + col("t_rev") === 1 &&
          col("p_fwd") + col("p_rev") === 1 &&
          (col("t_fwd") =!= col("p_fwd")), 1)
      .otherwise(abs(col("t_fwd") - col("p_fwd")) +
        abs(col("t_rev") - col("p_rev")))
    j.groupBy("graphId").agg(
        sum(col("t_fwd") * col("p_fwd") + col("t_rev") * col("p_rev"))
          .cast("long").as("tp"),
        sum(col("p_fwd") * (lit(1) - col("t_fwd")) +
            col("p_rev") * (lit(1) - col("t_rev")))
          .cast("long").as("fp"),
        sum(col("t_fwd") * (lit(1) - col("p_fwd")) +
            col("t_rev") * (lit(1) - col("p_rev")))
          .cast("long").as("fn"),
        sum(cost).cast("long").as("shd_structural"))
      .withColumn("shd_xor", col("fp") + col("fn"))
  }

  /** Deterministic perturbed-prediction builder for panel-scale scoring
    * (q315's contract, reused by the 1M-graph bench entry): graphs
    * 0..nGraphs−1 over an indexed truth edge list — drop by
    * (g+3·idx)%5, reverse by (g+idx)%7, spurious self-loop by
    * (g+idx)%11 — pure integer arithmetic a SQL oracle can replay.
    * Returns (truth, predicted) edge DataFrames keyed by graphId.
    */
  def perturbedGraphs(spark: SparkSession, nGraphs: Long,
      edges: Seq[(Int, String, Int, String)]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val ed = spark.createDataset(edges).toDF("idx", "source", "lag", "target")
    val gs = spark.range(0, nGraphs).select(col("id").as("graphId"))
    val base = gs.crossJoin(broadcast(ed))
    val truth = base.select(col("graphId"), col("source"), col("target"),
      col("lag"))
    val flipRev = (col("graphId") + col("idx")) % 7 === 1
    val flipped = base
      .where((col("graphId") + lit(3) * col("idx")) % 5 =!= 0)
      .select(col("graphId"),
        when(flipRev, col("target")).otherwise(col("source")).as("source"),
        when(flipRev, col("source")).otherwise(col("target")).as("target"),
        col("lag"))
    val spurName =
      concat(lit("X"), ((col("graphId") + col("idx")) % 4 + 1).cast("string"))
    val spurious = base
      .where((col("graphId") + col("idx")) % 11 === 2)
      .select(col("graphId"), spurName.as("source"), spurName.as("target"),
        lit(0).as("lag"))
    (truth, flipped.unionByName(spurious).distinct())
  }

  /** Orientation-aware structural SHD (metrics_helper.py:80-138), per graph:
    * for each unordered pair {u,v} at each lag — cost 1 for an extra/missing
    * edge, 1 for a reversal (both single but opposite); self-loops add/delete
    * each cost 1. Expressed relationally over unordered-pair groups.
    */
  def shdStructural(truth: DataFrame, predicted: DataFrame): DataFrame = {
    def canon(df: DataFrame, tag: String): DataFrame =
      df.select(col("graphId"), col("source"), col("target"), col("lag"))
        .withColumn("u", least(col("source"), col("target")))
        .withColumn("v", greatest(col("source"), col("target")))
        .withColumn("fwd", (col("source") <= col("target")).cast("int"))
        .groupBy("graphId", "u", "v", "lag")
        .agg(max(when(col("fwd") === 1, 1).otherwise(0)).as(s"${tag}_fwd"),
             max(when(col("fwd") === 0, 1).otherwise(0)).as(s"${tag}_rev"))
    val t = canon(truth, "t")
    val p = canon(predicted, "p")
    val j = t.join(p, Seq("graphId", "u", "v", "lag"), "full_outer").na.fill(0)
    // pair-cost: reversal (exactly one direction each, opposite) = 1;
    // otherwise count direction mismatches
    val cost = when(
        col("t_fwd") + col("t_rev") === 1 && col("p_fwd") + col("p_rev") === 1 &&
        (col("t_fwd") =!= col("p_fwd")), 1)
      .otherwise(abs(col("t_fwd") - col("p_fwd")) + abs(col("t_rev") - col("p_rev")))
    j.withColumn("cost", cost)
      .groupBy("graphId").agg(sum("cost").as("shd_structural"))
  }
}
