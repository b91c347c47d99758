package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing: temperature-based rebalancing of strata (languages,
  * sources) — the standard multilingual recipe pₗ^α / Σ pₗ^α that upweights
  * low-resource strata. α is fixed at 0.5: IEEE-754 requires sqrt to be
  * correctly rounded (so Spark's Math.sqrt and DuckDB's C sqrt agree
  * bitwise), which a general pow(x, α) does NOT guarantee across libms —
  * the same reasoning that keeps transcendental logs out of every other
  * oracle contract in this engine.
  *
  * Everything downstream of the single sqrt is exact integer arithmetic:
  * w = floor(√n·1e6), share_ppm = w·1e6 div Σw, target = share·N div 1e6,
  * and the per-stratum permille rate is exactly what
  * [[Sampling.stratifiedContentSample]] consumes — the two ops compose into
  * a rebalanced deterministic sample.
  *
  * Scale shape: one groupBy over the corpus (map-side combined), then
  * arithmetic over |strata| rows with the 1-row total broadcast — nothing
  * after the first aggregate depends on corpus size.
  */
object Mixing {

  /** Magnitude bound: w_micro ≤ √n·1e6, so w_micro·1e6 stays inside a LONG
    * for n up to ~8·10¹³ rows per stratum; share_ppm·Σn needs Σn ≲ 9·10¹².
    * Beyond that, widen the two products to DECIMAL(38,0).
    */
  def sqrtTemperatureTargets(df: DataFrame, strataCol: String): DataFrame = {
    val counts = df.groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_micro", floor(sqrt(col("n_docs").cast("double")) * lit(1e6)))
    val totals = counts.agg(sum("w_micro").as("sum_w"), sum("n_docs").as("total"))
    counts.crossJoin(broadcast(totals))
      .withColumn("share_ppm", expr("(w_micro * 1000000) div sum_w"))
      .withColumn("target_docs", expr("(share_ppm * total) div 1000000"))
      .withColumn("sample_permille",
        least(lit(1000L), expr("(target_docs * 1000) div n_docs")))
      .select("stratum", "n_docs", "share_ppm", "target_docs", "sample_permille")
  }

  /** Greedy token-budget fill per stratum: rank documents inside each
    * stratum by (tokens desc, id asc — deterministic), take the prefix whose
    * INCLUSIVE cumulative token count fits `budgetTokens`, and report what
    * the budget kept vs what existed. This is the "fill each mixture
    * component to its token budget" step that follows target-share planning
    * ([[sqrtTemperatureTargets]] decides shares; this enforces them in
    * actual tokens).
    *
    * Distribution: ONE shuffle partitioning by stratum; ranking, prefix sum
    * and the kept/total aggregates all evaluate inside that partition.
    * Output is |strata| rows. Greedy-prefix means a doc larger than the
    * remaining budget ends the fill (no skip-and-continue knapsack) — the
    * deterministic contract real samplers use.
    */
  def tokenBudgetFill(df: DataFrame, strataCol: String, idCol: String,
      tokensCol: Column, budgetTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum")
      .orderBy(col("n_tokens").desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.select(col(strataCol).as("stratum"), col(idCol),
        tokensCol.cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs_total"),
        sum("n_tokens").as("tokens_total"),
        count(when(col("cum_tokens") <= budgetTokens, 1)).as("n_docs_kept"),
        sum(when(col("cum_tokens") <= budgetTokens, col("n_tokens"))
          .otherwise(lit(0L))).as("tokens_kept"))
  }
}
