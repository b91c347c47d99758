package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass covariance/correlation sufficient statistics over k integer
  * columns — the full pairwise matrix from a SINGLE aggregate.
  *
  * For k columns the aggregate computes n, k sums, k sums-of-squares and
  * k·(k−1)/2 cross-product sums in one map-side-combinable pass (one row
  * out), then explodes that row into one record per unordered pair. Nothing
  * about the pair count touches the data pass: the corpus is read ONCE, the
  * shuffle carries a single sufficient-statistics row, and covariance /
  * correlation / OLS for every pair are driver-side arithmetic on the
  * output:
  *
  *   cov_num   = n·Σab − Σa·Σb          (n² × covariance)
  *   var_num_a = n·Σa² − (Σa)²          (n² × variance)
  *   corr²     = cov_num² / (var_num_a · var_num_b)
  *
  * PURE INTEGER contract: inputs are pre-quantized integer columns (cents,
  * permille, micro — caller's choice); accumulation is DECIMAL(38,0) (the
  * [[ExactStats]] / [[Anomaly]] discipline: widen BEFORE the product), and
  * the emitted sums are cast to BIGINT. Magnitude bound for the emitted
  * longs: n·max(|a·b|) < 2^63 ≈ 9.2e18 — e.g. 10^10 rows at |a|,|b| ≤ 3·10^4.
  * Past that, re-quantize coarser or read the DECIMAL columns before the
  * final cast (the internal accumulators are good to 10^38).
  *
  * Reference anchor: the reference computes no cross-series statistics; this
  * generalizes its per-series OLS fit (SURVEY §3.3 R12, `ops/OlsAggregator`)
  * to the pairwise matrix a feature-correlation or redundancy scan needs.
  *
  * SIZE LIMIT: each sum is its own Catalyst agg expression, so analysis
  * cost grows as k² — fine for a handful of columns (q88's 3), a ~20 s
  * driver stall by k = 64. Wide-k vector columns use [[CovVec]] (one
  * typed aggregate, same output contract) instead.
  */
object CovMatrix {

  /** Pairwise sufficient statistics for `cols` = (name, integer expression).
    * Output: (col_a, col_b, n, s_a, s_b, s_ab, s_aa, s_bb), one row per
    * unordered pair in input order (a before b).
    *
    * `decimalOut = true` skips the final BIGINT cast and emits the raw
    * DECIMAL(38,0) accumulators — for consumers (q317/q318 PCA) whose
    * downstream arithmetic stays in exact decimal and whose n·|a·b|
    * magnitude can pass 2^63 at corpus scale.
    */
  def pairSums(df: DataFrame, cols: Seq[(String, Column)],
      decimalOut: Boolean = false): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val named = cols.map { case (n, c) => (n, dec(c.cast("long"))) }
    val pairs = for {
      (a, i) <- named.zipWithIndex
      b <- named.drop(i + 1)
    } yield (a, b)
    val aggs =
      named.map { case (n, c) => sum(c).as(s"s_$n") } ++
      named.map { case (n, c) => sum(c * c).as(s"q_$n") } ++
      pairs.map { case ((na, ca), (nb, cb)) => sum(ca * cb).as(s"p_${na}_$nb") } :+
      count(lit(1)).as("n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val out = (c: Column) => if (decimalOut) c else c.cast("long")
    val records = pairs.map { case ((na, _), (nb, _)) =>
      struct(lit(na).as("col_a"), lit(nb).as("col_b"), col("n").as("n"),
        out(col(s"s_$na")).as("s_a"), out(col(s"s_$nb")).as("s_b"),
        out(col(s"p_${na}_$nb")).as("s_ab"),
        out(col(s"q_$na")).as("s_aa"), out(col(s"q_$nb")).as("s_bb"))
    }
    row.select(explode(array(records: _*)).as("r")).select(col("r.*"))
  }
}
