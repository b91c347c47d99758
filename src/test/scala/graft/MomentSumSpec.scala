package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.metrics.Causal

/** r14 optimization guard: the fact-scale moment aggregates switched their
  * accumulation buffers from DECIMAL(38,0) to LONG (the per-row Decimal
  * allocation was the hot path of every pc-skeleton/estimation consumer);
  * the 128-bit-needing combine n*S_ab - S_a*S_b stays on decimal casts per
  * OUTPUT pair. Under ANSI (the session default) an out-of-budget input now
  * fails loudly in the sum instead of wrapping. This spec pins that the
  * long path equals an explicit decimal reference AT THE DOCUMENTED BUDGET
  * BOUNDARY:
  *  - virtualCrossMoments(Sparse): Sum|va*vb| < 2^63 per pair — exercised
  *    with mean-heavy values at n = 5e4 where Sum(va*vb) ~ 8.4e18 (91% of
  *    the boundary) while C stays inside its long output contract (large
  *    means inflate the sums, not the centered moment).
  *  - rankCrossMoments: ranks <= n; the r14 change also widened the rank
  *    product to long (row_number is int, so the OLD code's int product
  *    overflowed past n = 46,341) — exercised at n = 55k with perfectly
  *    anti-correlated series (maximal |C| = n^2(n^2-1)/12 ~ 7.6e17).
  */
class MomentSumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("virtualCrossMoments long accumulation = decimal reference at the " +
      "sum budget boundary (n=5e4, mean-heavy values)") {
    val n = 50000L
    // Sum(va*vb) over the AB pair ~ n * 1.69e14 = 8.45e18 < 2^63; the
    // small per-row jitter keeps C nonzero but far inside its long bound
    val virt = spark.range(0, n).select(col("id").as("t"))
      .select(explode(array(
        struct(lit("A@0").as("vs"), col("t"),
          (lit(13000000L) - col("t") % 2).as("v")),
        struct(lit("B@0").as("vs"), col("t"),
          (lit(12999999L) + col("t") % 3).as("v")))).as("r"))
      .select(col("r.vs").as("vs"), col("r.t").as("t"), col("r.v").as("v"))
    val got = Causal.virtualCrossMoments(virt, col("t") >= 0)
      .orderBy("na", "nb").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // decimal reference: the pre-r14 aggregation, written out longhand
    val v = virt
    val a = v.select(col("vs").as("na"), col("t"), col("v").as("va"))
    val b = v.select(col("vs").as("nb"), col("t"), col("v").as("vb"))
    val ref = a.join(b, Seq("t")).where(col("na") <= col("nb"))
      .groupBy("na", "nb")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("va").cast("decimal(38,0)")).as("sa"),
        sum(col("vb").cast("decimal(38,0)")).as("sb"),
        sum((col("va") * col("vb")).cast("decimal(38,0)")).as("sab"))
      .select(col("na"), col("nb"), col("n").cast("long").as("n"),
        expr("n*sab - sa*sb").cast("long").as("c"))
      .orderBy("na", "nb").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == ref.toSeq)
    assert(got.forall(_._4 != 0L), "centered moments must be nonzero")
  }

  test("virtualCrossMomentsSparse matches dense restricted to wanted at " +
      "the same boundary") {
    import spark.implicits._
    val n = 50000L
    val virt = spark.range(0, n).select(col("id").as("t"))
      .select(explode(array(
        struct(lit("A@0").as("vs"), col("t"),
          (lit(13000000L) - col("t") % 5).as("v")),
        struct(lit("B@0").as("vs"), col("t"),
          (lit(12999997L) + col("t") % 7).as("v")))).as("r"))
      .select(col("r.vs").as("vs"), col("r.t").as("t"), col("r.v").as("v"))
    val wanted = Seq(("A@0", "A@0"), ("A@0", "B@0"), ("B@0", "B@0"))
      .toDF("na", "nb")
    val sparse = Causal.virtualCrossMomentsSparse(virt, wanted,
      col("t") >= 0).orderBy("na", "nb").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val dense = Causal.virtualCrossMoments(virt, col("t") >= 0)
      .orderBy("na", "nb").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(sparse.toSeq == dense.toSeq)
  }

  test("rankCrossMoments long accumulation = decimal reference at n=55k " +
      "anti-correlated ranks (past the old int-product bound)") {
    val n = 55000L
    // one ascending, one descending series: rank reversal maximizes |C|
    val panel = spark.range(0, n).select(col("id").as("day"))
      .select(explode(array(
        struct(lit("A").as("series"), col("day"), col("day").as("v")),
        struct(lit("B").as("series"), col("day"), (lit(n) - col("day"))
          .as("v")))).as("r"))
      .select(col("r.series").as("series"), col("r.day").as("day"),
        col("r.v").as("v"))
    val got = Causal.rankCrossMoments(Causal.rankPanel(panel))
      .orderBy("sa", "sb").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ranked = Causal.rankPanel(panel)
    val a = ranked.select(col("series").as("sa"), col("day"),
      col("r").as("ra"))
    val b = ranked.select(col("series").as("sb"), col("day"),
      col("r").as("rb"))
    // decimal reference with the same long-widened product (the old int
    // product would ANSI-overflow here — that widening is itself part of
    // the r14 change under test)
    val ref = a.join(b, Seq("day"))
      .groupBy("sa", "sb")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("ra").cast("decimal(38,0)")).as("sra"),
        sum(col("rb").cast("decimal(38,0)")).as("srb"),
        sum((col("ra").cast("long") * col("rb")).cast("decimal(38,0)"))
          .as("srab"))
      .select(col("sa"), col("sb"), col("n").cast("long").as("n"),
        expr("n*srab - sra*srb").cast("long").as("c"))
      .orderBy("sa", "sb").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == ref.toSeq)
    // perfect anti-correlation: C_ab = -C_aa exactly (rank reversal)
    val m = got.map(x => (x._1, x._2) -> x._4).toMap
    assert(m(("A", "A")) == -m(("A", "B")))
    assert(m(("A", "A")) == n * n * (n * n - 1) / 12,
      "C_aa must be the exact Spearman normalizer n^2(n^2-1)/12")
  }
}
