package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Anomaly, CovMatrix, PageRank, ZOrder}

/** Unit contracts for the layout/graph/stats operators: z-order interleave
  * bit math, integer PageRank invariants, one-pass covariance sums vs a
  * brute-force reference, and CUSUM peak detection on a hand-built shift.
  */
class RankLayoutStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // reference interleave, bit by bit
  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches the bit-by-bit reference and is injective on the grid") {
    val df = (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        ZOrder.zValue(col("x"), col("y"), 5).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (((x, y), z) <- got) assert(z === zRef(x, y, 5), s"($x,$y)")
    assert(got.values.toSet.size === 1024, "interleave must be injective")
    assert(got((31L, 31L)) === 1023L)
  }

  test("layoutStats buckets bound both dimension envelopes") {
    val df = (for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)).toDF("x", "y")
    val stats = ZOrder.layoutStats(df, "x", "y", bits = 6, bucketShift = 8)
      .collect()
    assert(stats.map(_.getAs[Long]("cnt")).sum === 64L * 64)
    // 12-bit z, 8-bit shift → 16 buckets, each a 16x16 tile: envelope ≤ 15
    assert(stats.length === 16)
    for (r <- stats) {
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") <= 15)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") <= 15)
    }
  }

  test("PageRank: uniform cycle is a fixpoint at 1.0") {
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val ranks = PageRank.rankMicro(edges, iterations = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // contribution = 1e6·1/1 → rank = 150000 + 850·1e6/1000 = 1e6 every step
    assert(ranks === Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L))
  }

  test("PageRank: a sink hub outranks its spokes, dangling mass decays leaves") {
    val edges = Seq(("l1", "hub", 1L), ("l2", "hub", 1L), ("l3", "hub", 3L))
      .toDF("src", "dst", "w")
    val ranks = PageRank.rankMicro(edges, iterations = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // leaves get no inflow: rank fixes at the base 150000 after one step
    assert(ranks("l1") === 150000L)
    // hub inflow iter1: 3 spokes × ⌊1e6·w/w⌋ = 3e6 → 150000 + 2550000;
    // iter2: spokes at 150000 → 3·150000 → 150000 + ⌊850·450000/1000⌋
    assert(ranks("hub") === 150000L + 850L * 450000L / 1000L)
  }

  test("CovMatrix.pairSums equals the brute-force sums on every pair") {
    val rows = Seq((1L, 10L, 3L), (2L, 20L, 5L), (3L, 30L, 7L), (4L, 10L, 2L))
    val df = rows.toDF("a", "b", "c")
    val out = CovMatrix.pairSums(df, Seq("a" -> col("a"), "b" -> col("b"),
        "c" -> col("c")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("n") === 4)
    assert(ab.getAs[Long]("s_a") === rows.map(_._1).sum)
    assert(ab.getAs[Long]("s_b") === rows.map(_._2).sum)
    assert(ab.getAs[Long]("s_ab") === rows.map(r => r._1 * r._2).sum)
    assert(ab.getAs[Long]("s_aa") === rows.map(r => r._1 * r._1).sum)
    assert(ab.getAs[Long]("s_bb") === rows.map(r => r._2 * r._2).sum)
    val bc = out(("b", "c"))
    assert(bc.getAs[Long]("s_ab") === rows.map(r => r._2 * r._3).sum)
  }

  test("cusumPeaks finds the level shift at its deepest excursion") {
    // mean = 5; devs -5×3 then +5×3; cusum -5,-10,-15,-10,-5,0
    val ev = Seq(("u", 1L, 1L, 0L), ("u", 2L, 2L, 0L), ("u", 3L, 3L, 0L),
        ("u", 4L, 4L, 10L), ("u", 5L, 5L, 10L), ("u", 6L, 6L, 10L))
      .toDF("k", "ts", "id", "v")
    val out = Anomaly.cusumPeaks(ev, "k", "ts", "id", "v").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === 6)
    assert(r.getAs[Long]("cusum_max") === 0L)
    assert(r.getAs[Long]("cusum_min") === -15L)
    assert(r.getAs[Long]("peak_ts") === 3L)
    assert(r.getAs[Long]("peak_abs") === 15L)
  }

  test("Triangles.census: K3 and K4 close fully, a path closes nothing") {
    import graft.ops.Triangles
    // K3, with duplicate + reversed edges to exercise normalization
    val k3 = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L)).toDF("x", "y")
    val r3 = Triangles.census(k3, "x", "y").collect().head
    assert(r3.getAs[Long]("n_edges") === 3)
    assert(r3.getAs[Long]("n_wedges") === 3)
    assert(r3.getAs[Long]("n_triangles") === 1)
    assert(r3.getAs[Long]("closure_permille") === 1000L)
    val k4 = (for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong))
      .toDF("x", "y")
    val r4 = Triangles.census(k4, "x", "y").collect().head
    assert(r4.getAs[Long]("n_triangles") === 4)
    assert(r4.getAs[Long]("n_wedges") === 12)
    assert(r4.getAs[Long]("closure_permille") === 1000L)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y")
    val rp = Triangles.census(path, "x", "y").collect().head
    assert(rp.getAs[Long]("n_triangles") === 0)
    assert(rp.getAs[Long]("n_wedges") === 2)
    assert(rp.getAs[Long]("closure_permille") === 0L)
  }

  test("conversionStats: converted, unconverted, and pre-from events are split correctly") {
    import graft.ops.Funnel
    val ev = Seq(
      ("u1", "view", 100L), ("u1", "purchase", 150L),     // converts, lag 50
      ("u2", "view", 100L), ("u2", "click", 200L),        // views, no purchase
      ("u3", "purchase", 50L), ("u3", "view", 100L),      // purchase BEFORE view
      ("u4", "click", 10L)                                 // never views
    ).toDF("user_id", "event_type", "ts_us")
    val r = Funnel.conversionStats(ev, "user_id", "event_type", "ts_us",
      "view", "purchase").collect().head
    assert(r.getAs[Long]("n_users") === 4)
    assert(r.getAs[Long]("n_from") === 3)
    assert(r.getAs[Long]("n_converted") === 1)
    assert(r.getAs[Long]("lag_sum_us") === 50L)
  }

  test("conversionStats: a purchase at exactly the first view counts") {
    import graft.ops.Funnel
    val ev = Seq(("u", "view", 100L), ("u", "purchase", 100L))
      .toDF("user_id", "event_type", "ts_us")
    val r = Funnel.conversionStats(ev, "user_id", "event_type", "ts_us",
      "view", "purchase").collect().head
    assert(r.getAs[Long]("n_converted") === 1)
    assert(r.getAs[Long]("lag_sum_us") === 0L)
  }

  test("Robust.medianMadOutliers: exact lower median, MAD, spike immunity") {
    import graft.ops.Robust
    // odd group: values 1,2,3,4,100 → med 3 (2·cum≥n first at v=3),
    // devs {2,1,0,1,97} → MAD 1, outliers beyond 5·MAD: the 100 spike
    // even group: 1,2,3,4 → lower median 2
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L),
        ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L))
      .toDF("k", "v")
    val out = Robust.medianMadOutliers(df, "k", "v", 5)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n") === 5)
    assert(a.getAs[Long]("median") === 3L)
    assert(a.getAs[Long]("mad") === 1L)
    assert(a.getAs[Long]("n_outliers") === 1L)
    val b = out("b")
    assert(b.getAs[Long]("median") === 2L)
    assert(b.getAs[Long]("mad") === 1L)
    assert(b.getAs[Long]("n_outliers") === 0L)
  }

  test("cusumPeaks peak tie breaks on earliest timestamp") {
    // mean = 0; cusum 1,0,1,0 → |cusum| peaks of 1 at ts 1 and 3: pick 1
    val ev = Seq(("u", 1L, 1L, 1L), ("u", 2L, 2L, -1L),
        ("u", 3L, 3L, 1L), ("u", 4L, 4L, -1L))
      .toDF("k", "ts", "id", "v")
    val r = Anomaly.cusumPeaks(ev, "k", "ts", "id", "v").collect().head
    assert(r.getAs[Long]("peak_ts") === 1L)
    assert(r.getAs[Long]("peak_abs") === 1L)
  }
}
