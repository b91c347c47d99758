package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Smoothing

/** Holt smoothing recurrence (ops/Smoothing.scala) against a hand-rolled
  * Scala fold, plus contract checks for the q273/q275 profiling entries.
  */
class SmoothingProfilingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The declared contract, folded in plain Scala with Java integer
    * division (truncation toward zero — matching Spark div / DuckDB //).
    */
  private def holtRef(vs: Seq[Long], a: Long, b: Long): (Long, Long, Long) = {
    var l = vs(1)
    var bb = vs(1) - vs(0)
    var sse = 0L
    vs.drop(2).foreach { v =>
      val e = v - (l + bb)
      sse += e * e
      val lNew = (a * v + (100 - a) * (l + bb)) / 100
      bb = (b * (lNew - l) + (100 - b) * bb) / 100
      l = lNew
    }
    (l, bb, sse)
  }

  test("holt: HOF fold matches the hand-rolled recurrence, negatives included") {
    import spark.implicits._
    // a descending then oscillating series forces negative trend values
    // through the truncating divisions
    val vs = Seq(1000L, 900L, 700L, 720L, 400L, 950L, 100L, 105L, 2000L)
    val panel = vs.zipWithIndex
      .map { case (v, i) => ("s", (i + 10).toLong, v) }
      .toDF("series", "day", "v")
    val row = Smoothing.holt(panel).collect().head
    val (l, b, sse) = holtRef(vs, 30, 10)
    assert(row.getInt(1) == vs.size)
    assert(row.getLong(2) == l, "level")
    assert(row.getLong(3) == b, "trend")
    assert(row.getLong(4) == sse, "sse")
  }

  test("holt: rows arriving in shuffled order smooth identically (sorted fold)") {
    import spark.implicits._
    val vs = Seq(5L, 50L, 20L, 80L, 10L, 60L)
    val panel = vs.zipWithIndex.map { case (v, i) => ("s", i.toLong, v) }
    val out1 = Smoothing.holt(panel.toDF("series", "day", "v"))
      .collect().head.toSeq
    val out2 = Smoothing.holt(
      scala.util.Random.shuffle(panel).toDF("series", "day", "v"))
      .collect().head.toSeq
    assert(out1 == out2)
  }

  test("holt: constant series converges to zero trend and zero sse") {
    import spark.implicits._
    val panel = (1 to 12).map(i => ("c", i.toLong, 777L))
      .toDF("series", "day", "v")
    val row = Smoothing.holt(panel).collect().head
    assert(row.getLong(2) == 777L && row.getLong(3) == 0L
      && row.getLong(4) == 0L)
  }

  test("benford census: digits partition the rows and ppm table sums to ~1e6") {
    val out = SparkEntry.queries("q273_benford_audit")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.getInt(0)).sorted.toSeq == (1 to 9))
    val totalPpm = out.map(_.getLong(2)).sum
    assert(Math.abs(totalPpm - 1000000L) <= 5,
      s"Benford ppm table sums to $totalPpm")
    assert(out.forall(_.getLong(3) >= 0))
  }

  test("conformal: coverage of the held-out third lands near the 90% target") {
    val out = SparkEntry.queries("q275_conformal_interval")(
      spark, "/root/testdata/sf0.01").collect()
    assert(out.length == 5)
    out.foreach { r =>
      val cov = r.getLong(5)
      assert(cov > 800000L && cov <= 1000000L,
        s"${r.getString(0)} coverage_ppm=$cov outside (0.80, 1.00]")
    }
  }
}
