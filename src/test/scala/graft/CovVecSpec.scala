package graft

import java.math.BigInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CovVec

/** CovVec: the single-buffer wide-k covariance aggregate — brute-force
  * equality (nulls and ragged arrays included), an overflow-spill pass at
  * near-2³¹ magnitudes, and the finish-time power iteration against a
  * hand-rolled reference loop.
  */
class CovVecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val k = 5
  private def pairPos(i: Int, j: Int): Int =
    1 + k + i * k - i * (i - 1) / 2 + (j - i)

  /** Brute-force sufficient stats with per-slot null skipping; a sum
    * that received no contribution is None — SQL's empty-sum NULL.
    */
  private def brute(rows: Seq[Seq[Option[Long]]]): Map[Int, Option[BigInt]] = {
    val m = scala.collection.mutable.Map.empty[Int, BigInt]
    rows.foreach { xs =>
      for (i <- 0 until k; vi <- xs.lift(i).flatten) {
        m(1 + i) = m.getOrElse(1 + i, BigInt(0)) + vi
        for (j <- i until k; vj <- xs.lift(j).flatten)
          m(pairPos(i, j)) =
            m.getOrElse(pairPos(i, j), BigInt(0)) + BigInt(vi) * BigInt(vj)
      }
    }
    // every slot — untouched ones as None; n (pos 0) always present
    (Map(0 -> Some(BigInt(rows.size))) ++
      (1 until (1 + k + k * (k + 1) / 2)).map(p => p -> m.get(p))).toMap
  }

  private def run(rows: Seq[Seq[Option[Long]]]): Map[Int, Option[BigInt]] = {
    val df = rows.toDF("arr").repartition(3)
    CovVec.suffStats(df, col("arr"), k)
      .collect().map(r => r.getInt(0) ->
        Option(r.getDecimal(1)).map(d => BigInt(d.toBigInteger))).toMap
  }

  test("suffStats equals brute force with nulls and ragged arrays") {
    val rnd = new scala.util.Random(42)
    val rows: Seq[Seq[Option[Long]]] = (0 until 200).map { _ =>
      (0 until (1 + rnd.nextInt(k))).map { _ =>
        if (rnd.nextInt(5) == 0) None
        else Some(rnd.nextLong() % 1000L)
      }
    }
    assert(run(rows) === brute(rows))
  }

  test("suffStats is exact across the long-overflow spill boundary") {
    // |slot| ~2^31−1 → every row's product step (~4.6e18) trips the
    // BigInteger spill; the total passes 2^63 many times over
    val big = (1L << 31) - 1L
    val rows: Seq[Seq[Option[Long]]] =
      Seq.fill(40)(Seq(Some(big), Some(-big), None, Some(big), Some(1L)))
    assert(run(rows) === brute(rows))
    // sanity: the b·b sum really is past Long range, and the
    // never-observed dim 2 emits SQL NULL, not 0
    assert(brute(rows)(pairPos(0, 0)).get > BigInt(Long.MaxValue))
    assert(run(rows)(pairPos(2, 2)).isEmpty && run(rows)(1 + 2).isEmpty)
  }

  test("slot magnitude past 2^31 is rejected, not silently wrapped") {
    val df = Seq(Seq(Some(1L << 31), Some(0L), Some(0L), Some(0L), Some(0L)))
      .toDF("arr")
    val e = intercept[Exception] {
      CovVec.suffStats(df, col("arr"), k).collect()
    }
    assert(e.getMessage.contains("re-quantize") ||
      e.getCause != null && e.getCause.getMessage.contains("re-quantize"))
  }

  test("topComponent matches a hand-rolled exact power iteration") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[Seq[Option[Long]]] =
      (0 until 100).map(_ => (0 until k).map(_ => Some(rnd.nextInt(2000) - 1000L)))
    val iters = 6
    val got = graft.ops.CovVec
      .topComponentArr(rows.toDF("arr").repartition(3), col("arr"), k, iters)
      .collect().head.getSeq[Long](0)
    // reference loop: BigInteger covariance numerators + truncating div
    val s = brute(rows)
    val n = BigInt(rows.size)
    val c = Array.tabulate(k, k) { (i, j) =>
      val (a, b) = (math.min(i, j), math.max(i, j))
      n * s(pairPos(a, b)).get - s(1 + i).get * s(1 + j).get
    }
    var w = Array.fill(k)(BigInt(1000000))
    for (_ <- 1 to iters) {
      val cw = Array.tabulate(k)(i => (0 until k).map(j => c(i)(j) * w(j)).sum)
      val mx = cw.map(_.abs).max
      w = if (mx == 0) Array.fill(k)(BigInt(0))
          else cw.map(v => (v * 1000000) / mx) // BigInt / truncates toward 0
    }
    assert(got === w.map(_.toLong).toSeq)
  }

  test("never-co-observed pair: NULL cell drops from the iteration, a " +
      "never-observed dim gets a NULL weight — the engines' sum()/CASE " +
      "semantics") {
    // dim 4 never observed; dims 0-3 dense — its sums and every pair
    // involving it must be SQL NULL, and its component weight null
    val rnd = new scala.util.Random(5)
    val rows: Seq[Seq[Option[Long]]] = (0 until 60).map(_ =>
      (0 until k).map(i =>
        if (i == 4) None else Some(rnd.nextInt(200) - 100L)))
    val ss = run(rows)
    assert(ss(1 + 4).isEmpty && ss(pairPos(0, 4)).isEmpty &&
      ss(pairPos(4, 4)).isEmpty)
    assert(ss(pairPos(0, 1)).isDefined)
    val w = CovVec.topComponentArr(rows.toDF("arr").repartition(3),
        col("arr"), k, 4)
      .collect().head.getSeq[java.lang.Long](0)
    assert(w(4) == null, s"dim 4 must carry a NULL weight: $w")
    assert((0 until 4).forall(w(_) != null))
  }

  test("topComponent is partitioning-invariant (merge path exercised)") {
    val rnd = new scala.util.Random(11)
    val rows: Seq[Seq[Option[Long]]] =
      (0 until 120).map(_ => (0 until k).map(_ => Some(rnd.nextInt(200) - 100L)))
    val one = CovVec.topComponentArr(rows.toDF("arr").coalesce(1),
      col("arr"), k, 4).collect().head.getSeq[Long](0)
    val many = CovVec.topComponentArr(rows.toDF("arr").repartition(7),
      col("arr"), k, 4).collect().head.getSeq[Long](0)
    assert(one === many)
  }
}
