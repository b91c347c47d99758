package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Hilbert, HilbertUtil, ZOrder}

class HilbertSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hilbert index is a bijection on the full order-6 grid") {
    val n = 1 << 6
    val ds = for { x <- 0 until n; y <- 0 until n }
      yield HilbertUtil.index(6, x, y)
    assert(ds.toSet.size == n * n)
    assert(ds.min == 0L && ds.max == n.toLong * n - 1)
  }

  test("consecutive hilbert indexes are always grid neighbors (no jumps)") {
    val n = 1 << 6
    val byD = (for { x <- 0 until n; y <- 0 until n }
      yield HilbertUtil.index(6, x, y) -> (x, y)).sortBy(_._1).map(_._2)
    val jumps = byD.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1
    }
    assert(jumps == 0)
    // Morton, by contrast, jumps at every quadrant seam — sanity-check the
    // comparison is meaningful
    def morton(x: Int, y: Int): Long = (0 until 6).map { i =>
      (((x.toLong >> i) & 1) << (2 * i)) + (((y.toLong >> i) & 1) << (2 * i + 1))
    }.sum
    val byZ = (for { x <- 0 until n; y <- 0 until n }
      yield morton(x, y) -> (x, y)).sortBy(_._1).map(_._2)
    val zJumps = byZ.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1
    }
    assert(zJumps > 0)
  }

  test("codegen'd expression matches the static loop") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val pts = Seq.fill(300)((rng.nextInt(256).toLong, rng.nextInt(256).toLong))
    val got = pts.toDF("x", "y")
      .withColumn("hd", Hilbert.hValue(col("x"), col("y"), 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, hd) =>
      assert(hd == HilbertUtil.index(8, x, y), s"($x,$y)")
    }
  }

  test("hilbert buckets have tighter envelopes than z-order on the lattice") {
    val pts = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .select(expr("(c_custkey * 48271) % 100000").as("x"),
        expr("(c_custkey * 69621) % 100000").as("y"))
      .withColumn("gx", expr("(x * 256) div 100000"))
      .withColumn("gy", expr("(y * 256) div 100000"))
      .withColumn("hd", Hilbert.hValue(col("gx"), col("gy"), 8))
      .withColumn("zd", ZOrder.zValue(col("gx"), col("gy"), 8))
    // 100 cells/bucket — NOT a power of 4, where both curves degenerate
    // to identical aligned quadrant tiles
    def sumArea(bucket: String): Long = pts.groupBy(expr(s"$bucket div 100"))
      .agg(min("gx").as("x0"), max("gx").as("x1"),
        min("gy").as("y0"), max("gy").as("y1"))
      .agg(sum(expr("(x1 - x0 + 1) * (y1 - y0 + 1)")))
      .head().getLong(0)
    val (h, z) = (sumArea("hd"), sumArea("zd"))
    assert(h * 2 <= z, s"hilbert $h vs zorder $z")
  }
}
