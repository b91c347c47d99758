package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence properties for the window/join shapes behind
  * q130/q141 (bucketed band join), q134 (skyline frontier), and q138
  * (weighted histogram median): each scalable formulation must equal its
  * naive definitional counterpart on random data — bucket boundaries,
  * dominance ties, and 50%-threshold edges are exactly where an
  * off-by-one would hide.
  */
class BandSkylineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("bucketed band join equals the naive range join (random event times)") {
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 3) {
      val tol = 100L
      val purchases = (0 until 40).map(i =>
        (rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(2000).toLong))
      val views = (0 until 200).map(_ =>
        (rnd.nextInt(5).toLong, rnd.nextInt(2000).toLong))
      val p = purchases.toDF("u", "pid", "pt")
        .withColumn("bucket", expr(s"pt div $tol"))
      val v = views.toDF("u", "vt")
        .withColumn("b0", expr(s"vt div $tol"))
        .select(col("u"), col("vt"),
          explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("bucket"))
      val bucketed = p.join(v, p("u") === v("u") && p("bucket") === v("bucket")
          && abs(col("vt") - col("pt")) <= tol, "left")
        .groupBy("pid").agg(count(col("vt")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val naive = purchases.map { case (u, pid, pt) =>
        pid -> views.count { case (vu, vt) => vu == u && math.abs(vt - pt) <= tol }.toLong
      }.toMap
      assert(bucketed === naive, s"trial $trial")
    }
  }

  test("windowed skyline equals brute-force Pareto dominance (random size/price)") {
    val rnd = new scala.util.Random(78)
    for (trial <- 1 to 3) {
      val parts = (0 until 120).map(i =>
        (i.toLong, (1 + rnd.nextInt(15)).toLong, (10 + rnd.nextInt(50)).toLong))
      val p = parts.toDF("id", "size", "price")
      val bySize = p.groupBy("size").agg(min("price").as("size_min"))
      val w = Window.orderBy(col("size").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val frontierSizes = bySize
        .withColumn("larger_min", min("size_min").over(w))
        .where(col("larger_min").isNull || col("size_min") < col("larger_min"))
        .select("size", "size_min")
      val got = p.join(frontierSizes, Seq("size"))
        .where(col("price") === col("size_min"))
        .select("id").collect().map(_.getLong(0)).toSet
      // definitional frontier: no other part with larger size AND lower
      // price, nor same size with lower price, nor larger size with equal
      // price (matches the windowed formulation's strict-dominance choice)
      val naive = parts.filter { case (_, s0, p0) =>
        !parts.exists { case (_, s1, p1) =>
          (s1 > s0 && p1 <= p0) || (s1 == s0 && p1 < p0)
        }
      }.map(_._1).toSet
      assert(got === naive, s"trial $trial")
    }
  }

  test("histogram weighted median equals brute force at the bin grain") {
    val rnd = new scala.util.Random(79)
    val binW = 10L
    for (trial <- 1 to 3) {
      val rows = (0 until 150).map(_ =>
        (s"g${rnd.nextInt(3)}", rnd.nextInt(300).toLong, (1 + rnd.nextInt(9)).toLong))
      val df = rows.toDF("g", "v", "wgt")
      val bins = df.groupBy(col("g"), expr(s"v div $binW").as("bin"))
        .agg(sum("wgt").as("w"))
      val wCum = Window.partitionBy("g").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy("g")
      val got = bins.withColumn("cum", sum("w").over(wCum))
        .withColumn("total", sum("w").over(wTot))
        .groupBy("g")
        .agg(min(when(col("cum") * 2 >= col("total"), col("bin") * binW))
          .as("m"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val naive = rows.groupBy(_._1).map { case (g, rs) =>
        // smallest bin whose cumulative weight reaches half the total
        val byBin = rs.groupBy(_._2 / binW).view.mapValues(_.map(_._3).sum)
          .toSeq.sortBy(_._1)
        val total = byBin.map(_._2).sum
        var cum = 0L
        g -> (byBin.collectFirst {
          case (bin, w) if { cum += w; cum * 2 >= total } => bin * binW
        }.get)
      }
      assert(got === naive, s"trial $trial")
    }
  }
}
