package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence for the classical series-statistics contracts
  * behind q150-q153: the distributed exact-integer formulations must equal
  * a naive BigInt reimplementation on random series — zero-variance
  * groups, negative covariance, and median tie plateaus are where the
  * contracts could silently diverge from their definitions.
  */
class SeriesStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** BigInt closed form of pairCorr's (cov_sign, slope_milli, r2_ppm). */
  private def naiveCorr(xs: Seq[Long], ys: Seq[Long])
      : (Long, Option[Long], Option[Long]) = {
    val n = BigInt(xs.size)
    val sx = xs.map(BigInt(_)).sum
    val sy = ys.map(BigInt(_)).sum
    val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
    val sxx = xs.map(a => BigInt(a) * a).sum
    val syy = ys.map(b => BigInt(b) * b).sum
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    val slope =
      if (varx == 0) None
      else Some(math.floor(cov.toDouble / varx.toDouble * 1000 + 0.5).toLong)
    val r2 =
      if (varx == 0 || vary == 0) None
      else Some(math.floor(cov.toDouble * cov.toDouble
        / (varx.toDouble * vary.toDouble) * 1e6 + 0.5).toLong)
    (cov.signum.toLong, slope, r2)
  }

  test("pairCorr equals the BigInt closed form on random paired series") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val n = 3 + rnd.nextInt(50)
      val xs = trial match {
        case 3 => Seq.fill(n)(7L) // zero variance in x
        case _ => Seq.fill(n)(rnd.nextInt(1000).toLong)
      }
      val ys = trial match {
        case 1 => xs // perfect positive correlation
        case 2 => xs.map(1000L - _) // perfect negative correlation
        case 4 => Seq.fill(n)(3L) // zero variance in y
        case _ => Seq.fill(n)(rnd.nextInt(1000).toLong)
      }
      val df = xs.zip(ys).toDF("x", "y").withColumn("g", lit(1L))
      val row = SparkEntry.pairCorr(df, Seq("g")).collect().head
      val (sign, slope, r2) = naiveCorr(xs, ys)
      assert(row.getAs[Long]("n_pairs") == n.toLong, s"trial $trial n")
      assert(row.getAs[Long]("cov_sign") == sign, s"trial $trial sign")
      assert(Option(row.getAs[java.lang.Long]("slope_milli"))
        .map(_.toLong) == slope, s"trial $trial slope")
      assert(Option(row.getAs[java.lang.Long]("r2_ppm"))
        .map(_.toLong) == r2, s"trial $trial r2")
      if (trial == 1) assert(row.getAs[java.lang.Long]("r2_ppm") == 1000000L)
    }
  }

  test("Theil-Sen lower median equals the naive sorted pairwise slopes") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val nM = 4 + rnd.nextInt(20)
      // non-contiguous months with duplicate-slope plateaus likely
      val months = rnd.shuffle((0 until 60).toList).take(nM).sorted
        .map(_.toLong)
      val revs = months.map(_ => rnd.nextInt(2000).toLong - 500L)
      val slopes = for {
        i <- months.indices; j <- months.indices if months(j) > months(i)
      } yield math.floor(1000.0 * (revs(j) - revs(i)).toDouble
        / (months(j) - months(i)).toDouble + 0.5).toLong
      val expected = slopes.sorted.apply((slopes.size + 1) / 2 - 1)

      val monthly = months.zip(revs).toDF("m", "rev_cents")
        .withColumn("n_name", lit("X"))
      val bSide = monthly.select(col("n_name").as("nn2"), col("m").as("m2"),
        col("rev_cents").as("rc2"))
      val pairs = monthly.join(bSide,
          col("n_name") === col("nn2") && col("m2") > col("m"))
        .select(col("n_name"),
          expr("cast(floor(1000.0 * cast(rc2 - rev_cents as double) " +
            "/ cast(m2 - m as double) + 0.5) as bigint)").as("slope_milli"))
      val got = pairs
        .withColumn("rn",
          row_number().over(Window.partitionBy("n_name")
            .orderBy(col("slope_milli"))))
        .withColumn("n_pairs",
          count(lit(1)).over(Window.partitionBy("n_name")))
        .where(col("rn") === expr("(n_pairs + 1) div 2"))
        .collect().head
      assert(got.getAs[Long]("n_pairs") == slopes.size.toLong)
      assert(got.getAs[Long]("slope_milli") == expected, s"trial $trial")
    }
  }

  test("integer SES (q172's HOF walk) equals the sequential fold") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val n = 1 + rnd.nextInt(40)
      val vs = Seq.fill(n)(rnd.nextInt(1000000).toLong)
      val expected = vs.tail.foldLeft(vs.head)((l, v) => (v + 3 * l) / 4)
      val df = vs.zipWithIndex
        .map { case (v, i) => (1L, i.toLong, i.toLong, v) }
        .toDF("user_id", "ts_us", "event_id", "vm")
      val got = df.groupBy("user_id")
        .agg(array_sort(collect_list(struct(col("ts_us"), col("event_id"),
          col("vm")))).as("seq"))
        .select(expr("aggregate(seq, -1L, (acc, x) -> " +
          "case when acc < 0 then x.vm " +
          "else (x.vm + 3 * acc) div 4 end)").as("lvl"))
        .collect().head.getAs[Long]("lvl")
      assert(got == expected, s"trial $trial n=$n")
    }
  }
}
