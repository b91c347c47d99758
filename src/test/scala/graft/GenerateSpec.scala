package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.generate.Generate

/** Ties the exact-integer structural trend/season contract (q31 oracle
  * surface) to the numeric double-valued precompute used by the kernel:
  * every sin/cos argument in `trendSeason` is 2π·arg/24 for the integer
  * `arg*_24` emitted by `trendSeasonStructural`, and trend is exactly
  * trend_micro·1e-6.
  */
class GenerateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("wideFast (InternalRow emission) is bitwise-identical to the typed wide path") {
    import graft.core.{Catalog, Grid}
    // one config per family: every ordering strategy, mask kind, and U shape
    val cfgs = Catalog.families.map(f =>
      Grid.forFamily(f).find(c => c.nPoints == 500 && c.nVars == 6 && c.maxLag == 2).get)
    val typed = Generate.wide(Generate.series(spark, cfgs))
    val fast = Generate.wideFast(spark, cfgs)
    assert(fast.schema == typed.schema, s"${fast.schema} vs ${typed.schema}")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d).toString
        case x => String.valueOf(x)
      }.mkString("|")).sorted.toSeq
    assert(key(fast) == key(typed))
  }

  test("trendSeasonStructural integers reproduce the numeric trendSeason") {
    val numeric = Generate.trendSeason(spark, nVars = 8, n = 200,
      trendStrength = 0.01, seasonalStrength = 0.5)
    val structural = Generate.trendSeasonStructural(spark, nVars = 8, n = 200,
      trendMicroPerVarT = 5000L)
    val joined = numeric.join(structural, Seq("t", "var_idx")).collect()
    assert(joined.length == 1600)
    joined.foreach { r =>
      val trend = r.getAs[Double]("trend")
      val season = r.getAs[Double]("season")
      val micro = r.getAs[Long]("trend_micro")
      val a1 = r.getAs[Long]("arg1_24")
      val a2 = r.getAs[Long]("arg2_24")
      assert(math.abs(trend - micro / 1e6) < 1e-9, s"trend at $r")
      val expected = 0.5 * (math.sin(2 * math.Pi * a1 / 24.0) +
        0.5 * math.cos(2 * math.Pi * a2 / 24.0))
      // season is rounded to 6dp; args differ from the structural ones only
      // by exact multiples of 2π
      assert(math.abs(season - expected) < 1e-6, s"season at $r")
    }
  }
}
