package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Mixing, Sampling}

class MixingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()

  test("temperature targets: shares sum to ~1, monotone in n, and upweight low-resource strata") {
    val t = Mixing.sqrtTemperatureTargets(docs, "lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._2)
    // floor rounding loses at most 1ppm per stratum
    val ppm = t.map(_._3).sum
    assert(ppm <= 1000000L && ppm > 1000000L - t.length)
    assert(t.map(_._4).sum <= docs.count())
    // share grows with n, but the per-doc rate (upweighting) shrinks with n
    assert(t.map(_._3).toSeq.sliding(2).forall { case Seq(a, b) => a <= b })
    assert(t.map(_._5).toSeq.sliding(2).forall { case Seq(a, b) => a >= b },
      "low-resource strata must get the higher sampling rate")
  }

  test("targets compose with the stratified sampler") {
    val rates = Mixing.sqrtTemperatureTargets(docs, "lang").collect()
      .map(r => r.getString(0) -> r.getLong(4).toInt).toMap
    val kept = Sampling.stratifiedContentSample(docs, "text", "lang", rates, 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = Mixing.sqrtTemperatureTargets(docs, "lang").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // the content hash is ~uniform: kept counts track targets loosely
    targets.foreach { case (lang, target) =>
      val k = kept.getOrElse(lang, 0L).toDouble
      assert(math.abs(k - target) <= math.max(10.0, 0.5 * target),
        s"$lang: kept $k vs target $target")
    }
  }
}
