package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Events

/** Events.tsRangeNs: the pushdown-safe range scan must select exactly the
  * rows the normalized-ns predicate would, on BOTH physical encodings the
  * driver has shipped (raw long ns; TIMESTAMP_NTZ µs) — including ns bounds
  * that do not fall on µs boundaries, where the inverse mapping must ceil.
  */
class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // µs-grain event times; ns bounds chosen strictly between µs ticks so a
  // naive floor-division of the bounds would mis-select the edges
  private val tsUs = Seq(1000L, 1001L, 2000L, 3000L, 3001L)
  private val loNs = 1000500L // ns, between the 1000µs and 1001µs ticks
  private val hiNs = 3000001L // ns, just past the 3000µs tick
  private val expectUs = Set(1001L, 2000L, 3000L)

  test("long-ns encoding: range matches the normalized predicate") {
    import spark.implicits._
    val df = tsUs.map(us => (us, us * 1000L)).toDF("event_id", "ts")
    val got = Events.tsRangeNs(df, loNs, hiNs)
      .select("event_id").as[Long].collect().toSet
    assert(got == expectUs)
  }

  test("TIMESTAMP_NTZ encoding: range matches, bounds ceil exactly") {
    import spark.implicits._
    val df = tsUs.map { us =>
      (us, java.time.LocalDateTime.ofEpochSecond(us / 1000000L,
        ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC))
    }.toDF("event_id", "ts")
    val out = Events.tsRangeNs(df, loNs, hiNs)
    // the output is normalized: ts is long ns after the filtered scan
    assert(out.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    val got = out.select("event_id").as[Long].collect().toSet
    assert(got == expectUs)
    // and the selected rows equal filter-after-normalize (the slow shape
    // tsRangeNs exists to avoid)
    val slow = Events.tsToLongNs(df)
      .where(col("ts") >= loNs && col("ts") < hiNs)
      .select("event_id").as[Long].collect().toSet
    assert(got == slow)
  }
}
