package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextOps

/** Specs for winnowing fingerprint selection (q246) and the dynamic-gap
  * session semantics q247's oracle replays.
  */
class WinnowSessionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("winnowing guarantee: documents sharing a long token run share a selected hash") {
    // shared run of 10 tokens >> n + w = 3 + 4 → must yield a shared
    // SELECTED fingerprint despite different surrounding text
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight $shared nine ten eleven twelve thirteen")
    ).toDF("doc_id", "text")
    val sel = TextOps.winnowedFingerprints(docs, "doc_id", "text")
      .select("doc_id", "sh").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert((sel(1L) & sel(2L)).nonEmpty, "shared run must produce a shared selection")
  }

  test("winnowing density: one selection per window position, ~2/(w+1) of hashes") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val stats = TextOps.winnowedFingerprints(docs, "doc_id", "text")
      .groupBy("doc_id", "n_shingles").agg(count(lit(1)).as("n_sel"))
      .select("n_shingles", "n_sel").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // selections are bounded by full-window count and are at least the
    // theoretical winnowing floor (one selection per disjoint window)
    stats.foreach { case (nsh, nsel) =>
      val windows = nsh - 3
      assert(nsel <= windows, s"more selections than windows: $nsel > $windows")
      assert(nsel >= (windows + 3) / 4, s"below winnowing floor: $nsel of $windows")
    }
    val density = stats.map(_._2).sum.toDouble / stats.map(t => t._1 - 3).sum
    assert(density > 0.25 && density < 0.55, s"density $density vs expected ~0.4")
  }

  test("dynamic-gap sessions: a short-gap event inside a long window must not split") {
    // view at t=0 holds the session open 30 min; a click at t=5 min has a
    // 10-min gap ending t=15; another view at t=20 min is INSIDE the first
    // view's window — lag-based breaks (vs the previous event's end only)
    // would split at t=20 (click end 15 < 20); running-max merge must not
    val base = 1700000000000000L // µs
    val min = 60000000L
    val rows = Seq(
      (1L, base, "view", 1L),
      (1L, base + 5 * min, "click", 2L),
      (1L, base + 20 * min, "view", 3L))
      .toDF("user_id", "ts_us", "event_type", "event_id")
      .withColumn("event_time", timestamp_micros(col("ts_us")))
    val sessions = rows.groupBy(col("user_id"),
        session_window(col("event_time"),
          when(col("event_type") === "click", "10 minutes")
            .otherwise("30 minutes")).as("sw"))
      .agg(count(lit(1)).as("n"))
      .collect()
    assert(sessions.length == 1 && sessions.head.getLong(2) == 3,
      s"one merged session of 3 events expected: ${sessions.mkString}")
  }
}
