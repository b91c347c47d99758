package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextOps

class PiiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("piiScrub counts and redacts; email digits are not half-eaten by the phone pass") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to alice.b1@mail.example.com today"),
      (2L, "call 555-0199 or 555-0200"),
      (3L, "user123-4567a@host.net"), // digits inside the email must go as <EMAIL>
      (4L, "no contact info here")
    ).toDF("id", "t")
    val got = TextOps.piiScrub(df, "id", "t").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got(1L) == (1, 0))
    assert(got(2L) == (0, 2))
    assert(got(3L) == (1, 0), "the whole address matches the email pattern first")
    assert(got(4L) == (0, 0))
    // redaction really rewrites: fingerprints differ from the originals'
    // exactly when something matched
    val fps = TextOps.piiScrub(df, "id", "t").select("id", "redacted_fp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val origFps = df.select($"id", TextOps.fingerprint($"t").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(4L) == origFps(4L))
    assert(Seq(1L, 2L, 3L).forall(i => fps(i) != origFps(i)))
  }
}
