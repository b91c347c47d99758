package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Funnel

class FunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("one-pass retention equals the N-scan chained-filter formulation") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, i % 2, i % 3, i % 5))
      .toDF("id", "a", "b", "c")
    val stages = Seq(
      "a0" -> (col("a") === 0),
      "b0" -> (col("b") === 0),
      "c_low" -> (col("c") < 3))
    val got = Funnel.retention(df, stages)
      .orderBy("stage_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // reference: chain the filters, count each prefix (N scans)
    var cur = df
    val expected = (0, "all", df.count()) +: stages.zipWithIndex.map {
      case ((name, p), i) => cur = cur.where(p); (i + 1, name, cur.count())
    }
    assert(got == expected)
    // retention is monotone non-increasing
    assert(got.map(_._3).sliding(2).forall { case Seq(x, y) => y <= x })
  }

  test("q64 funnel on the corpus is monotone and starts at the corpus size") {
    val d = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q64_quality_funnel")(spark, d)
      .orderBy("stage_idx").collect().map(_.getLong(2)).toSeq
    val n = spark.read.parquet(s"$d/documents.parquet").count()
    assert(rows.head == n)
    assert(rows.sliding(2).forall { case Seq(x, y) => y <= x })
    assert(rows.last > 0, "the full chain should keep some documents")
  }
}
