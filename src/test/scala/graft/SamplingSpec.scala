package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Dedup, Sampling}

class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()

  test("content sample is invariant under repartitioning") {
    val a = Sampling.stratifiedContentSample(docs, "text", "lang",
      Map("en" -> 200), 50).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedContentSample(docs.repartition(17), "text", "lang",
      Map("en" -> 200), 50).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("byte-identical duplicates sample identically (dedup-consistency)") {
    import spark.implicits._
    val dup = docs.limit(50).select(col("doc_id") + 100000L, col("text"), col("lang"))
      .toDF("doc_id", "text", "lang")
    val both = docs.select("doc_id", "text", "lang").union(dup)
    val kept = Sampling.stratifiedContentSample(both, "text", "lang", Map.empty, 500)
    // per text, either every copy is kept or none: group sizes in the sample
    // must equal group sizes in the input for sampled texts
    val inSizes = both.groupBy("text").count().withColumnRenamed("count", "n_in")
    val badRows = kept.groupBy("text").count().join(inSizes, "text")
      .where(col("count") =!= col("n_in")).count()
    assert(badRows == 0)
  }

  test("sample-then-dedup equals dedup-then-sample") {
    val sampleFirst = Dedup.exactDedup(
      Sampling.stratifiedContentSample(docs, "text", "lang", Map.empty, 300),
      "doc_id", "text").select("doc_id").collect().map(_.getLong(0)).toSet
    val dedupFirst = Sampling.stratifiedContentSample(
      Dedup.exactDedup(docs, "doc_id", "text"), "text", "lang", Map.empty, 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sampleFirst == dedupFirst)
  }

  test("hashSample: deterministic, rate-calibrated, monotone in rate, salt-decorrelated") {
    val n = docs.count().toDouble
    val s200 = Sampling.hashSample(docs, Seq(col("doc_id")), 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s200b = Sampling.hashSample(docs.repartition(13), Seq(col("doc_id")), 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s200 == s200b)
    assert(math.abs(s200.size / n - 0.2) < 0.08, s"rate ${s200.size / n}")
    // same salt: a lower rate selects a SUBSET (bucket < 100 ⊆ bucket < 200)
    val s100 = Sampling.hashSample(docs, Seq(col("doc_id")), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s100.subsetOf(s200))
    // different salt: a genuinely different subset
    val salted = Sampling.hashSample(docs, Seq(col("doc_id")), 200, salt = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(salted != s200)
  }
}
