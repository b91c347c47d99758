package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sketch
import graft.text.{Shard, TextOps}

/** Specs for the round-7 pipeline additions: deterministic training
  * reshard (q230), the linear quality classifier (q231), and the KMV
  * distinct/overlap sketch (q232).
  */
class ShardKmvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()

  // ----- shard shuffle -----

  test("shard placement is a permutation: every doc exactly once, positions contiguous") {
    val pl = Shard.shardPlacement(docs, "doc_id", "text", 8).cache()
    val n = docs.count()
    assert(pl.count() == n)
    assert(pl.select("doc_id").distinct().count() == n)
    // positions within a shard are exactly 1..count(shard)
    val bad = pl.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        count_distinct(col("pos")).as("nd"))
      .where(col("lo") =!= 1 || col("hi") =!= col("n") || col("nd") =!= col("n"))
    assert(bad.count() == 0)
    pl.unpersist()
  }

  test("shard placement is invariant under input repartitioning") {
    val a = Shard.shardPlacement(docs, "doc_id", "text", 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Shard.shardPlacement(docs.repartition(17), "doc_id", "text", 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("byte-identical duplicate texts land in the same shard") {
    val dup = docs.limit(40)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val both = docs.select("doc_id", "text").union(dup)
    val perText = Shard.shardPlacement(both, "doc_id", "text", 8)
      .groupBy("text").agg(count_distinct(col("shard")).as("ns"))
      .where(col("ns") > 1)
    assert(perText.count() == 0)
  }

  // ----- linear quality classifier -----

  test("quality margin matches a hand-computed document") {
    import spark.implicits._
    // "the cat sat on a mat" : 6 tokens, 20 chars, stopwords {the,on,a}=3,
    // alpha = 15 lowercase letters
    val df = Seq((1L, "the cat sat on a mat")).toDF("doc_id", "text")
    val r = TextOps.linearQualityMargin(df)
      .select("n_tokens", "stop_pm", "alpha_pm", "mtl_milli", "margin", "keep")
      .head()
    assert(r.getLong(0) == 6)
    assert(r.getLong(1) == 3000 / 6) // 500
    assert(r.getLong(2) == 15 * 1000 / 20) // 750
    assert(r.getLong(3) == (20 - 6 + 1) * 1000 / 6) // 2500
    // margin = 4*6 + 2*500 + 750 - |2500-4500|/2 - 800 = 24+1000+750-1000-800
    assert(r.getLong(4) == -26)
    assert(r.getLong(5) == 0)
  }

  test("classifier decision is exactly sign(margin) over the corpus") {
    val bad = TextOps.linearQualityMargin(docs)
      .where((col("margin") > 0) =!= (col("keep") === 1))
    assert(bad.count() == 0)
  }

  // ----- KMV sketch -----

  test("kmv sketch equals the exact bottom-k distinct set") {
    import spark.implicits._
    // duplicated + shuffled values; distinct bottom-5 = 10,20,30,40,50
    val vals = Seq(70L, 30L, 30L, 10L, 90L, 50L, 20L, 10L, 40L, 60L, 20L)
    val df = vals.zipWithIndex.map { case (v, i) => (s"g${i % 2}", v) }
      .toDF("grp", "h")
    val one = df.withColumn("grp", lit("all"))
    val got = Sketch.kmvSketch(one, Seq("grp"), "h", 5)
      .orderBy("r").select("h").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L, 20L, 30L, 40L, 50L))
  }

  test("kmv merge is order-insensitive: sketch invariant under repartitioning") {
    val sh = docs.select(col("source"),
        explode(TextOps.shingles(col("text"), 3)).as("g"))
      .select(col("source"), TextOps.fingerprint(col("g")).as("h"))
    val a = Sketch.kmvSketch(sh, Seq("source"), "h", 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = Sketch.kmvSketch(sh.repartition(23), Seq("source"), "h", 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("kmv estimate is exact below k and within 25% above k") {
    import spark.implicits._
    // exact regime: 50 distinct < k=128
    val small = (1L to 50L).map(h => ("s", h * 1000L)).toDF("grp", "h")
    val se = Sketch.kmvEstimate(Sketch.kmvSketch(small, Seq("grp"), "h", 128),
      Seq("grp"), 128).select("kmv_est").head().getLong(0)
    assert(se == 50L)
    // estimator regime: 5000 distinct pseudo-uniform hashes (an affine map
    // that wraps the 31-bit domain many times), k=128 → ~9% expected error
    val n = 5000L
    val big = (1L to n).map(i => ("b", (i * 1103515245L + 12345L) % 2147483647L))
      .toDF("grp", "h")
    val be = Sketch.kmvEstimate(Sketch.kmvSketch(big, Seq("grp"), "h", 128),
      Seq("grp"), 128).select("kmv_est").head().getLong(0)
    assert(math.abs(be - n) <= n / 4, s"estimate $be vs true $n")
  }
}
