package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bucketing

/** Proves the bucketed-join layout: after writing lineitem and orders
  * bucketed on the join key, the join plans with NO shuffle exchange on
  * either side — the write-once/join-many pattern for 100 TB fact-fact
  * joins. Results must equal the plain join exactly.
  */
class BucketingSpec extends AnyFunSuite {

  test("bucketed fact-fact join plans with zero exchanges and matches the plain join") {
    // a dedicated session: getOrCreate() would silently reuse another
    // suite's session and drop the warehouse/broadcast configs this test
    // depends on (ExtensionsSpec pattern)
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("bucketing-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      runBucketedJoinCheck(spark)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  private def runBucketedJoinCheck(spark: SparkSession): Unit = {
    val d = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val o = spark.read.parquet(s"$d/orders.parquet")
    Bucketing.writeBucketed(li.withColumnRenamed("l_orderkey", "orderkey"),
      "b_lineitem", "orderkey", 8)
    Bucketing.writeBucketed(o.withColumnRenamed("o_orderkey", "orderkey"),
      "b_orders", "orderkey", 8)
    val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    // the JOIN itself must consume the bucketed layout directly — the only
    // allowed exchange is the one feeding the final aggregation
    val joinSection = plan.split("SortMergeJoin")(1)
    assert(!joinSection.contains("Exchange hashpartitioning(orderkey"),
      s"bucketed join must not shuffle on the join key:\n$plan")
    assert("Exchange".r.findAllIn(plan).size <= 1,
      s"expected at most the post-join agg exchange:\n$plan")

    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
    val a = joined.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val b = plain.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }
}
