package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bucketing

/** Proves the bucketed-join layout: after writing lineitem and orders
  * bucketed on the join key, the join plans with NO shuffle exchange on
  * either side — the write-once/join-many pattern for 100 TB fact-fact
  * joins. Results must equal the plain join exactly.
  *
  * Uses the suite-shared session: bucketed tables live in a dedicated
  * database at an explicit temp LOCATION (spark.sql.warehouse.dir is a
  * static conf that cannot be changed on a shared context), and the
  * broadcast threshold is a runtime conf set and restored around the test.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed fact-fact join plans with zero exchanges and matches the plain join") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bspec LOCATION '$wh'")
    try {
      val d = "/root/testdata/sf0.001"
      val li = spark.read.parquet(s"$d/lineitem.parquet")
      val o = spark.read.parquet(s"$d/orders.parquet")
      Bucketing.writeBucketed(li.withColumnRenamed("l_orderkey", "orderkey"),
        "graft_bspec.b_lineitem", "orderkey", 8)
      Bucketing.writeBucketed(o.withColumnRenamed("o_orderkey", "orderkey"),
        "graft_bspec.b_orders", "orderkey", 8)
      val joined = Bucketing.bucketedJoin(spark,
          "graft_bspec.b_lineitem", "graft_bspec.b_orders", "orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
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
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_bspec CASCADE")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
