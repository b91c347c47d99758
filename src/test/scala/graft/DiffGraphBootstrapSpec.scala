package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence/determinism properties for the q162/q164/q166 contracts:
  * the LCG-derived Poisson multiplicities must be a pure function of
  * (key, replicate) with the documented distribution bounds, and the
  * distributed BFS must equal a naive single-threaded BFS on the same
  * collected graph.
  */
class DiffGraphBootstrapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("poisson bootstrap multiplicities: deterministic, bounded, calibrated") {
    // the q162 LCG in plain Scala — must match the SQL text bit for bit
    def mult(key: Long, b: Long): Int = {
      val h = ((key % 2147483647L) * 48271L + b * 16807L) % 2147483647L
      val u = h % 10000L
      if (u < 3679) 0 else if (u < 7358) 1 else if (u < 9197) 2
      else if (u < 9810) 3 else if (u < 9963) 4 else 5
    }
    val keys = (1L to 20000L)
    // mean multiplicity ≈ 1 (Poisson(1)), exactly reproducible
    for (b <- Seq(1L, 7L, 20L)) {
      val ms = keys.map(mult(_, b))
      assert(ms.forall(m => m >= 0 && m <= 5))
      val mean = ms.sum.toDouble / ms.size
      assert(math.abs(mean - 1.0) < 0.03, s"replicate $b mean $mean")
      assert(ms == keys.map(mult(_, b)), "not deterministic")
    }
    // replicates differ from each other (the hash actually mixes b)
    assert(keys.map(mult(_, 1)) != keys.map(mult(_, 2)))

    // and the Spark query agrees with a local recomputation of replicate 1
    val rows = SparkEntry.queries("q162_poisson_bootstrap")(spark, sf)
      .collect().map(r => r.getAs[Long]("b") -> r.getAs[Long]("n_eff")).toMap
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0))
    assert(rows(1L) == orders.map(k => mult(k, 1L).toLong).sum)
  }

  test("distributed BFS equals naive BFS on the same graph") {
    val out = SparkEntry.queries("q164_bfs_hops")(spark, sf)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("hop")).toMap
    // rebuild the same top-2 graph relationally, then BFS it naively
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .select(col("s_suppkey"), col("s_nationkey"))
    val edges = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val top2 = edges.withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(col("w").desc, col("dst"))))
      .where(col("rn") <= 2)
      .select(col("src").cast("long"), col("dst").cast("long"), col("w"))
      .collect()
    val adj = top2.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // root = max total outgoing weight over ALL edges (not just top-2),
    // matching q164's root rule
    val allEdges = edges
      .select(col("src").cast("long"), col("w")).collect()
    val root = allEdges.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).sum).toSeq
      .sortBy { case (k, tw) => (-tw, k) }.head._1
    var dist = Map(root -> 0L)
    var frontier = Set(root)
    for (h <- 1 to 6) {
      val nxt = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .diff(dist.keySet)
      dist ++= nxt.map(_ -> h.toLong)
      frontier = nxt
    }
    assert(out == dist, s"spark=$out naive=$dist")
  }
}
