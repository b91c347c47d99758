package graft
import org.apache.spark.sql.SparkSession
/** Dev audit: prints join/exchange/sort counts of the physical plan for a
  * range of queries — the quick way to spot an accidental SortMergeJoin,
  * nested-loop, or cartesian before it ships (the per-query PlanSpec
  * guards pin the load-bearing shapes; this sweeps everything).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    // optional arg: regex over query names (default = everything)
    val pat = args.headOption.getOrElse("q.*")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => n.matches(pat))
    names.foreach { n =>
      try {
        val p = SparkEntry.queries(n)(spark, d).queryExecution.executedPlan.toString
        def c(s: String) = s.r.findAllIn(p).size
        println(f"[audit] $n%-30s SMJ=${c("SortMergeJoin")} BHJ=${c("BroadcastHashJoin")} BNLJ=${c("BroadcastNestedLoopJoin")} CART=${c("CartesianProduct")} EXCH=${c("Exchange")} SORT=${c("\\bSort\\b")}")
      } catch { case e: Throwable => println(s"[audit] $n ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
