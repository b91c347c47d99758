package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe (r15): the streaming entries pay per-micro-batch state-store
  * overhead proportional to spark.sql.shuffle.partitions (32 state stores
  * per batch at the bench default) while carrying KB-scale state. Measure
  * q137/q183 (the two heaviest stream entries) and a mid-size control at
  * several state-partition counts, interleaved, same JVM. Partition count
  * does not change any result (aggregations / keyed state are
  * partition-invariant); this probe only decides the operator-side default.
  * Usage: runMain graft.StreamProbe [reps]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val targets = sys.env.get("SPROBE_TARGETS")
      .map(_.split(",").toSeq).getOrElse(
        Seq("q137_stream_late_drop", "q183_transform_with_state",
          "q165_stream_outer_join", "q18_stream_window"))
    val pList = sys.env.get("SPROBE_P")
      .map(_.split(",").toSeq.map(_.toInt)).getOrElse(Seq(32, 8, 4, 2))
    // warmup (also builds the split caches outside the timed region,
    // exactly like a steady-state bench run)
    targets.foreach(n => noop(SparkEntry.queries(n)(spark, sfDir)))
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    (1 to reps).foreach { _ =>
      for (p <- pList; n <- targets) {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        val t = time { noop(SparkEntry.queries(n)(spark, sfDir)) }
        spark.conf.set("spark.sql.shuffle.partitions", cpus)
        val k = f"$n%-28s p=$p%2d"
        out.getOrElseUpdate(k,
          scala.collection.mutable.ArrayBuffer.empty) += t
        println(f"[sprobe] $k $t%7.2f s")
      }
    }
    println("== medians ==")
    out.foreach { case (k, vs) =>
      val s = vs.sorted
      println(f"[sprobe] $k median ${s(s.size / 2)}%7.2f  runs ${
        vs.map(v => f"$v%.2f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
