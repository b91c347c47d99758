package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.generate.Generate

/** Dev probe (r15): CLEAN A/B of the sparse-moment (nb, t) join strategy —
  * sort-merge vs shuffled-hash — alternating ABBA within one JVM so
  * position-in-rep effects (first toucher of the checkpointed panel pays
  * any re-read) cancel. The earlier MomentsProbe comparison was confounded
  * exactly that way. Usage: runMain graft.ShjAbProbe [reps]
  */
object ShjAbProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cfgsAll = graft.core.Grid.all()
    val wideC = Generate.wideFast(spark, cfgsAll).where(col("t") < 200)
    val virtC = (1 to 8).map { i =>
      val m = floor(greatest(least(col(s"X$i"), lit(1e3)), lit(-1e3))
        * 1000).cast("long").as("v")
      val base = wideC.where(col(s"X$i").isNotNull)
      base.select(concat(col("configId"), lit(s"|X$i@0")).as("vs"),
          (col("configId") * 65536 + col("t")).as("t"), m)
        .unionByName(base.select(
          concat(col("configId"), lit(s"|X$i@1")).as("vs"),
          (col("configId") * 65536 + col("t") + 1).as("t"), m))
    }.reduce(_ unionByName _).localCheckpoint(true)
    val hypsC = cfgsAll.flatMap { c =>
      for { i <- 1 to c.nVars; j <- 1 to c.nVars if i != j } yield
        (s"${c.configId}|X$j@0", s"${c.configId}|X$i@1")
    }
    def cnp(a: String, b: String) = if (a <= b) (a, b) else (b, a)
    val wantedC = hypsC.flatMap { case (y, x) =>
      Seq((y, y), (x, x), cnp(x, y))
    }.distinct.toDF("na", "nb")
    val predC = (col("t") % 65536).between(1, 199)

    def moments(hint: Boolean): DataFrame = {
      val v = virtC.where(predC)
      val a = v.select(col("vs").as("na"), col("t"), col("v").as("va"))
      val b0 = v.select(col("vs").as("nb"), col("t"), col("v").as("vb"))
      val b = if (hint) b0.hint("shuffle_hash") else b0
      a.join(broadcast(wantedC.select("na", "nb")), Seq("na"))
        .join(b, Seq("nb", "t"))
        .groupBy("na", "nb")
        .agg(count(lit(1)).as("n"), sum(col("va")).as("sa"),
          sum(col("vb")).as("sb"), sum(col("va") * col("vb")).as("sab"))
        .select(col("na"), col("nb"), col("n"),
          expr("""cast(cast(n as decimal(38,0)) * sab
                 |  - cast(sa as decimal(38,0)) * sb as long)"""
            .stripMargin).as("c"))
    }
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(hint: Boolean): Double =
      t { moments(hint).write.mode("overwrite").format("noop").save() }
    run(false); run(true) // warmup both
    val smj = scala.collection.mutable.ArrayBuffer.empty[Double]
    val shj = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { i =>
      smj += run(false); shj += run(true)
      shj += run(true); smj += run(false)
      println(f"[shjab] rep $i smj=${smj.takeRight(2).mkString(",")}  " +
        f"shj=${shj.takeRight(2).mkString(",")}")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[shjab] smj median ${med(smj.toSeq)}%.2f  runs ${
      smj.map(v => f"$v%.2f").mkString("[", ",", "]")}")
    println(f"[shjab] shj median ${med(shj.toSeq)}%.2f  runs ${
      shj.map(v => f"$v%.2f").mkString("[", ",", "]")}")
    spark.stop()
  }
}
