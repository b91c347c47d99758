package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Grid
import graft.generate.Generate

/** Dev probe (r15, verdict #6): decompose the partitioned-write rung.
  * The 256M rung writes ~12 GB in ~327 s (~37 MB/s) against a 300+ MB/s
  * disk anchor — so WHAT is it bound on? Interleaved at the 25.6M rung:
  *   A. generation alone (wideFast → noop)
  *   B. generation + partitioned write as shipped
  *   C. generation + write repartitioned by the partition columns
  *      (one dir per task — no per-task dynamic-partition fan-out/sort)
  *   D. generation + UNPARTITIONED write (directory layout cost isolated)
  * Usage: runMain graft.GenWriteProbe [reps]
  */
object GenWriteProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val grid = Grid.all()
    val cfgs = (0 until 512).map(i =>
      grid(i % grid.size).copy(configId = 3000000L + i, nPoints = 50000))
    val dir = "target/probe_gen_scale"
    def clean(): Unit = scala.reflect.io.Directory(
      new java.io.File(dir)).deleteRecursively()
    def du(): Double = {
      def sz(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).getOrElse(Array.empty).map(sz).sum
      sz(new java.io.File(dir)) / 1e9
    }
    def nfiles(): Int = {
      def c(f: java.io.File): Int =
        if (f.isFile) (if (f.getName.endsWith(".parquet")) 1 else 0)
        else Option(f.listFiles).getOrElse(Array.empty).map(c).sum
      c(new java.io.File(dir))
    }
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    def rec(k: String, v: Double, extra: String = ""): Unit = {
      out.getOrElseUpdate(k,
        scala.collection.mutable.ArrayBuffer.empty) += v
      println(f"[gwprobe] $k%-22s $v%7.2f s $extra")
    }
    (1 to reps).foreach { _ =>
      rec("A_gen_noop", time {
        Generate.wideFast(spark, cfgs)
          .write.mode("overwrite").format("noop").save()
      })
      clean()
      rec("B_write_as_shipped", time {
        Generate.writeParquet(Generate.wideFast(spark, cfgs), dir)
      }, f"(${du()}%.2f GB, ${nfiles()} files)")
      clean()
      rec("C_write_repart", time {
        Generate.wideFast(spark, cfgs)
          .repartition(col("family"), col("nVars"), col("maxLag"))
          .write.mode("overwrite")
          .partitionBy("family", "nVars", "maxLag").parquet(dir)
      }, f"(${du()}%.2f GB, ${nfiles()} files)")
      clean()
      rec("D_write_flat", time {
        Generate.wideFast(spark, cfgs)
          .write.mode("overwrite").parquet(dir)
      }, f"(${du()}%.2f GB, ${nfiles()} files)")
      clean()
      rec("E_write_concwriters", time {
        val key = "spark.sql.maxConcurrentOutputFileWriters"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, "24")
        try Generate.writeParquet(Generate.wideFast(spark, cfgs), dir)
        finally prev match {
          case Some(p) => spark.conf.set(key, p)
          case None    => spark.conf.unset(key)
        }
      }, f"(${du()}%.2f GB, ${nfiles()} files)")
      clean()
    }
    println("== medians ==")
    out.foreach { case (k, vs) =>
      val s = vs.sorted
      println(f"[gwprobe] $k%-22s median ${s(s.size / 2)}%7.2f  runs ${
        vs.map(v => f"$v%.2f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
