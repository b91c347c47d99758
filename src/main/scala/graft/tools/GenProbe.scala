package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Grid
import graft.generate.Generate

/** Throwaway probe: times the typed vs fast generation sweeps in isolation
  * (run with SPARK_DRIVER_MEM to study heap sensitivity — the r2/r3 driver
  * bench anomaly).
  */
object GenProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val grid = Grid.all()
    // warmup
    Generate.wideFast(spark, grid.take(32)).agg(count(lit(1))).collect()
    Generate.series(spark, grid.take(32)).toDF().agg(count(lit(1))).collect()
    for (i <- 1 to 2) {
      val tTyped = time {
        Generate.series(spark, grid).toDF().agg(count(lit(1)), sum("x1")).collect()
      }
      val tFast = time {
        Generate.wideFast(spark, grid).agg(count(lit(1)), sum("X1")).collect()
      }
      println(f"[probe] iter=$i typed=$tTyped%.2f fast=$tFast%.2f heap=${Runtime.getRuntime.maxMemory() / 1e9}%.1fg")
    }
    spark.stop()
  }
}
