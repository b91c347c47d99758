package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pan = graft.Bench.widePanel(spark, 256, 10)
    println("PROBE distinct series at p=256: " +
      pan.select("series").distinct().count())
    println("PROBE sample names: " + pan.select("series").distinct()
      .orderBy("series").limit(8).collect().map(_.getString(0)).mkString(","))
    println("PROBE lpad('100',2,'0') = " + spark.range(1)
      .select(lpad(lit("100"), 2, "0")).collect()(0).getString(0))
    spark.stop()
  }
}
