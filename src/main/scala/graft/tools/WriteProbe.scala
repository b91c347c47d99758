package graft
import org.apache.spark.sql.SparkSession
import graft.core.Grid
import graft.generate.Generate

/** Dev probe for the gen_scale write rungs (guide §6: file layout/codec):
  * times the 25.6M-row partitioned parquet write under each codec and
  * reports bytes written, so the codec choice is measured, not guessed.
  * Usage: runMain graft.WriteProbe [codec ...] (default: snappy zstd lz4)
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val codecs = if (args.nonEmpty) args.toSeq else Seq("snappy", "zstd", "lz4")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val grid = Grid.all()
    val cfgs = (0 until 512).map(i =>
      grid(i % grid.size).copy(configId = 3000000L + i, nPoints = 50000))
    val dir = "target/write_probe"
    def du(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
    // one warmup write so JIT/codegen cost lands outside every timed run
    Generate.writeParquet(Generate.wideFast(spark, cfgs.take(32)), dir)
    codecs.foreach { c =>
      spark.conf.set("spark.sql.parquet.compression.codec", c)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Generate.writeParquet(Generate.wideFast(spark, cfgs), dir)
        (System.nanoTime() - t0) / 1e9
      }
      val bytes = du(new java.io.File(dir))
      println(f"[writeprobe] codec=$c%-7s runs=${ts.map(t => f"$t%.1f").mkString(",")} s  bytes=${bytes / 1e6}%.0f MB")
    }
    scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    spark.stop()
  }
}
