package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-recovery proof for the streaming surface: a query killed
  * between micro-batches and RESTARTED against the same checkpoint must
  * (a) resume from recorded offsets — the already-processed file is not
  * re-read — and (b) leave exactly the sink a single uninterrupted run
  * leaves. This is the restartability contract every production
  * streaming job relies on; the memory-sink harness queries never
  * exercise it because they live and die in one JVM-local run.
  */
class CheckpointRecoverySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def copyParts(fromDir: String, toDir: String): Unit = {
    val src = new java.io.File(fromDir)
    src.listFiles().filter(_.getName.startsWith("part-")).foreach { f =>
      Files.copy(f.toPath, Paths.get(toDir, f.getName))
    }
  }

  test("restart from checkpoint: offsets recovered, sink equals an uninterrupted run") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val base = s"/tmp/graft_ckpt_${System.nanoTime()}"
    val srcDir = s"$base/src"
    new java.io.File(srcDir).mkdirs()

    val ev = graft.sources.Events.tsToLongNs(
      spark.read.parquet(s"$d/events.parquet"))
    val mid = ev.agg(expr("percentile(ts, 0.5)")).first().getDouble(0).toLong
    ev.where(col("ts") <= mid).coalesce(1).write.parquet(s"$base/h1")
    ev.where(col("ts") > mid).coalesce(1).write.parquet(s"$base/h2")
    val n2 = ev.where(col("ts") > mid).count()

    def agg(src: DataFrame): DataFrame = src
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "300 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws"), col("event_type"),
        col("n"))

    def runOnce(inDir: String, outBase: String): Long = {
      val src = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      val q = agg(src).writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", s"$outBase/data")
        .option("checkpointLocation", s"$outBase/_ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable()
      val rows = q.recentProgress.map(_.numInputRows).sum
      q.stop()
      rows
    }

    // phase 1: only half 1 exists; the query drains it and dies
    copyParts(s"$base/h1", srcDir)
    runOnce(srcDir, s"$base/run")
    // phase 2: half 2 arrives; a NEW query on the SAME checkpoint resumes
    copyParts(s"$base/h2", srcDir)
    val rows2 = runOnce(srcDir, s"$base/run")
    assert(rows2 == n2,
      s"restart must process ONLY the new file ($n2 rows), saw $rows2")

    // reference: an uninterrupted run over both files, fresh checkpoint
    val refDir = s"$base/refsrc"
    new java.io.File(refDir).mkdirs()
    copyParts(s"$base/h1", refDir); copyParts(s"$base/h2", refDir)
    runOnce(refDir, s"$base/ref")

    def sink(p: String): Set[(Long, String, Long)] =
      spark.read.parquet(p).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val restarted = sink(s"$base/run/data")
    val reference = sink(s"$base/ref/data")
    assert(restarted == reference && restarted.nonEmpty,
      s"restarted sink (${restarted.size}) must equal the uninterrupted " +
        s"run's sink (${reference.size})")
  }
}
