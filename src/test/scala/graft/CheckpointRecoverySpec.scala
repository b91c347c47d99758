package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
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

  /** The same kill-and-resume contract for the `transformWithState` path —
    * the q344 streaming Granger monitor's operator. The file-source agg
    * test above proves OFFSET recovery; this one proves OPERATOR-STATE
    * recovery: the processor's RocksDB ValueState (one fixed-size
    * 10-sum moment row per pair) must come back after a restart, so the
    * post-restart batch emits PREFIX sums that include the pre-kill
    * batch's contributions — not sums restarted from zero — and nothing
    * from the first batch is re-emitted (foreachBatch sees batch 1
    * exactly once). Update-mode memory sinks never exercise this (they
    * live and die in one run), which is why q344's contract needs this
    * spec: the emission log of kill+resume must byte-equal an
    * uninterrupted run's.
    */
  test("transformWithState restart: RocksDB value-state recovered, emission log equals an uninterrupted run") {
    import spark.implicits._
    val base = s"/tmp/graft_tws_ckpt_${System.nanoTime()}"
    val srcDir = s"$base/src"
    new java.io.File(srcDir).mkdirs()

    // 3 pairs × 40 days of deterministic lagged tuples in the q344 shape
    // (pair, yv, pv, qv) + the day split column
    val tuples = spark.range(0, 120).select(
      concat(lit("p"), col("id") % 3).as("pair"),
      (col("id") / 3).cast("long").as("day"),
      ((col("id") * 7) % 100).cast("long").as("yv"),
      ((col("id") * 11) % 100).cast("long").as("pv"),
      ((col("id") * 13) % 100).cast("long").as("qv"))
    tuples.where(col("day") < 20).drop("day")
      .coalesce(1).write.parquet(s"$base/h1")
    tuples.where(col("day") >= 20).drop("day")
      .coalesce(1).write.parquet(s"$base/h2")
    val sch = spark.read.parquet(s"$base/h1").schema

    // transformWithState requires the RocksDB provider; set for this test,
    // restored after (the sibling test keeps the default HDFS provider)
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runOnce(outBase: String): Unit = {
        val src = spark.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
        val out = src.as[(String, Long, Long, Long)]
          .groupByKey(_._1)
          .transformWithState(
            new graft.streaming.StatefulOps.GrangerSumsProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDF()
        val q = out.writeStream
          .outputMode("update")
          .foreachBatch { (df: DataFrame, id: Long) =>
            df.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(s"$outBase/data")
          }
          .option("checkpointLocation", s"$outBase/_ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
        q.processAllAvailable()
        q.stop()
      }

      // phase 1: only batch 1 exists; the monitor drains it and dies
      copyParts(s"$base/h1", srcDir)
      runOnce(s"$base/run")
      // phase 2: batch 2 arrives; a NEW query on the SAME checkpoint resumes
      copyParts(s"$base/h2", srcDir)
      runOnce(s"$base/run")

      def sink(p: String): Seq[(Long, String, Long, Long, Long, Long)] =
        spark.read.parquet(p)
          .select(col("batch_id"), col("pair"), col("n"),
            col("sy"), col("syy"), col("spq"))
          .as[(Long, String, Long, Long, Long, Long)]
          .collect().toSeq.sorted
      val restarted = sink(s"$base/run/data")

      // state recovery, directly: the post-restart batch's emission for
      // every pair carries n = 40 (both batches' rows), not a reset 20 —
      // and batch 1 was emitted exactly once, pre-kill
      assert(restarted.map(r => (r._1, r._3)).sorted ==
        Seq((0L, 20L), (0L, 20L), (0L, 20L), (1L, 40L), (1L, 40L), (1L, 40L)),
        s"expected per-pair prefix counts (batch 0: n=20, batch 1: n=40), " +
          s"got $restarted")

      // reference: an uninterrupted run over both files, fresh checkpoint —
      // the restarted emission log must equal it row-for-row, batch ids
      // included (any batch-1 re-emission or state reset diverges here)
      runOnce(s"$base/ref")
      val reference = sink(s"$base/ref/data")
      assert(restarted == reference && restarted.nonEmpty,
        s"kill+resume emission log must equal the uninterrupted run's:\n" +
          s"  restarted: $restarted\n  reference: $reference")
    } finally prevProv match {
      case Some(p) => spark.conf.set(provKey, p)
      case None    => spark.conf.unset(provKey)
    }
  }

  test("transformWithState restart covers the q368 inference monitor's " +
      "10-sum state: syy continues across the kill, log equals an " +
      "uninterrupted run") {
    import spark.implicits._
    val base = s"/tmp/graft_tws2_ckpt_${System.nanoTime()}"
    val srcDir = s"$base/src"
    new java.io.File(srcDir).mkdirs()

    // 3 links × 40 rows of deterministic design tuples in the q368 shape
    val tuples = spark.range(0, 120).select(
      concat(lit("l"), col("id") % 3).as("link"),
      (col("id") / 3).cast("long").as("day"),
      ((col("id") * 7) % 100).cast("long").as("yv"),
      ((col("id") * 11) % 100).cast("long").as("xv"),
      ((col("id") * 13) % 100).cast("long").as("sv"))
    tuples.where(col("day") < 20).drop("day")
      .coalesce(1).write.parquet(s"$base/h1")
    tuples.where(col("day") >= 20).drop("day")
      .coalesce(1).write.parquet(s"$base/h2")
    val sch = spark.read.parquet(s"$base/h1").schema

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runOnce(outBase: String): Unit = {
        val src = spark.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
        val out = src.as[(String, Long, Long, Long)]
          .groupByKey(_._1)
          .transformWithState(
            new graft.streaming.StatefulOps.WeightSums2Processor,
            TimeMode.None(), OutputMode.Update())
          .toDF()
        val q = out.writeStream
          .outputMode("update")
          .foreachBatch { (df: DataFrame, id: Long) =>
            df.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(s"$outBase/data")
          }
          .option("checkpointLocation", s"$outBase/_ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
        q.processAllAvailable()
        q.stop()
      }

      copyParts(s"$base/h1", srcDir)
      runOnce(s"$base/run")
      copyParts(s"$base/h2", srcDir)
      runOnce(s"$base/run")

      def sink(p: String): Seq[(Long, String, Long, Long, Long)] =
        spark.read.parquet(p)
          .select(col("batch_id"), col("link"), col("n"),
            col("syy"), col("sxs"))
          .as[(Long, String, Long, Long, Long)]
          .collect().toSeq.sorted
      val restarted = sink(s"$base/run/data")
      assert(restarted.map(r => (r._1, r._3)).sorted ==
        Seq((0L, 20L), (0L, 20L), (0L, 20L), (1L, 40L), (1L, 40L), (1L, 40L)),
        s"expected per-link prefix counts (batch 0: n=20, batch 1: n=40), " +
          s"got $restarted")

      runOnce(s"$base/ref")
      val reference = sink(s"$base/ref/data")
      assert(restarted == reference && restarted.nonEmpty,
        s"kill+resume emission log must equal the uninterrupted run's:\n" +
          s"  restarted: $restarted\n  reference: $reference")
    } finally prevProv match {
      case Some(p) => spark.conf.set(provKey, p)
      case None    => spark.conf.unset(provKey)
    }
  }
}
