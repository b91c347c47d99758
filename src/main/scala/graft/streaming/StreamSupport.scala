package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Shared plumbing for the streaming operators: the events file source (one
  * definition of the nanos conf / schema read / glob-filtered directory
  * stream) and the synchronous memory-sink drain the harness checks use.
  */
private[streaming] object StreamSupport {

  /** The events parquet as a file stream (the source requires a directory —
    * glob-filtered to the events file; schema from a batch read).
    */
  def eventsFileStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.streaming.schemaInference", "false")
    val schema: StructType = spark.read.parquet(s"$sfDir/events.parquet").schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
  }

  /** Time-split copies of the events table as TWO parquet files in one
    * directory, streamed with maxFilesPerTrigger=1 → one micro-batch per
    * file (oldest first via explicit modification times), exercising
    * cross-batch state and mid-stream watermark advancement. Splitting at
    * the median timestamp keeps every batch-2 event above batch 1's
    * watermark (max − 1 h), so nothing is late-dropped and the emitted set
    * equals the single-batch run's under the finality contract.
    *
    * Concurrency contract: split creation is serialized within this JVM (a
    * process-wide lock below), and `splitDir` assumes a SINGLE WRITER across
    * processes — two JVMs splitting into the same directory concurrently
    * could interleave file moves and marker writes. Give each concurrent
    * query its own splitDir. Note this helper also sets the session-wide
    * `nanosAsLong` SQLConf (the events table stores nanos), a deliberate
    * read-path side effect shared with `eventsFileStream`.
    */
  private val splitLock = new Object

  def eventsSplitStream(spark: SparkSession, sfDir: String,
      splitDir: String): DataFrame = splitLock.synchronized {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val schema = ev.schema
    val dir = new java.io.File(splitDir)
    val fa = new java.io.File(dir, "split_a.parquet")
    val fb = new java.io.File(dir, "split_b.parquet")
    // cache keyed on the SOURCE file identity — a bare existence check would
    // silently stream stale splits after an sfDir change into the same dir
    val src = new java.io.File(s"$sfDir/events.parquet")
    val key = s"${src.getAbsolutePath}:${src.length()}:${src.lastModified()}"
    val marker = new java.io.File(dir, "_source_key.txt")
    val fresh = marker.exists() &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath)) == key
    if (!(fa.exists() && fb.exists() && fresh)) {
      dir.mkdirs()
      // the build makes three passes (median + two filtered writes) — cache
      // the source across them; freed immediately after the build
      ev.persist()
      try {
      val mid = ev.agg(org.apache.spark.sql.functions.expr("percentile(ts, 0.5)"))
        .first().getDouble(0).toLong
      def writeOne(df: DataFrame, target: java.io.File, modMs: Long): Unit = {
        val tmp = new java.io.File(dir, s"_tmp_${target.getName}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().find(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath, target.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        scala.reflect.io.Directory(tmp).deleteRecursively()
        // the file source orders by (modified time, path): pin both — a
        // silent setLastModified failure would let split_b lead, late-drop
        // the older half, and lose sessions vs the shared oracle
        require(target.setLastModified(modMs),
          s"cannot pin mtime on $target; split-stream batch order undefined")
      }
      import org.apache.spark.sql.functions.col
      writeOne(ev.where(col("ts") <= mid), fa, 1000000L)
      writeOne(ev.where(col("ts") > mid), fb, 2000000L)
      java.nio.file.Files.write(marker.toPath, key.getBytes)
      } finally ev.unpersist() // a failed write must not leak the cache
    }
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(splitDir)
  }

  // sink tables THIS module created and has not yet dropped — scoping the
  // cleanup to this set (not a name-prefix sweep of the whole catalog) so an
  // unrelated user/test temp view that happens to match a prefix is never
  // unpersisted or dropped out from under its owner
  private val createdSinks = scala.collection.mutable.LinkedHashSet.empty[String]

  /** Run a streaming DataFrame to a memory sink with AvailableNow, drain it,
    * and return the materialized table (cached — the sink table goes away
    * with the next query of the same name).
    */
  def runToMemory(df: DataFrame, queryName: String,
      outputMode: String = "append"): DataFrame = {
    val spark = df.sparkSession
    // harness queries use unique (nanoTime-suffixed) sink names, so stale
    // sinks are never overwritten by name reuse — drop previous runs' cached
    // sink tables here or a bench loop pins every past result in memory
    createdSinks.synchronized {
      createdSinks.filter(_ != queryName).foreach { name =>
        try {
          spark.table(name).unpersist()
          spark.catalog.dropTempView(name)
        } catch { case _: Throwable => () }
        createdSinks -= name
      }
      createdSinks += queryName
    }
    val q = df.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val out = df.sparkSession.table(queryName)
    out.cache(); out.count()
    out
  }
}
