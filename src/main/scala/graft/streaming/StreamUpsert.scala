package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The lakehouse CDC-apply pattern: a stream drained through
  * `foreachBatch`, each micro-batch MERGED into a persistent keyed table
  * (latest-wins upsert) — the production shape for maintaining a serving
  * table from a change stream when the sink has no native merge. The
  * per-batch merge reads the previous table version and writes the next
  * (versioned directories — object-store-friendly, no in-place rewrite of
  * files being read), so a crash between versions never corrupts state.
  */
object StreamUpsert {

  /** Drain the 2-batch parity split through foreachBatch, maintaining a
    * per-user latest-event table across batches; returns the FINAL table
    * version. Incremental-merge invariant (the oracle's contract): after
    * the last batch, the table equals the one-shot latest-per-user over
    * the whole stream, no matter how the stream was chopped.
    */
  def eventsIncrementalUpsert(spark: SparkSession, sfDir: String,
      splitDir: String, tableDir: String, queryName: String): DataFrame = {
    val src = StreamSupport.eventsParityStream(spark, sfDir, splitDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type"),
        floor(col("value") * lit(1e6)).cast("long").as("v_micro"))
    val dir = new java.io.File(tableDir)
    if (dir.exists)
      require(scala.reflect.io.Directory(dir).deleteRecursively(),
        s"cannot clear stale upsert table $dir")
    // At-least-once contract: foreachBatch may replay a batch after a
    // crash between the parquet write and version.set — the replay
    // rewrites the SAME next version from the same previous one
    // (latest-wins is idempotent), so content is unaffected.
    val version = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = src.writeStream
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tableDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val v = version.get()
        // collapse the batch to one row per key BEFORE merging — the merge
        // input is |keys touched|, not |events|
        val keyed = graft.ops.Upsert.latestWins(
          batch.limit(0), batch, Seq("user_id"),
          Seq("ts_us", "event_id"), Seq("event_type", "v_micro"))
          .drop("src")
        val cur =
          if (v == 0) keyed.limit(0)
          else s.read.parquet(s"$tableDir/v$v")
        graft.ops.Upsert.latestWins(cur, keyed, Seq("user_id"),
            Seq("ts_us", "event_id"), Seq("event_type", "v_micro"))
          .drop("src")
          .write.mode("overwrite").parquet(s"$tableDir/v${v + 1}")
        version.set(v + 1)
        ()
      }
      .start()
    q.awaitTermination()
    if (version.get() == 0) {
      // zero micro-batches (empty source): no vN was ever written — the
      // serving table is empty at the merged schema, not a read failure
      val empty = spark.read.parquet(splitDir).limit(0)
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          col("event_id"), col("event_type"),
          floor(col("value") * lit(1e6)).cast("long").as("v_micro"))
      graft.ops.Upsert.latestWins(empty, empty, Seq("user_id"),
        Seq("ts_us", "event_id"), Seq("event_type", "v_micro")).drop("src")
    } else spark.read.parquet(s"$tableDir/v${version.get()}")
  }
}
