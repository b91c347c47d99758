package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Custom stateful streaming operator: gap-based sessionization with
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset state API the batch
  * Sessionize operator maps onto in continuous mode.
  *
  * Emission contract (watermark FINALITY): a session is emitted exactly once,
  * when the watermark passes `lastUs + gap` — from that point no in-watermark
  * event can extend it or merge a predecessor into it, so every emitted row
  * is final under ANY batch decomposition and ANY within-watermark disorder
  * (the r2 advisory race: an early-emitted straggler could later need merging
  * with a within-watermark gap event). The final emitted set is therefore a
  * pure function of the data and the final watermark — the DuckDB oracle
  * (q40/q55) computes it directly, and single-batch vs multi-batch runs agree.
  *
  * State per user is the list of not-yet-final sessions — bounded by the
  * watermark horizon (delay + gap window), not by history; session sums are
  * exact LONG micro-units so accumulation order cannot change the result.
  */
object StreamSession {

  final case class Ev(user_id: Long, ts_us: Long, value: Double,
      event_time: java.sql.Timestamp)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Int, sumMicro: Long)
  final case class OpenSessions(sessions: List[OpenSession])
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Int, sum_value_micro: Long)

  def update(gapUs: Long)(userId: Long, events: Iterator[Ev],
      state: GroupState[OpenSessions]): Iterator[SessionOut] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val existing = state.getOption.map(_.sessions).getOrElse(Nil)
    val runs = events.toSeq.sortBy(_.ts_us)
      .map(e => OpenSession(e.ts_us, e.ts_us, 1, math.floor(e.value * 1e6).toLong))
    // batch gap semantics over (state ∪ new events): interval-merge the runs
    // in start order — handles in-order growth, out-of-order backfill, and
    // straggler runs bridged by later events uniformly
    val all = (existing ++ runs).sortBy(s => (s.startUs, s.lastUs))
    val merged = all.foldLeft(List.empty[OpenSession]) { (acc, s) =>
      acc match {
        case h :: t if s.startUs - h.lastUs <= gapUs =>
          OpenSession(h.startUs, math.max(h.lastUs, s.lastUs), h.n + s.n,
            h.sumMicro + s.sumMicro) :: t
        case _ => s :: acc
      }
    }.reverse
    // finality: emit only sessions the watermark has sealed (no future
    // in-watermark event can reach within gap of them); keep the rest
    val (closed, open) = merged.partition(s => s.lastUs + gapUs < wmUs)
    if (open.isEmpty) state.remove()
    else {
      state.update(OpenSessions(open))
      // fire when the earliest kept session could seal; clamp above the
      // current watermark (setting a timeout below it throws)
      val target = open.map(s => s.lastUs / 1000 + gapUs / 1000).min
      state.setTimeoutTimestamp(math.max(target, state.getCurrentWatermarkMs() + 1))
    }
    closed.map(s => SessionOut(userId, s.startUs, s.lastUs, s.n, s.sumMicro)).iterator
  }

  /** The shared streaming pipeline: events source → watermark → per-user
    * flatMapGroupsWithState sessionization (source and sink chosen by caller).
    */
  private def sessionStream(source: DataFrame, gapUs: Long): Dataset[SessionOut] = {
    val spark = source.sparkSession
    import spark.implicits._
    source
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", "1 hour")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapUs))
  }

  /** Run sessionization as a streaming query over the events parquet and
    * return all sessions the watermark finalized (single AvailableNow batch
    * plus the no-data watermark batch).
    */
  def sessionizeEvents(spark: SparkSession, sfDir: String, gapUs: Long,
      queryName: String): Dataset[SessionOut] = {
    import spark.implicits._
    StreamSupport.runToMemory(
      sessionStream(StreamSupport.eventsFileStream(spark, sfDir), gapUs).toDF(),
      queryName).as[SessionOut]
  }

  /** The same pipeline driven through ≥2 micro-batches (time-split source
    * files, maxFilesPerTrigger=1) — exercises cross-batch state carry,
    * cross-batch session merging, and mid-stream watermark advancement. The
    * finality contract makes the emitted set identical to the single-batch
    * run, so q55 shares q40's oracle.
    */
  def sessionizeEventsMultiBatch(spark: SparkSession, sfDir: String, gapUs: Long,
      splitDir: String, queryName: String): Dataset[SessionOut] = {
    import spark.implicits._
    StreamSupport.runToMemory(
      sessionStream(StreamSupport.eventsSplitStream(spark, sfDir, splitDir), gapUs).toDF(),
      queryName).as[SessionOut]
  }

  /** Production sink shape: closed sessions appended to a parquet file sink
    * with a checkpoint (restartable; no driver-side materialization). The
    * memory-sink variant above exists only for the synchronous harness check.
    */
  def sessionizeEventsToParquet(spark: SparkSession, sfDir: String, gapUs: Long,
      outPath: String): Dataset[SessionOut] = {
    import spark.implicits._
    val sessions = sessionStream(StreamSupport.eventsFileStream(spark, sfDir), gapUs)
    val q = sessions.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$outPath/data")
      .option("checkpointLocation", s"$outPath/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // explicit schema: a run that closed no sessions appends zero files
    spark.read.schema(sessions.schema).parquet(s"$outPath/data").as[SessionOut]
  }
}
