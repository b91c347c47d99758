package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Custom stateful streaming operator: gap-based sessionization with
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset state API the batch
  * Sessionize operator maps onto in continuous mode. State per user is O(1)
  * (open-session accumulator); closed sessions are emitted when a later event
  * arrives past the gap, and the final open session on event-time timeout.
  */
object StreamSession {

  final case class Ev(user_id: Long, ts_us: Long, value: Double,
      event_time: java.sql.Timestamp)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Int, sum: Double)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Int, sum_value: Double)

  def update(gapUs: Long)(userId: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.value))
    var out = Vector.empty[SessionOut]
    var cur = state.getOption
    if (state.hasTimedOut) {
      cur.foreach(s => out :+= SessionOut(userId, s.startUs, s.lastUs, s.n, s.sum))
      state.remove()
      return out.iterator
    }
    // late stragglers: events more than gap BEFORE the open session's start
    // can never join it under batch gap semantics — sessionize them among
    // themselves and emit closed (they all end > gap before cur.startUs)
    var pre: Option[OpenSession] = None
    // a later event may have extended cur's start BACKWARD (min), bringing
    // the straggler run within gap of it — then batch semantics make them ONE
    // session, so every close (mid-batch gap close AND end-of-batch flush)
    // must merge a bridged pre first
    def mergeBridged(s: OpenSession): OpenSession = pre match {
      case Some(p) if s.startUs - p.lastUs <= gapUs =>
        pre = None
        OpenSession(math.min(p.startUs, s.startUs), math.max(p.lastUs, s.lastUs),
          p.n + s.n, p.sum + s.sum)
      case _ => s
    }
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts_us < s.startUs - gapUs =>
          pre match {
            case Some(p) if e.ts_us - p.lastUs <= gapUs =>
              pre = Some(OpenSession(p.startUs, math.max(p.lastUs, e.ts_us),
                p.n + 1, p.sum + e.value))
            case Some(p) =>
              out :+= SessionOut(userId, p.startUs, p.lastUs, p.n, p.sum)
              pre = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
            case None =>
              pre = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
          }
        case Some(s) if e.ts_us - s.lastUs <= gapUs =>
          // a late (out-of-order, within-watermark) event must not regress the
          // session bounds: extend with min/max, not the raw event time
          cur = Some(OpenSession(math.min(s.startUs, e.ts_us),
            math.max(s.lastUs, e.ts_us), s.n + 1, s.sum + e.value))
        case Some(s) =>
          val closed = mergeBridged(s)
          out :+= SessionOut(userId, closed.startUs, closed.lastUs, closed.n, closed.sum)
          cur = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
        case None =>
          cur = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
      }
    }
    cur = cur.map(mergeBridged)
    // earlier-emitted pre runs stay separate by construction: they end > gap
    // before the surviving pre/cur start
    pre.foreach(p => out :+= SessionOut(userId, p.startUs, p.lastUs, p.n, p.sum))
    cur.foreach { s =>
      state.update(s)
      if (state.getOption.isDefined) {
        // event-time timeouts below the current watermark throw — clamp
        // (a user whose last event predates watermark−gap times out next batch)
        val target = s.lastUs / 1000 + gapUs / 1000
        val wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(math.max(target, wm + 1))
      }
    }
    out.iterator
  }

  /** The shared streaming pipeline: events file stream → watermark →
    * per-user flatMapGroupsWithState sessionization (sink chosen by caller).
    */
  private def sessionStream(spark: SparkSession, sfDir: String,
      gapUs: Long): Dataset[SessionOut] = {
    import spark.implicits._
    StreamSupport.eventsFileStream(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", "1 hour")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapUs))
  }

  /** Run sessionization as a streaming query over the events parquet and
    * return all sessions emitted (closed by gap or by watermark timeout).
    */
  def sessionizeEvents(spark: SparkSession, sfDir: String, gapUs: Long,
      queryName: String): Dataset[SessionOut] = {
    import spark.implicits._
    StreamSupport.runToMemory(sessionStream(spark, sfDir, gapUs).toDF(), queryName)
      .as[SessionOut]
  }

  /** Production sink shape: closed sessions appended to a parquet file sink
    * with a checkpoint (restartable; no driver-side materialization). The
    * memory-sink variant above exists only for the synchronous harness check.
    */
  def sessionizeEventsToParquet(spark: SparkSession, sfDir: String, gapUs: Long,
      outPath: String): Dataset[SessionOut] = {
    import spark.implicits._
    val sessions = sessionStream(spark, sfDir, gapUs)
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
