package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Spark 4's `transformWithState` operator API — arbitrary per-key state in
  * the RocksDB state store with explicit `ValueState`/`ListState`/`MapState`
  * handles, the successor to `flatMapGroupsWithState` (which q40/q55 use).
  * Here: a per-event-type running aggregate whose state is a single
  * fixed-size ValueState tuple — state size O(|keys|), independent of rows,
  * the shape that scales to an unbounded stream on a 1000-executor cluster
  * (state shards by the groupByKey hash; RocksDB spills it off-heap).
  */
object StatefulOps {

  final case class TypeStats(eventType: String, nEvents: Long,
      sumValueMicro: Long, maxValueMicro: Long)

  /** Running (count, sum, max) per key in explicit operator state. Emits one
    * row per key per micro-batch THAT TOUCHED the key — the emission log
    * contract of update mode, made explicit in user code instead of
    * inherited from the agg operator (q163's variant).
    */
  class RunningStatsProcessor
      extends StatefulProcessor[String, (String, Long), TypeStats] {
    @transient private var state: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long, Long)]("stats",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[TypeStats] = {
      var (n, s, mx) = if (state.exists()) state.get()
                       else (0L, 0L, Long.MinValue)
      var touched = false
      while (rows.hasNext) {
        val v = rows.next()._2
        n += 1; s += v; if (v > mx) mx = v; touched = true
      }
      if (!touched) Iterator.empty
      else {
        state.update((n, s, mx))
        Iterator.single(TypeStats(key, n, s, mx))
      }
    }
  }

  /** transformWithState REQUIRES the RocksDB state store provider — set
    * for the body, restored after (the default HDFS-backed provider
    * stays in force for the other streaming entries). One definition
    * for every transformWithState harness in this module.
    */
  private def withRocksDbProvider[T](spark: SparkSession)(body: => T): T = {
    // set on the STREAM session — the streams built inside `body` run on
    // StreamSupport.streamSession(spark), not on the caller's session
    val s = StreamSupport.streamSession(spark)
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(provKey)
    s.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => s.conf.set(provKey, p)
      case None    => s.conf.unset(provKey)
    }
  }

  final case class GrangerSumsRow(pair: String, n: Long,
      sy: Long, sp: Long, sq: Long, syy: Long, spp: Long, sqq: Long,
      syp: Long, syq: Long, spq: Long)

  /** Running Granger sufficient statistics per directed pair — the q344
    * streaming causal monitor. State is ONE fixed-size row of the 10
    * mergeable sums the batch `Causal.grangerSumsFromLagged` computes
    * (plus n); each micro-batch that touches a pair emits that pair's
    * PREFIX sums, so the emission log is exactly "the moment matrix as
    * of each batch" and the decision arithmetic stays in the one shared
    * `Causal.grangerDecide` downstream. Sum magnitudes: milli-quantized
    * A1 values keep |v| ≲ 1e4, so each product ≤ 1e8 and each sum
    * ≤ n·1e8 — far inside LONG for any realistic stream; the decision's
    * n·Σ products run in DECIMAL(38,0) downstream as in batch.
    */
  class GrangerSumsProcessor
      extends StatefulProcessor[String, (String, Long, Long, Long),
        GrangerSumsRow] {
    @transient private var state: ValueState[GrangerSumsRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[GrangerSumsRow]("gsums",
        Encoders.product[GrangerSumsRow], TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Long, Long)],
        timerValues: TimerValues): Iterator[GrangerSumsRow] = {
      var st = if (state.exists()) state.get()
               else GrangerSumsRow(key, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
      var touched = false
      while (rows.hasNext) {
        val (_, y, p, q) = rows.next()
        st = GrangerSumsRow(key, st.n + 1, st.sy + y, st.sp + p, st.sq + q,
          st.syy + y * y, st.spp + p * p, st.sqq + q * q,
          st.syp + y * p, st.syq + y * q, st.spq + p * q)
        touched = true
      }
      if (!touched) Iterator.empty
      else {
        state.update(st)
        Iterator.single(st)
      }
    }
  }

  /** The q344 harness: per-pair running Granger sums via
    * transformWithState over a caller-built 2-batch time split of lagged
    * tuples `(pair, yv, pv, qv)`; update-mode memory sink = the per-batch
    * moment-matrix log. Same RocksDB set/restore discipline as q183.
    */
  def grangerSumsTws(spark: SparkSession, tuples: DataFrame,
      splitCol: String, boundary: Long, splitDir: String, cacheKey: String,
      queryName: String): DataFrame = withRocksDbProvider(spark) {
    import spark.implicits._
    val cols = tuples.select(col("pair"), col("yv"), col("pv"), col("qv"),
      col(splitCol))
    val src = StreamSupport.splitFilesStream(spark, splitDir, cacheKey) {
      Seq(cols.where(col(splitCol) < boundary).drop(splitCol),
        cols.where(col(splitCol) >= boundary).drop(splitCol))
    }
    val out = src.as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new GrangerSumsProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF()
    StreamSupport.runToMemory(out, queryName, outputMode = "update")
  }

  final case class WeightSumsRow(link: String, n: Long,
      sy: Long, sx: Long, ss: Long, sxx: Long, sss: Long,
      sxy: Long, ssy: Long, sxs: Long)

  /** [[WeightSumsRow]] plus the regressand's own square sum — the 10th
    * sum that turns the streaming weight monitor into a streaming
    * INFERENCE monitor (q368): syy closes C_yy, hence RSS, σ̂², se² and
    * the Wald verdict, all computable per emission from this one row.
    */
  final case class WeightSums2Row(link: String, n: Long,
      sy: Long, sx: Long, ss: Long, syy: Long, sxx: Long, sss: Long,
      sxy: Long, ssy: Long, sxs: Long)

  /** [[WeightSumsProcessor]] with the syy channel (q368). */
  class WeightSums2Processor
      extends StatefulProcessor[String, (String, Long, Long, Long),
        WeightSums2Row] {
    @transient private var state: ValueState[WeightSums2Row] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[WeightSums2Row]("wsums2",
        Encoders.product[WeightSums2Row], TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Long, Long)],
        timerValues: TimerValues): Iterator[WeightSums2Row] = {
      var st = if (state.exists()) state.get()
               else WeightSums2Row(key, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
                 0L, 0L)
      var touched = false
      while (rows.hasNext) {
        val (_, y, x, sv) = rows.next()
        st = WeightSums2Row(key, st.n + 1, st.sy + y, st.sx + x,
          st.ss + sv, st.syy + y * y, st.sxx + x * x, st.sss + sv * sv,
          st.sxy + x * y, st.ssy + sv * y, st.sxs + x * sv)
        touched = true
      }
      if (!touched) Iterator.empty
      else {
        state.update(st)
        Iterator.single(st)
      }
    }
  }

  /** The q368 harness: [[weightSumsTws]] with the 10-sum state and an
    * ARBITRARY prefix ladder — `boundaries` split the tuple stream into
    * |boundaries|+1 time-ordered micro-batches, so the emission log is
    * one inference snapshot per link per batch.
    */
  def weightSums2Tws(spark: SparkSession, tuples: DataFrame,
      splitCol: String, boundaries: Seq[Long], splitDir: String,
      cacheKey: String, queryName: String): DataFrame =
    withRocksDbProvider(spark) {
      import spark.implicits._
      val cols = tuples.select(col("link"), col("yv"), col("xv"),
        col("sv"), col(splitCol))
      val cuts = (Long.MinValue +: boundaries) :+ Long.MaxValue
      val src = StreamSupport.splitFilesStream(spark, splitDir, cacheKey) {
        cuts.sliding(2).map { case Seq(lo, hi) =>
          cols.where(col(splitCol) >= lo && col(splitCol) < hi)
            .drop(splitCol)
        }.toSeq
      }
      val out = src.as[(String, Long, Long, Long)]
        .groupByKey(_._1)
        .transformWithState(new WeightSums2Processor,
          TimeMode.None(), OutputMode.Update())
        .toDF()
      StreamSupport.runToMemory(out, queryName, outputMode = "update")
    }

  /** Running structural-OLS sufficient statistics per LINK — the q358
    * streaming weight monitor (the estimation sibling of the q344
    * Granger one). State is one fixed-size row of the 9 mergeable sums
    * the batch Cramer stage needs for a k ≤ 2 design (y = target, x =
    * this link's regressor, s = the sibling regressor, fed as 0 for
    * single-parent links); each batch that touches a link emits its
    * PREFIX sums, so the log is "the design-moment matrix as of each
    * batch" and the beta arithmetic stays in the one shared
    * `Causal.structuralBetasFromSums` downstream.
    */
  class WeightSumsProcessor
      extends StatefulProcessor[String, (String, Long, Long, Long),
        WeightSumsRow] {
    @transient private var state: ValueState[WeightSumsRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[WeightSumsRow]("wsums",
        Encoders.product[WeightSumsRow], TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Long, Long)],
        timerValues: TimerValues): Iterator[WeightSumsRow] = {
      var st = if (state.exists()) state.get()
               else WeightSumsRow(key, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
      var touched = false
      while (rows.hasNext) {
        val (_, y, x, sv) = rows.next()
        st = WeightSumsRow(key, st.n + 1, st.sy + y, st.sx + x, st.ss + sv,
          st.sxx + x * x, st.sss + sv * sv, st.sxy + x * y,
          st.ssy + sv * y, st.sxs + x * sv)
        touched = true
      }
      if (!touched) Iterator.empty
      else {
        state.update(st)
        Iterator.single(st)
      }
    }
  }

  /** The q358 harness: per-link running design sums via
    * transformWithState over a caller-built 2-batch time split of design
    * tuples `(link, yv, xv, sv)` — the [[grangerSumsTws]] shape verbatim.
    */
  def weightSumsTws(spark: SparkSession, tuples: DataFrame,
      splitCol: String, boundary: Long, splitDir: String, cacheKey: String,
      queryName: String): DataFrame = withRocksDbProvider(spark) {
    import spark.implicits._
    val cols = tuples.select(col("link"), col("yv"), col("xv"), col("sv"),
      col(splitCol))
    val src = StreamSupport.splitFilesStream(spark, splitDir, cacheKey) {
      Seq(cols.where(col(splitCol) < boundary).drop(splitCol),
        cols.where(col(splitCol) >= boundary).drop(splitCol))
    }
    val out = src.as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new WeightSumsProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF()
    StreamSupport.runToMemory(out, queryName, outputMode = "update")
  }

  /** The q183 harness: per-type running stats via transformWithState over
    * the 2-batch parity split (even event ids then odd), update-mode memory
    * sink = the emission log. transformWithState REQUIRES the RocksDB state
    * store provider — set for this query, restored after (the default
    * HDFS-backed provider stays in force for the other streaming entries).
    */
  def eventsRunningStatsTws(spark: SparkSession, sfDir: String,
      splitDir: String, queryName: String): DataFrame =
    withRocksDbProvider(spark) {
      import spark.implicits._
      val src = StreamSupport.eventsParityStream(spark, sfDir, splitDir)
        .select(col("event_type"),
          floor(col("value") * lit(1e6)).cast("long").as("vm"))
        .as[(String, Long)]
      val out = src.groupByKey(_._1)
        .transformWithState(new RunningStatsProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF()
        .select(col("eventType").as("event_type"),
          col("nEvents").as("n_events"),
          col("sumValueMicro").as("sum_value_micro"),
          col("maxValueMicro").as("max_value_micro"))
      StreamSupport.runToMemory(out, queryName, outputMode = "update")
    }
}
