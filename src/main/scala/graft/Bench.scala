package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Catalog, Grid}
import graft.generate.Generate

/** Per-round benchmark: one JSON line with per-query seconds plus the
  * full-sweep generation metric (the reference's actual workload — BASELINE
  * extrapolates ≈6-10 min single-threaded Python for the 2,268-config corpus;
  * the JVM kernel fan-out runs the complete grid here).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every input table + run one small query so JIT/codegen
    // and file-listing costs don't land on the first timed query
    Seq("lineitem", "orders", "customer", "nation", "region", "part",
        "supplier", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => () }
    }
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // both measurements of any re-measured query, so the published min is
    // auditable (min-only reporting would hide how often contention hits)
    val runs = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    // a failing query must not masquerade as a fast success — record it
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // optional comma-separated substring filter for targeted profiling runs
    // (e.g. SPARK_GRAFT_BENCH_ONLY=q27,q52); full runs leave it unset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty) // empty/blank env var means unset, not "run nothing"
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.contains)) }
    selected.foreach { case (name, fn) =>
      def once(): Double = time {
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case _: Throwable =>
          try { fn(spark, sfDir).count(); () }
          catch { case e: Throwable =>
            failed += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          }
        }
      }
      val t1 = once()
      // re-measure anything slow and report the min: a single contended
      // measurement (r2: q51 13.3 s vs 0.9 s steady-state) otherwise reads
      // as a plan defect; a genuinely slow query stays slow on both runs
      if (t1 > 2.0 && !failed.contains(name)) {
        val t2 = once()
        runs(name) = Seq(t1, t2)
        results(name) = math.min(t1, t2)
      } else results(name) = t1
      // queries are independent: release this query's cached plans,
      // localCheckpoint blocks and broadcasts before the next measurement —
      // ~100 queries of accumulated executor state in one 8g JVM otherwise
      // GC-thrashes the late entries (the r5 gen section measured 13-20x
      // slow purely from heap pressure, with identical generation code)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // the gen section also participates in the ONLY filter (e.g. ONLY=gen_
    // matches no query name but selects the generation stages alone — the
    // fresh-JVM profiling shape)
    val runGen = only.forall(_.exists(t =>
      "gen_full_sweep".contains(t) || "gen_scale".contains(t)))
    val (genStage, taskSkew) = if (!runGen) (Array.empty[Long], 0.0) else {
    // give the 25M-row generation stages a settled heap: the measurement
    // should see kernel + write cost, not the query suite's garbage
    System.gc()
    // full-sweep generation: every config of all 18 families (BASELINE headline)
    results("gen_full_sweep") = time {
      Generate.series(spark, Grid.all()).toDF()
        .agg(count(lit(1)), sum("x1")).collect()
    }

    // same sweep through the InternalRow fast path (no typed-Encoder layer;
    // bitwise-identical output per GenerateSpec)
    results("gen_full_sweep_fast") = time {
      Generate.wideFast(spark, Grid.all())
        .agg(count(lit(1)), sum("X1")).collect()
    }

    // 100×-scale generation: 512 configs × 50k points = 25.6M rows through the
    // same zero-shuffle kernel fan-out, written as family/nVars/maxLag-
    // partitioned parquet; a listener captures per-task durations of the
    // generation+write stage to prove even load (round-robin config spread)
    val byStage = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    // only count tasks LAUNCHED after this point — the async listener bus can
    // still deliver queued task-ends from earlier bench queries
    val attachMs = System.currentTimeMillis()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null && te.taskInfo.launchTime >= attachMs) byStage.synchronized {
          byStage.getOrElseUpdate(te.stageId, scala.collection.mutable.ArrayBuffer.empty) +=
            te.taskInfo.duration
        }
    }
    val scaleDir = "target/bench_gen_scale"
    val grid = Grid.all()
    val scaleCfgs = (0 until 512).map(i =>
      grid(i % grid.size).copy(configId = 1000000L + i, nPoints = 50000))
    spark.sparkContext.addSparkListener(listener)
    results("gen_scale_25m_partitioned_write") = time {
      Generate.writeParquet(Generate.wideFast(spark, scaleCfgs), scaleDir)
    }
    Thread.sleep(1000) // listener bus is async — let it drain
    spark.sparkContext.removeSparkListener(listener)
    val genStage = byStage.synchronized {
      if (byStage.isEmpty) Array.empty[Long]
      else byStage.values.maxBy(_.sum).toArray.sorted
    }
    val taskSkew = if (genStage.length >= 4)
      genStage.last.toDouble / math.max(1L, genStage(genStage.length / 2)) else 0.0
    // keep the dir out of later rounds' way
    scala.reflect.io.Directory(new java.io.File(scaleDir)).deleteRecursively()
    (genStage, taskSkew)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val rr = runs.map { case (k, vs) =>
      "\"" + k + "\":" + vs.mkString("[", ",", "]") }.mkString("{", ",", "}")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.sum
    val skewStr = String.format(java.util.Locale.ROOT, "%.3f",
      java.lang.Double.valueOf(taskSkew)) // locale-proof: JSON needs '.'
    // a filtered run SKIPPED the scale generation — report that honestly
    // instead of fabricating a 25.6M-row metric that never executed
    val genScale = if (only.nonEmpty) "null"
      else s"""{"rows":${512L * 50000L},"tasks":${genStage.length},""" +
        s""""task_skew_max_over_median":$skewStr}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"remeasured":$rr,"failed":$fl,"gen_scale":$genScale,"sf":"$sfDir"}""")
    spark.stop()
  }
}
