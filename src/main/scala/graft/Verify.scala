package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    // optional extra args: run only the named queries (local iteration aid)
    val only = rest.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // generated-data queries dump their kernel output here; the oracle SQL
    // references it via __GEN_DIR__ (substituted below), so DuckDB aggregates
    // the exact rows this run produced. The scratch lives OUTSIDE outDir
    // (anything under outDir is a query artifact to the driver's glob, and
    // the old `$outDir/_gen` location surfaced as a permanent no-oracle row
    // — `_gen` is now a real digest query over its own dump instead) but as
    // a DETERMINISTIC sibling, `<outDir>_gen`: re-runs overwrite it rather
    // than leaking a sweep dump per run, it survives as long as the outDir
    // artifact it belongs to, and archiving both keeps the oracle replayable
    // strip trailing separators first: "/tmp/out/" would otherwise yield
    // genDir = "/tmp/out/_gen" INSIDE outDir, where the `_gen` query's own
    // overwrite-write would wipe the whole scratch mid-run
    val outNorm = outDir.replaceAll("/+$", "")
    val genDir = new java.io.File(s"${outNorm}_gen").getAbsolutePath
    System.setProperty("graft.gen.dir", genDir)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json is pure data (SparkEntry.oracleSql + path
    // substitution) — write it BEFORE the dump loop. Round 13's driver
    // timeout killed Verify mid-loop and, with the oracle map written last,
    // the checker found no oracle at all: the whole round's correctness
    // collapsed to {} instead of degrading to the completed subset. Now a
    // kill at any point leaves every already-dumped query adjudicable
    // (the checker reports NO-SPARK-OUTPUT for the rest).
    val json = SparkEntry.oracleSql
      // keep the dump self-consistent under the `only` filter — a full
      // oracle map over a partial query run would compare stale parquet
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__GEN_DIR__", genDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Cheapest-first dump order (r13 verdict #3): under a driver timeout
    // the run loses only the expensive tail instead of a name-ordered
    // random half. The committed BENCHDETAIL medians are the cost proxy
    // (Verify's coalesce(1) dump cost tracks compute cost); entries
    // without a committed median (new this round) sort first — they were
    // individually gated at sf0.001/0.01 before landing, so they're cheap,
    // and their correctness evidence is the round's newest signal.
    val prevCost = BenchPolicy.loadPrevMedians()
    val ordered = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
      .sortBy { case (name, _) => (prevCost.getOrElse(name, 0.0), name) }
    // Concurrent dumps (r13 verdict #3): the 384-query loop is mostly
    // per-query overhead (plan + a few small jobs + a coalesce(1) write),
    // so serial execution left 3/4 of the 16 cores idle. N worker threads
    // drain a shared queue — safe because every query's side outputs
    // (gen dumps, bucketed tables) are query-prefixed — with two
    // kill-safety/health rules:
    //   1. each dump writes to `outDir/_tmp_<name>` and renames into
    //      place on success, so a driver-timeout kill can never leave a
    //      half-written parquet dir under a query's name (the checker
    //      would die reading a truncated footer; `_tmp_` dirs are
    //      invisible to its per-oracle glob);
    //   2. the old per-query global clearCache/unpersist is UNSAFE under
    //      concurrency (it would evict a sibling's live localCheckpoint
    //      mid-query) — instead the queue drains in blocks with a
    //      stop-the-world cleanup barrier between blocks, bounding
    //      accumulated heap state to one block's worth.
    val nThreads = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt)
    val blockSize = 16 * nThreads
    ordered.grouped(blockSize).foreach { block =>
      val queue = new java.util.concurrent.ConcurrentLinkedQueue[
        (String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
      block.foreach(queue.add)
      val workers = (1 to math.min(nThreads, block.size)).map { _ =>
        new Thread(() => {
          var e = queue.poll()
          while (e != null) {
            val (name, fn) = e
            val tmp = new java.io.File(s"$outDir/_tmp_$name")
            val dst = new java.io.File(s"$outDir/$name")
            try {
              fn(spark, sfDir).coalesce(1).write.mode("overwrite")
                .parquet(tmp.getPath)
              if (dst.exists)
                scala.reflect.io.Directory(dst).deleteRecursively()
              if (!tmp.renameTo(dst))
                throw new java.io.IOException(s"rename $tmp -> $dst failed")
            } catch { case ex: Throwable =>
              System.err.println(s"[verify] $name failed: ${ex.getMessage}")
              scala.reflect.io.Directory(tmp).deleteRecursively()
            }
            e = queue.poll()
          }
        })
      }
      workers.foreach(_.start())
      workers.foreach(_.join())
      // barrier: no query in flight — release cached plans and
      // localCheckpoint blocks so ~400 dumps in one JVM don't accumulate
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
