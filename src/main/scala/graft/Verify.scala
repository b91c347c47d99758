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
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries are independent — release cached plans / localCheckpoint
      // blocks so ~100 dumps in one JVM don't accumulate heap state
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
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
    val json = SparkEntry.oracleSql
      // keep the dump self-consistent under the `only` filter — a full
      // oracle map over a partial query run would compare stale parquet
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__GEN_DIR__", genDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
