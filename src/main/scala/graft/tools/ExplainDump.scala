package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Optimization-round plan capture: writes `.explain("formatted")` output for
  * named queries (SparkEntry.queries) or bench rungs to
  * `plans/<tag>/<name>_<suffix>.txt` — the before/after evidence files the
  * round deliverable requires. Usage:
  *   runMain graft.ExplainDump <sfDir> <outDir> <suffix> <name> [<name>...]
  * Bench rung names (pcblocks_*, bhfdr_*, weightwide_*, dscale_*, qscale_*)
  * are reconstructed with the same inputs Bench uses.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names @ _*) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = frame(spark, sfDir, name)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        println(s"[explain] wrote $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }

  /** The frame a bench rung times, rebuilt with Bench's own inputs; falls
    * back to the declared-query registry.
    */
  def frame(s: SparkSession, d: String, name: String): DataFrame = name match {
    case "pcblocks_p80_stable3_oriented" =>
      graft.metrics.Causal.pcOrient3(
        graft.metrics.Causal.pcSkeleton3Stable(Bench.widePanel3(s, 16, 200), 100L),
        4, requirePairRows = false).groupBy("dir").count()
    case "pcblocks_p320_stable3_oriented" =>
      graft.metrics.Causal.pcOrient3(
        graft.metrics.Causal.pcSkeleton3Stable(Bench.widePanel3(s, 64, 200), 100L),
        4, requirePairRows = false).groupBy("dir").count()
    case "pcwide_p128_stable_oriented" =>
      graft.metrics.Causal.pcOrient2(
        graft.metrics.Causal.pcSkeleton2Stable(Bench.widePanel(s, 128, 200), 100L),
        4, requirePairRows = false).groupBy("dir").count()
    case "weightwide_p256_dense" => {
      import s.implicits._
      val pan = Bench.widePanel(s, 256, 10000)
      val virt = pan.select(concat(col("series"), lit("@0")).as("vs"),
        col("day").as("t"), col("v"))
      def nm(i: Int) = f"X$i%03d"
      val links = (1 until 256).map(i => (nm(i), nm(i - 1), 0,
        s"${nm(i)}@0", s"${nm(i - 1)}@0", None: Option[String]))
      val linksDf = links.toDF("target", "source", "lag", "y", "x", "sib")
      graft.metrics.Causal.structuralBetas(
        graft.metrics.Causal.virtualCrossMoments(virt,
          col("t").between(0, 9999), broadcastB = false), linksDf)
        .agg(sum(abs(col("beta_ppm"))))
    }
    case "weightwide_p256_sparse" => {
      import s.implicits._
      val pan = Bench.widePanel(s, 256, 10000)
      val virt = pan.select(concat(col("series"), lit("@0")).as("vs"),
        col("day").as("t"), col("v"))
      def nm(i: Int) = f"X$i%03d"
      val links = (1 until 256).map(i => (nm(i), nm(i - 1), 0,
        s"${nm(i)}@0", s"${nm(i - 1)}@0", None: Option[String]))
      val linksDf = links.toDF("target", "source", "lag", "y", "x", "sib")
      val wanted = links.flatMap { l =>
        val (a, b) = if (l._5 <= l._4) (l._5, l._4) else (l._4, l._5)
        Seq((l._4, l._4), (l._5, l._5), (a, b))
      }.distinct.toDF("na", "nb")
      graft.metrics.Causal.structuralBetas(
        graft.metrics.Causal.virtualCrossMomentsSparse(virt, wanted,
          col("t").between(0, 9999)), linksDf)
        .agg(sum(abs(col("beta_ppm"))))
    }
    case "dscale_quality_100x" => {
      val docs = s.read.parquet(s"$d/documents.parquet").select("doc_id", "text")
      graft.text.TextOps.qualityScore(docs)
    }
    case "dscale_bm25_10x" => {
      val docs = s.read.parquet(s"$d/documents.parquet").select("doc_id", "text")
      val maxDoc = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1L
      val probe = col("doc_id") < maxDoc && col("doc_id") % 50 === 0
      graft.text.Index.bm25TopK(docs, "doc_id", "text", probe, k = 5)
    }
    case other => SparkEntry.queries(other)(s, d)
  }
}
