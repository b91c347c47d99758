package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.generate.{Generate, Sinks}
import graft.ops.Lagged
import graft.metrics.Metrics

/** The SURVEY §8.2 minimum end-to-end slice, as one test: config → kernel →
  * CSV persist → scan → lagged view → OLS coefficient recovery → truth-vs-
  * truth metrics F1 = 1 — exercising every module of the spine.
  */
class E2ESpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("A1 4-var lag-2: generate → persist → scan → analyze → score") {
    val cfg = Grid.forFamily("A1").find(c =>
      c.nPoints == 5000 && c.nVars == 4 && c.maxLag == 2 && c.noiseType == "gaussian").get

    // generate + persist CSV corpus
    val rows = Generate.series(spark, Seq(cfg))
    val dir = Files.createTempDirectory("e2e").toString
    Sinks.writeCsvCorpus(rows, Seq(cfg), dir, missing = false)
    val csv = s"$dir/${Sinks.relPath(cfg, missing = false)}"
    assert(new java.io.File(csv).isFile)

    // scan back (S6) and build the lagged view (R1)
    val df = Sinks.readWideCsv(spark, csv).withColumn("ds", lit(1))
    val lagged = Lagged.laggedView(df, Seq("ds"), "time", Seq("X1", "X2", "X3", "X4"), 2)
    assert(lagged.count() == 4998)

    // OLS: X1 = 0.4 * X2[t] (a1.py:28); X4 = 0.25 * X1[t-2]
    val coefs = lagged.agg(
      expr("regr_slope(X1_0, X2_0)").as("b1"),
      expr("regr_slope(X4_0, X1_2)").as("b2")).collect()(0)
    assert(math.abs(coefs.getDouble(0) - 0.4) < 0.05, s"b1=${coefs.getDouble(0)}")
    assert(math.abs(coefs.getDouble(1) - 0.25) < 0.05, s"b2=${coefs.getDouble(1)}")

    // truth-vs-truth through the metrics path: F1 = 1, SHD = 0
    import spark.implicits._
    val links = spark.createDataset(Parser.truthLinks("A1", 4, 2))
      .withColumn("graphId", lit("g")).select("graphId", "source", "target", "lag")
    val totals = Seq(("g", 4 * 4 * 3)).toDF("graphId", "total")
    val scored = Metrics.f1(Metrics.tprFdr(Metrics.confusion(links, links, totals))).collect()(0)
    assert(scored.getAs[Double]("f1") == 1.0 && scored.getAs[Double]("tpr") == 1.0)
    assert(Metrics.shdXor(links, links).collect()(0).getAs[Long]("shd") == 0L)

    // structure + tensor sinks render without error
    Sinks.writeStructureText("A1", 4, 2, s"$dir/structure.txt")
    val (vals, graph, p) = Sinks.truthTensors("A1", 4, 2)
    Sinks.writeNpy(s"$dir/val_matrix.npy", Seq(p, p, 3), vals)
    Sinks.writeNpyBool(s"$dir/graph_matrix.npy", Seq(p, p, 3), graph)
    assert(new java.io.File(s"$dir/val_matrix.npy").length() > 128)
  }

  test("determinism end-to-end: same config twice gives identical rows") {
    val cfg = Grid.forFamily("D3C").head.copy(nPoints = 500)
    import spark.implicits._
    val a = Generate.series(spark, Seq(cfg)).collect().sortBy(_.t)
    val b = Generate.series(spark, Seq(cfg)).collect().sortBy(_.t)
    assert(a.toSeq == b.toSeq)
  }

  test("LSH near-dup scale path finds planted near-duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 32
    val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val vecs = (0L until 100L).map { i =>
      if (i < 2) (i, base.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
      else (i, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val pairs = graft.sim.Similarity.embeddingNearDupsLsh(df, "vec_id", "embedding", dim, 0.95)
      .collect()
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L),
      "planted near-dup pair (0,1) must be found")
  }
}
