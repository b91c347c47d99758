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

  test("plot sinks: all five reference figure families render to real PNGs") {
    import graft.generate.{PlotReady, PlotSink}
    val dir = Files.createTempDirectory("plots").toString
    val vars4 = (1 to 4).map(i => s"X$i")

    // series + trend from a C1 config (c1.py:390-411, a1.py:286-295)
    val cfgC1 = Grid.forFamily("C1").find(c =>
      c.nPoints == 1000 && c.nVars == 4 && c.maxLag == 2).get
    val wide = Generate.wideFast(spark, Seq(cfgC1))
    val sRows = PlotReady.seriesSample(wide, vars4, 10).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3))).toSeq
    PlotSink.series(sRows, "C1 n1000 vars4 lag2", s"$dir/series.png")
    val fits = PlotReady.trendFitExact(wide, vars4).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    PlotSink.trend(sRows, fits, "C1 trend decomposition", s"$dir/trend.png")

    // causal graph from the truth links (a1.py:272-282)
    val links = Parser.truthLinks("A1", 4, 2).map(l => (l.source, l.lag, l.target))
    PlotSink.causalGraph(vars4, links, "A1 causal graph", s"$dir/graph.png")

    // missing-pattern heatmap + sampling histogram from D3C (d3c.py:487-510)
    val cfgD = Grid.forFamily("D3C").find(c =>
      c.nPoints == 3000 && c.nVars == 6 && c.maxLag == 2).get
    val wideD = Generate.wideFast(spark, Seq(cfgD))
    val cells = PlotReady.missingPatternCounts(
        Generate.missingView(wideD), (1 to 6).map(i => s"X$i"), 50).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    PlotSink.missingPattern(cells, "D3C missing pattern", s"$dir/missing.png")
    val bars = PlotReady.samplingIntervalHist(wideD, 0.002).collect()
      .map(r => (r.getDouble(1), r.getLong(2))).toSeq
    PlotSink.histogram(bars, 0.002, "D3C sampling intervals", s"$dir/hist.png")

    // every artifact must be a real decodable PNG with actual ink on it
    for (f <- Seq("series", "trend", "graph", "missing", "hist")) {
      val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/$f.png"))
      assert(bytes.length > 2000, s"$f.png is ${bytes.length} bytes")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == 800 && img.getHeight == 600, s"$f.png dims")
      val nonWhite = (for {
        y <- 0 until img.getHeight by 4; x <- 0 until img.getWidth by 4
      } yield img.getRGB(x, y)).count(_ != 0xFFFFFFFF)
      assert(nonWhite > 200, s"$f.png looks blank ($nonWhite inked samples)")
    }
  }
}
