package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Resample, Sketch}
import graft.text.Packing

/** Unit coverage for the round-5 regularization + sketch operators:
  * Resample (downsample / ffill / interpolation), the integer-register HLL,
  * and span-level chunk dedup.
  */
class ResampleSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- Resample.downsample -------------------------------------------------

  test("downsample: counts, sums, and last-observation tie-break") {
    import spark.implicits._
    // key k: bucket 0 has ts 1,5 (last=5); bucket 10 has ts 12 twice with
    // tie ids 1,2 — the higher tie id must win
    val df = Seq(
      ("k", 1L, 1L, 1.5), ("k", 5L, 2L, 2.5),
      ("k", 12L, 1L, 7.0), ("k", 12L, 2L, 9.0),
      ("j", 3L, 1L, -1.25)
    ).toDF("g", "ts_us", "id", "v")
    val out = Resample.downsample(df, Seq("g"), "ts_us", "v", "id", 10L)
      .orderBy("g", "bucket_us").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq(("j", 0L, 1L, -1250000L, -1250000L),
          ("k", 0L, 2L, 4000000L, 2500000L),
          ("k", 10L, 2L, 16000000L, 9000000L)))
  }

  test("resampleFfill: dense grid, carry-forward, staleness") {
    import spark.implicits._
    // key a observes in buckets 0 and 30; key b only in bucket 10.
    // global grid = buckets 0..30.
    val df = Seq(
      ("a", 2L, 1L, 1.0), ("a", 33L, 2L, 4.0),
      ("b", 15L, 3L, 2.0)
    ).toDF("g", "ts_us", "id", "v")
    val out = Resample.resampleFfill(df, Seq("g"), "ts_us", "v", "id", 10L)
      .orderBy("g", "bucket_us")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", 0L, 1L, 1000000L, 0L), ("a", 10L, 0L, 1000000L, 1L),
      ("a", 20L, 0L, 1000000L, 2L), ("a", 30L, 1L, 4000000L, 0L),
      ("b", 0L, 0L, null, null), ("b", 10L, 1L, 2000000L, 0L),
      ("b", 20L, 0L, 2000000L, 1L), ("b", 30L, 0L, 2000000L, 2L)))
  }

  test("resampleFfill is repartition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { i =>
      (s"k${i % 3}", rnd.nextInt(1000).toLong, i.toLong, rnd.nextDouble() * 10 - 5)
    }
    val df = rows.toDF("g", "ts_us", "id", "v")
    def run(d: DataFrame) =
      Resample.resampleFfill(d, Seq("g"), "ts_us", "v", "id", 50L)
        .orderBy("g", "bucket_us").collect().toSeq
    assert(run(df) == run(df.repartition(13)))
  }

  // ---- Resample.interpolateToGrid -----------------------------------------

  private def interpCase(samples: Seq[(Long, Long, Long)], gridUs: Seq[Long]): Seq[(Long, Option[Long])] = {
    import spark.implicits._
    val s = samples.toDF("k", "t_us", "v_micro")
    val g = gridUs.map(x => (1L, x)).toDF("k", "grid_us")
    Resample.interpolateToGrid(s, g, Seq("k"), "t_us", "v_micro")
      .orderBy("grid_us").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSeq
  }

  test("interpolateToGrid: exact hits, midpoints, tail ffill, head drop") {
    // samples at t=10 (v=1000) and t=20 (v=2000)
    val out = interpCase(
      Seq((1L, 10L, 1000L), (1L, 20L, 2000L)),
      Seq(0L, 10L, 15L, 17L, 20L, 25L))
    assert(out == Seq(
      (10L, Some(1000L)),  // exact hit = sample value
      (15L, Some(1500L)),  // midpoint
      (17L, Some(1700L)),  // 7/10 of the way
      (20L, Some(2000L)),  // exact hit on last sample
      (25L, Some(2000L)))) // past the last sample: carry forward
    // g=0 (before first sample) was dropped entirely
  }

  test("interpolateToGrid: negative values stay exact (shift keeps floor==trunc)") {
    // v from -3000 to +1000 over t in [0, 4]: slope 1000/unit
    val out = interpCase(
      Seq((1L, 0L, -3000L), (1L, 4L, 1000L)),
      Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.map(_._2.get) == Seq(-3000L, -2000L, -1000L, 0L, 1000L))
    // non-divisible: floor semantics, bit-identical to DuckDB's //
    val odd = interpCase(Seq((1L, 0L, 0L), (1L, 3L, -100L)), Seq(1L, 2L))
    assert(odd.map(_._2.get) == Seq(-34L, -67L)) // floor(-100/3), floor(-200/3)
  }

  test("interpolateToGrid matches a sequential replica on random series") {
    val rnd = new scala.util.Random(23)
    val ts = (1 to 80).scanLeft(5L)((a, _) => a + 1 + rnd.nextInt(20)).distinct
    val vs = ts.map(_ => rnd.nextLong() % 5000000L)
    val samples = ts.zip(vs).map { case (t, v) => (1L, t, v) }
    val grid = (0L to ts.max + 30 by 7L).toSeq
    val got = interpCase(samples, grid)
    val expect = grid.flatMap { g =>
      val prev = samples.filter(_._2 <= g).sortBy(_._2).lastOption
      val next = samples.filter(_._2 >= g).sortBy(_._2).headOption
      prev.map { case (_, tp, vp) =>
        val v = next match {
          case Some((_, tn, vn)) if tn != tp =>
            vp + Math.floorDiv((vn - vp) * (g - tp), tn - tp)
          case _ => vp
        }
        (g, Some(v))
      }
    }
    assert(got == expect)
  }

  test("interpolateToGrid fails loudly when |dv|*gap would overflow LONG") {
    val e = intercept[Exception] {
      interpCase(Seq((1L, 0L, 0L), (1L, 1L << 24, 1L << 41)), Seq(1000L))
    }
    assert(e.getMessage != null)
  }

  // ---- Sketch (HLL) --------------------------------------------------------

  private def hashDf(hs: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    hs.toDF("g", "h")
  }

  test("hllRegisters match a bit-level replica") {
    val rnd = new scala.util.Random(3)
    val hs = (1 to 2000).map(_ => ("a", rnd.nextInt(Int.MaxValue).toLong))
    val got = Sketch.hllRegisters(hashDf(hs), Seq("g"), "h")
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val expect = hs.groupBy(_._2 & 63).map { case (b, xs) =>
      b -> xs.map { case (_, h) =>
        val w = h >> 6
        if (w == 0) Sketch.HllMaxRho
        else java.lang.Long.numberOfTrailingZeros(w) + 1
      }.max
    }
    assert(got == expect)
  }

  test("hll registers merge associatively (sketch of union == max of partials)") {
    val rnd = new scala.util.Random(5)
    val a = (1 to 3000).map(_ => ("g", rnd.nextInt(Int.MaxValue).toLong))
    val b = (1 to 3000).map(_ => ("g", rnd.nextInt(Int.MaxValue).toLong))
    def regs(xs: Seq[(String, Long)]) =
      Sketch.hllRegisters(hashDf(xs), Seq("g"), "h")
        .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val merged = (regs(a).toSeq ++ regs(b).toSeq).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).max }
    assert(regs(a ++ b) == merged)
  }

  test("hll estimate lands within 20% of the true cardinality") {
    // distinct 31-bit hash values stand in for distinct tokens
    val rnd = new scala.util.Random(7)
    val distinct = (1 to 20000).map(_ => rnd.nextInt(Int.MaxValue).toLong).distinct
    val hs = (distinct ++ distinct.take(5000)).map(("g", _)) // with repeats
    val row = Sketch.hllWithExact(hashDf(hs), Seq("g"), "h").collect().head
    val est = row.getAs[Long]("est_milli").toDouble / 1000.0
    val exact = row.getAs[Long]("n_exact").toDouble
    assert(exact == distinct.size.toDouble)
    assert(math.abs(est - exact) / exact < 0.20, s"est=$est exact=$exact")
  }

  // ---- Anomaly (exact-integer 3-sigma) ------------------------------------

  test("threeSigmaOutliers matches a double-arithmetic replica") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // mostly N(0, 1e6) with a few large spikes
    val rows = (1 to 2000).map { i =>
      val v = if (i % 250 == 0) 50000000L + i else (rnd.nextGaussian() * 1e6).toLong
      (s"g${i % 2}", i.toLong, v)
    }
    val got = graft.ops.Anomaly.threeSigmaOutliers(
      rows.toDF("g", "id", "v"), Seq("g"), "id", "v")
      .collect().map(r => r.getLong(1)).toSet
    val expect = rows.groupBy(_._1).flatMap { case (_, xs) =>
      val n = xs.size.toDouble
      val mean = xs.map(_._3).sum / n
      val variance = xs.map(x => (x._3 - mean) * (x._3 - mean)).sum / n
      xs.filter(x => (x._3 - mean) * (x._3 - mean) > 9 * variance).map(_._2)
    }.toSet
    assert(got == expect && got.nonEmpty)
  }

  // ---- Count-min sketch ----------------------------------------------------

  test("cms estimates are one-sided (est >= exact) and conserve row totals") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val values = (1 to 400).map(_ => rnd.nextInt(100).toLong) // 100 distinct hashes
    val df = values.map(v => Tuple1(v)).toDF("h")
    val exact = values.groupBy(identity).map { case (h, xs) => (h, xs.size.toLong) }
    val probes = exact.toSeq.toDF("h", "exact_cnt")
    val est = Sketch.cmsEstimate(Sketch.cmsCells(df, "h"), probes, "h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(est.length == exact.size)
    est.foreach { case (h, ex, e) => assert(e >= ex, s"h=$h est $e < exact $ex") }
    // total over any one sketch row conserves the input multiset size
    val rowTotals = Sketch.cmsCells(df, "h").groupBy("i")
      .agg(sum("c")).collect().map(_.getLong(1))
    assert(rowTotals.toSeq == Seq.fill(Sketch.CmsParams.size)(values.size.toLong))
  }

  // ---- latest-wins upsert --------------------------------------------------

  test("latestWins: updates beat base on order ties, base survives alone") {
    import spark.implicits._
    val base = Seq((1L, 10L, 100L, 111L), (2L, 20L, 200L, 222L), (3L, 5L, 300L, 333L))
      .toDF("k", "ts", "id", "v")
    val upd = Seq((1L, 10L, 100L, 999L), (2L, 25L, 201L, 444L))
      .toDF("k", "ts", "id", "v")
    val got = graft.ops.Upsert.latestWins(base, upd, Seq("k"), Seq("ts", "id"), Seq("v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      (1L, 10L, 100L, 999L, 1), // exact (ts,id) tie: the update wins
      (2L, 25L, 201L, 444L, 1), // newer update wins
      (3L, 5L, 300L, 333L, 0))) // no update: base survives
  }

  // ---- label affinity ------------------------------------------------------

  test("labelAffinity matches a sequential integer replica") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val rows = (1 to 120).map { i =>
      (i % 4, Array.fill(8)((rnd.nextDouble() - 0.5).toFloat))
    }
    val got = graft.sim.Clustering.labelAffinity(
        rows.toDF("label", "embedding"), "label", "embedding")
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val sums = rows.groupBy(_._1).view.mapValues { xs =>
      (xs.size.toLong, (0 until 8).map(d =>
        xs.map(x => math.floor(x._2(d).toDouble * 1e6).toLong).sum))
    }.toMap
    val expect = (for {
      a <- sums.keys; b <- sums.keys if a < b
    } yield ((a, b), (sums(a)._1, sums(b)._1,
      (0 until 8).map(d => sums(a)._2(d) * sums(b)._2(d)).sum))).toMap
    assert(got == expect)
  }

  // ---- Bloom pre-filter ----------------------------------------------------

  test("bloom probe: no false negatives, false positives possible") {
    import spark.implicits._
    import graft.ops.Bloom
    val rnd = new scala.util.Random(59)
    val members = (1 to 1500).map(_ => rnd.nextInt(1000000).toLong).distinct
    val nonMembers = (1 to 1500).map(_ => 2000000L + rnd.nextInt(1000000)).distinct
    val build = members.map(Tuple1(_)).toDF("k")
    val probes = (members ++ nonMembers).map(Tuple1(_)).toDF("k")
    val out = Bloom.bloomProbe(probes, Bloom.bloomBits(build, "k"), "k")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val memberSet = members.toSet
    // one-sided: every true member must pass
    memberSet.foreach(m => assert(out(m) == 1, s"false negative for $m"))
    // at ~37% load some non-members must slip through, but far from all
    val fp = nonMembers.count(out(_) == 1)
    assert(fp > 0 && fp < nonMembers.size / 2, s"fp=$fp of ${nonMembers.size}")
  }

  // ---- Packing.chunkDupStats ----------------------------------------------

  test("chunkDupStats flags cross-doc spans, ignores within-doc repeats") {
    import spark.implicits._
    val chunks = Seq(
      (1L, 100L), (1L, 200L), (1L, 100L), // fp 100 repeats WITHIN doc 1 only
      (2L, 300L), (2L, 400L),
      (3L, 400L), (3L, 500L)              // fp 400 shared across docs 2,3
    ).toDF("doc_id", "chunk_fp")
    val out = Packing.chunkDupStats(chunks).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, 0L),
      (2L, 2L, 1L, 500L),
      (3L, 2L, 1L, 500L)))
  }

  test("HLL rollup: per-source registers merged by max == registers built globally") {
    import graft.text.TextOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(col("source"),
        explode(TextOps.tokensCol(col("text"))).as("tok"))
      .select(col("source"), TextOps.fingerprint(col("tok")).as("h"))
    val merged = Sketch.hllRegisters(toks, Seq("source"), "h")
      .groupBy("bucket").agg(max("max_rho").as("max_rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val direct = Sketch.hllRegisters(toks.select("h"), Seq.empty, "h")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == direct, "per-bucket max merge must be lossless")
    // and the estimate OF the merged registers equals the estimate built
    // in one pass over the union — rollup loses nothing downstream either
    // (raw-estimate ACCURACY at small n is covered by the dedicated
    // 20%-bound test on a large-cardinality set; this corpus's vocabulary
    // is tiny, where raw HLL is legitimately biased high)
    val viaMerge = Sketch.hllEstimate(
        Sketch.hllRegisters(toks, Seq("source"), "h")
          .groupBy("bucket").agg(max("max_rho").as("max_rho")), Seq.empty)
      .collect().head.getAs[Long]("est_milli")
    val viaUnion = Sketch.hllEstimate(
        Sketch.hllRegisters(toks.select("h"), Seq.empty, "h"), Seq.empty)
      .collect().head.getAs[Long]("est_milli")
    assert(viaMerge == viaUnion, "rollup estimate must equal one-pass estimate")
  }
}
