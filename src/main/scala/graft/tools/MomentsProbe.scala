package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.generate.Generate

/** Dev probe: does structuralBetas' six-lookup shape recompute the
  * fact-scale moment aggregation per lookup, or does AQE's runtime stage
  * cache dedupe the broadcast exchanges? Times, interleaved in one JVM:
  *   A. the sparse moment pass alone (noop)
  *   B. the full bhfdr_catalog body as shipped
  *   C. the body with the moment frame eagerly localCheckpointed
  *      (forced single computation of the moment pass)
  * plus the weightwide dense twin. B ≈ C means AQE already reuses; B ≫ C
  * means the six broadcasts really pay the moment pass repeatedly.
  * Usage: runMain graft.MomentsProbe [reps]
  */
object MomentsProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // ---- bhfdr_catalog fixtures (exactly the bench body) ----
    val cfgsAll = graft.core.Grid.all()
    val wideC = Generate.wideFast(spark, cfgsAll).where(col("t") < 200)
    val virtC = (1 to 8).map { i =>
      val m = floor(greatest(least(col(s"X$i"), lit(1e3)), lit(-1e3))
        * 1000).cast("long").as("v")
      val base = wideC.where(col(s"X$i").isNotNull)
      base.select(concat(col("configId"), lit(s"|X$i@0")).as("vs"),
          (col("configId") * 65536 + col("t")).as("t"), m)
        .unionByName(base.select(
          concat(col("configId"), lit(s"|X$i@1")).as("vs"),
          (col("configId") * 65536 + col("t") + 1).as("t"), m))
    }.reduce(_ unionByName _).localCheckpoint(true)
    val hypsC = cfgsAll.flatMap { c =>
      for { i <- 1 to c.nVars; j <- 1 to c.nVars if i != j } yield {
        val g = c.configId
        (s"$g|X$i>X$j", c.family, s"$g|X$j@0", s"$g|X$i@1",
          None: Option[String])
      }
    }
    val linksC = hypsC.toDF("pair", "family", "y", "x", "sib")
    def cnp(a: String, b: String) = if (a <= b) (a, b) else (b, a)
    val wantedC = hypsC.flatMap { case (_, _, y, x, _) =>
      Seq((y, y), (x, x), cnp(x, y))
    }.distinct.toDF("na", "nb")
    val lutC = graft.metrics.Causal.chi2InvMilliLadder(hypsC.size)
      .zipWithIndex.map { case (q, i) => (i + 1, q) }
      .toDF("rk", "q_milli")
    val predC = (col("t") % 65536).between(1, 199)

    def momentsC() = graft.metrics.Causal.virtualCrossMomentsSparse(
      virtC, wantedC, predC)
    def bhTail(betas: DataFrame): DataFrame =
      graft.metrics.Causal.waldK1(betas)
        .withColumn("rk", expr(
          """row_number() over (
            |  order by coalesce(t2_milli, -1) desc, pair)""".stripMargin))
        .join(broadcast(lutC), Seq("rk"))
        .withColumn("k_star", expr(
          "max(case when t2_milli >= q_milli then rk end) over ()"))
        .where(col("rk") <= coalesce(col("k_star"), lit(0L)))
        .groupBy("family").count()

    // ---- weightwide dense fixtures ----
    val pan = Bench.widePanel(spark, 256, 10000)
    val virtW = pan.select(concat(col("series"), lit("@0")).as("vs"),
      col("day").as("t"), col("v")).localCheckpoint(true)
    def nm(i: Int) = f"X$i%03d"
    val linksW = (1 until 256).map(i => (nm(i), nm(i - 1), 0,
      s"${nm(i)}@0", s"${nm(i - 1)}@0", None: Option[String]))
      .toDF("target", "source", "lag", "y", "x", "sib")
    def momentsW() = graft.metrics.Causal.virtualCrossMoments(
      virtW, col("t").between(0, 9999), broadcastB = false)

    // ---- candidate moment-pass shapes --------------------------------
    import org.apache.spark.sql.Column
    // A2: shuffled-hash instead of sort-merge on the (nb, t) join
    def momentsShj(virt: DataFrame, wanted: DataFrame,
        pred: Column): DataFrame = {
      val v = virt.where(pred)
      val a = v.select(col("vs").as("na"), col("t"), col("v").as("va"))
      val b = v.select(col("vs").as("nb"), col("t"), col("v").as("vb"))
      a.join(broadcast(wanted.select("na", "nb")), Seq("na"))
        .join(b.hint("shuffle_hash"), Seq("nb", "t"))
        .groupBy("na", "nb")
        .agg(count(lit(1)).as("n"),
          sum(col("va")).as("sa"),
          sum(col("vb")).as("sb"),
          sum(col("va") * col("vb")).as("sab"))
        .select(col("na"), col("nb"), col("n"),
          expr("""cast(cast(n as decimal(38,0)) * sab
                 |  - cast(sa as decimal(38,0)) * sb as long)""".stripMargin)
            .as("c"))
    }
    // A3: integer dictionary codes for the join/shuffle keys (§2.3
    // narrower types), decoded back at pair grain after the aggregate
    def momentsDict(virt: DataFrame, wanted: DataFrame,
        pred: Column): DataFrame = {
      val v = virt.where(pred)
      val dict = v.select(col("vs")).distinct()
        .withColumn("code", expr(
          "row_number() over (order by vs)").cast("long"))
      val enc = v.join(broadcast(dict), Seq("vs"))
        .select(col("code"), col("t"), col("v"))
      val wEnc = wanted
        .join(broadcast(dict.select(col("vs").as("na"),
          col("code").as("ca"))), Seq("na"))
        .join(broadcast(dict.select(col("vs").as("nb"),
          col("code").as("cb"))), Seq("nb"))
        .select(col("ca"), col("cb"))
      val a = enc.select(col("code").as("ca"), col("t"),
        col("v").as("va"))
      val b = enc.select(col("code").as("cb"), col("t"),
        col("v").as("vb"))
      a.join(broadcast(wEnc), Seq("ca"))
        .join(b.hint("shuffle_hash"), Seq("cb", "t"))
        .groupBy("ca", "cb")
        .agg(count(lit(1)).as("n"),
          sum(col("va")).as("sa"),
          sum(col("vb")).as("sb"),
          sum(col("va") * col("vb")).as("sab"))
        .join(broadcast(dict.select(col("code").as("ca"),
          col("vs").as("na"))), Seq("ca"))
        .join(broadcast(dict.select(col("code").as("cb"),
          col("vs").as("nb"))), Seq("cb"))
        .select(col("na"), col("nb"), col("n"),
          expr("""cast(cast(n as decimal(38,0)) * sab
                 |  - cast(sa as decimal(38,0)) * sb as long)""".stripMargin)
            .as("c"))
    }
    // B2: structuralBetas with SIX STRUCTURALLY IDENTICAL broadcast
    // subtrees (same 4-column projection, per-call-unique alias names —
    // alias names are erased in canonical plans) so the runtime stage
    // cache collapses them to one moment computation
    def betasReuse(moments: DataFrame, links: DataFrame): DataFrame = {
      val m = moments.select("na", "nb", "n", "c")
      def look(df: DataFrame, k1: String, k2: String, out: String,
          withN: Boolean = false): DataFrame = {
        val (naT, nbT, nT) = (s"_na_$out", s"_nb_$out", s"_n_$out")
        val mi = m.select(col("na").as(naT), col("nb").as(nbT),
          col("n").as(nT), col("c").as(out))
        val j = df.join(broadcast(mi),
          least(col(k1), col(k2)) === col(naT) &&
            greatest(col(k1), col(k2)) === col(nbT), "left")
          .drop(naT, nbT)
        if (withN) j.withColumnRenamed(nT, "n") else j.drop(nT)
      }
      val j = look(look(look(look(look(look(links,
        "y", "y", "cyy", withN = true), "x", "x", "cjj"), "x", "y", "cjy"),
        "sib", "sib", "css"), "x", "sib", "cjs"), "sib", "y", "csy")
      j.withColumn("beta_ppm", expr(
        """case when sib is null then
          |  case when cjj = 0 then 0
          |    else (1000000 * cast(cjy as decimal(38,0))) div cjj end
          |else
          |  case when cast(cjj as decimal(38,0))*css
          |      - cast(cjs as decimal(38,0))*cjs = 0 then 0
          |  else (1000000 * (cast(css as decimal(38,0))*cjy
          |      - cast(cjs as decimal(38,0))*csy))
          |    div (cast(cjj as decimal(38,0))*css
          |      - cast(cjs as decimal(38,0))*cjs) end
          |end""".stripMargin).cast("long"))
    }

    // equality guard: candidate shapes must be bitwise identical
    def assertSame(x: DataFrame, y: DataFrame, tag: String): Unit = {
      val d = x.exceptAll(y).count() + y.exceptAll(x).count()
      require(d == 0, s"$tag differs: $d rows")
      println(s"[probe] $tag outputs identical")
    }
    if (!sys.env.contains("SKIP_EQ")) {
      assertSame(momentsC(),
        momentsShj(virtC, wantedC, predC), "bh shj vs shipped")
      assertSame(momentsC(),
        momentsDict(virtC, wantedC, predC), "bh dict vs shipped")
      assertSame(
        graft.metrics.Causal.structuralBetas(momentsC(), linksC)
          .select("pair", "beta_ppm"),
        betasReuse(momentsC(), linksC).select("pair", "beta_ppm"),
        "bh betasReuse vs shipped")
    }
    // shuffle-bytes listener: the moment pass's fact-scale shuffle is the
    // dominant writer, so total shuffle-write bytes per run directly count
    // how many times the moment subtree really executed
    val shufBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            shufBytes.addAndGet(
              te.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })

    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    def rec(k: String, v: Double): Unit = {
      Thread.sleep(200)
      val gb = shufBytes.getAndSet(0) / 1e9
      out.getOrElseUpdate(k,
        scala.collection.mutable.ArrayBuffer.empty) += v
      println(f"[probe] $k%-28s $v%8.2f s  shuffle=$gb%.2f GB")
    }

    (1 to reps).foreach { _ =>
      rec("bh_A_moments_only", time { noop(momentsC()) })
      rec("bh_A2_moments_shj", time {
        noop(momentsShj(virtC, wantedC, predC)) })
      rec("bh_A3_moments_dict", time {
        noop(momentsDict(virtC, wantedC, predC)) })
      rec("bh_B_full_as_shipped", time { noop(bhTail(
        graft.metrics.Causal.structuralBetas(momentsC(), linksC))) })
      rec("bh_B2_full_reuse", time { noop(bhTail(
        betasReuse(momentsC(), linksC))) })
      rec("bh_B3_reuse_shj", time { noop(bhTail(
        betasReuse(momentsShj(virtC, wantedC, predC), linksC))) })
      rec("ww_A_moments_only", time { noop(momentsW()) })
      rec("ww_B_full_as_shipped", time { noop(
        graft.metrics.Causal.structuralBetas(momentsW(), linksW)
          .agg(sum(abs(col("beta_ppm"))))) })
      rec("ww_B2_full_reuse", time { noop(
        betasReuse(momentsW(), linksW)
          .agg(sum(abs(col("beta_ppm"))))) })
    }
    println("== medians ==")
    out.foreach { case (k, vs) =>
      val s = vs.sorted
      println(f"[probe] $k%-28s median ${s(s.size / 2)}%8.2f  runs ${
        vs.map(v => f"$v%.2f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
