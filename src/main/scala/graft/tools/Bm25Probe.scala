package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Dev probe (r15): how many times does bm25TopK actually scan + tokenize
  * the corpus at runtime (the initial plan shows 5-6 scan subtrees; AQE's
  * stage cache may dedupe some), and does deriving doc length from the tf
  * aggregate (dl = Σ tf — one corpus pass feeds everything) win? A
  * bytes-read listener attributes input volume per variant; outputs are
  * equality-checked. Usage: runMain graft.Bm25Probe [reps]
  */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bytesRead = new AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
      })

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val maxDoc = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1L
    val dDir = "target/probe_documents_100x"
    docs.withColumn("rep", explode(expr("sequence(0L, 99L)")))
      .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc)
      .drop("rep")
      .write.mode("overwrite").parquet(dDir)
    val d10 = spark.read.parquet(dDir).where(col("doc_id") < maxDoc * 10L)
    val probe = col("doc_id") < maxDoc && col("doc_id") % 50 === 0

    /** Shipped shape with dl/stats derived from the single tf aggregate
      * (dl = Σ tf per doc — same long), so one corpus scan+tokenize pass
      * feeds tf, dl, dfreq and stats.
      */
    def bm25TfDerived(docs: DataFrame, idCol: String, textCol: String,
        probeFilter: Column, k: Int): DataFrame = {
      val saltRowsPerShard = 1L << 20
      val toks = docs.select(col(idCol).as("doc_id"),
        explode(graft.text.TextOps.tokensCol(col(textCol))).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        expr("(sum(dl) * 1000) div count(1)").as("avg_milli"))
      val shardsOf = expr(
        s"(df + ${saltRowsPerShard - 1}L) div ${saltRowsPerShard}L")
      val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        .select(col("tok"), col("df"),
          greatest(lit(1L), shardsOf).as("shards"))
      val joined = tf.join(dl, "doc_id")
        .join(dfreq, "tok")
        .crossJoin(broadcast(stats))
      val post = joined
        .select(col("doc_id"), col("tok"),
          pmod(hash(col("doc_id")).cast("long"), col("shards")).as("salt"),
          expr("""(cast(length(bin(n_docs div df)) as bigint) * tf * 2200 * 1000)
                 | div (tf * 1000 + 300 +
                 |      (900 * ((dl * 1000000) div avg_milli)) div 1000)"""
            .stripMargin).as("c_milli"))
      val qterms = docs.where(probeFilter)
        .select(col(idCol).as("query_id"),
          explode(graft.text.TextOps.tokensCol(col(textCol))).as("tok"))
        .distinct()
        .join(dfreq, "tok")
        .select(col("query_id"), col("tok"),
          explode(sequence(lit(0L), col("shards") - 1)).as("salt"))
      val scored = qterms.join(post, Seq("tok", "salt"))
        .select(col("query_id"), col("doc_id").as("cand_id"), col("c_milli"))
        .groupBy("query_id", "cand_id")
        .agg(sum("c_milli").as("score_milli"))
        .select(col("query_id"), col("cand_id"),
          col("score_milli").cast("double").as("score"))
      graft.sim.TopK.rankTopK(scored, "score", k)
        .select(col("query_id"), col("cand_id"),
          col("score").cast("long").as("score_milli"), col("rank"))
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def shipped() = graft.text.Index.bm25TopK(d10, "doc_id", "text", probe, 5)
    def derived() = bm25TfDerived(d10, "doc_id", "text", probe, 5)

    // equality first
    val diff = shipped().exceptAll(derived()).count() +
      derived().exceptAll(shipped()).count()
    println(s"[bprobe] diff rows = $diff")

    noop(shipped()); noop(derived()) // warmup
    (1 to reps).foreach { i =>
      bytesRead.set(0)
      val a = time(noop(shipped())); Thread.sleep(300)
      val ga = bytesRead.get / 1e9
      bytesRead.set(0)
      val b = time(noop(derived())); Thread.sleep(300)
      val gb = bytesRead.get / 1e9
      println(f"[bprobe] rep $i shipped=$a%6.2f s ($ga%.2f GB read)  " +
        f"tfDerived=$b%6.2f s ($gb%.2f GB read)")
    }
    scala.reflect.io.Directory(new java.io.File(dDir)).deleteRecursively()
    spark.stop()
  }
}
