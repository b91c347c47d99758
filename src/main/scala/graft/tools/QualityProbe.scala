package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: interleaved A/B of the qualityScore expression shapes (inline
  * split-per-consumer vs shared token column) over the 100x documents
  * corpus, same JVM, alternating runs — the only measurement that survives
  * this host's contention swings. Usage: runMain graft.QualityProbe [reps]
  */
object QualityProbe {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val maxDoc = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1L
    val d100 = docs.withColumn("rep", explode(expr("sequence(0L, 99L)")))
      .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc)
      .drop("rep").localCheckpoint(true)
    val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on",
      "for", "with")
    def inline(df: DataFrame): DataFrame = { // the pre-r14 shape
      val toks = split(col("text"), " ")
      val nTok = size(toks)
      val stopArr = array(Stopwords.map(lit): _*)
      val nStop = size(filter(toks, t => array_contains(stopArr, t)))
      df.withColumn("n_chars_m", length(col("text")))
        .withColumn("n_tokens", nTok)
        .withColumn("mean_token_len",
          round((length(col("text")) - nTok + 1).cast("double") / nTok, 6))
        .withColumn("stopword_ratio", round(nStop.cast("double") / nTok, 6))
        .withColumn("type_token_ratio",
          round(size(array_distinct(toks)).cast("double") / nTok, 6))
        .withColumn("quality_score",
          round(least(lit(1.0), nTok.cast("double") / 100.0) *
            (lit(1.0) - nStop.cast("double") / nTok), 6))
    }
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // warmup both
    noop(inline(d100)); noop(graft.text.TextOps.qualityScore(d100))
    (1 to reps).foreach { i =>
      val a = t(noop(inline(d100)))
      val b = t(noop(graft.text.TextOps.qualityScore(d100)))
      println(f"[qprobe] rep $i inline=$a%.2f s  shared=$b%.2f s")
    }
    // equality: the two shapes must agree bitwise
    val x = inline(d100).orderBy("doc_id").limit(2000).collect()
    val y = graft.text.TextOps.qualityScore(d100).orderBy("doc_id")
      .limit(2000).collect()
    println(s"[qprobe] equal=${x.sameElements(y)}")
    spark.stop()
  }
}
