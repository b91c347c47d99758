package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r15): qualityScore's stopword count rides a `filter` HOF —
  * a CodegenFallback that knocks the projection out of whole-stage codegen.
  * Candidate: count stopword tokens with pure string arithmetic (double the
  * spaces so token matches never share a delimiter, then count " w "
  * occurrences by length delta per stopword) and the token count as the
  * space count + 1 — every expression codegen'd, the split retained only
  * for the type-token ratio. Interleaved A/B over the 100x corpus + a
  * bitwise equality check including adversarial edge rows.
  * Usage: runMain graft.QualityProbe2 [reps]
  */
object QualityProbe2 {
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
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val maxDoc = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1L
    val d100 = docs.withColumn("rep", explode(expr("sequence(0L, 99L)")))
      .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc)
      .drop("rep").localCheckpoint(true)

    val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on",
      "for", "with")
    def fast(df: DataFrame, textCol: String = "text"): DataFrame = {
      val t = col(textCol)
      // token count without the array: segments = spaces + 1
      val nTok = length(t) - length(replace(t, lit(" "), lit(""))) + 1
      // double the delimiters so adjacent stopword tokens never compete
      // for a shared space, then count " w " by length delta
      val padded = concat(lit(" "), replace(t, lit(" "), lit("  ")), lit(" "))
      val nStop = Stopwords.map { w =>
        val pat = s" $w "
        (length(padded) - length(replace(padded, lit(pat), lit(""))))
          .divide(lit(pat.length)).cast("int")
      }.reduce(_ + _)
      val toks = split(t, " ")
      df.withColumn("n_chars_m", length(t))
        .withColumn("n_tokens", nTok)
        .withColumn("mean_token_len",
          round((length(t) - nTok + 1).cast("double") / nTok, 6))
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
    noop(fast(d100)); noop(graft.text.TextOps.qualityScore(d100))
    (1 to reps).foreach { i =>
      val a = t(noop(graft.text.TextOps.qualityScore(d100)))
      val b = t(noop(fast(d100)))
      println(f"[qprobe2] rep $i shipped=$a%.2f s  fast=$b%.2f s")
    }
    // bitwise equality over the full corpus + adversarial edges
    val diff = graft.text.TextOps.qualityScore(d100)
      .exceptAll(fast(d100)).count() +
      fast(d100).exceptAll(graft.text.TextOps.qualityScore(d100)).count()
    println(s"[qprobe2] corpus diff rows = $diff")
    val edge = Seq(
      (1L, "the the the"), (2L, "a"), (3L, ""), (4L, " "),
      (5L, "  double  spaces  a  "), (6L, "athe thea th e"),
      (7L, "of of of of"), (8L, "x"), (9L, "with a of to in"),
      (10L, "the"), (11L, " the"), (12L, "the "), (13L, "a a"),
      (14L, "tototo to toto"), (15L, "THE A OF"))
      .toDF("doc_id", "text")
    val de = graft.text.TextOps.qualityScore(edge).exceptAll(fast(edge))
      .count() + fast(edge).exceptAll(
        graft.text.TextOps.qualityScore(edge)).count()
    println(s"[qprobe2] edge diff rows = $de")
    spark.stop()
  }
}
