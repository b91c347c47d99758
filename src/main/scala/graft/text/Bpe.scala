package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING — the full iterative merge loop
  * (q79 counts one round's pairs; this runs the algorithm). Sennrich et
  * al. 2016 subword-units shape: start from characters, repeatedly merge
  * the most frequent adjacent symbol pair, left-to-right with overlap
  * resolution (in "aaa" the pair (a,a) merges once, not twice).
  *
  * Scale design (the reason BPE training is cheap at 100 TB): the corpus
  * is touched ONCE — a word-frequency aggregate (map-side combinable,
  * shuffle keyed by word). Every merge round then runs on the DISTINCT-WORD
  * vocabulary (≪ corpus; bounded by type count, not token count), as
  * DataFrame ops: pair counting is an explode + groupBy over the vocab,
  * the argmax is a 1-row aggregate broadcast back, and the merge itself is
  * a per-word `aggregate` HOF fold — no driver-side loop ever holds the
  * vocabulary. `localCheckpoint` truncates the per-round lineage so round
  * N's plan does not replay rounds 0..N−1.
  *
  * Integer contract: counts are exact longs; the argmax tie-break is
  * (count DESC, pair lexicographic) — binary string order, identical in
  * Spark (UTF8Binary) and DuckDB. The per-round positional dump lets the
  * oracle re-derive BOTH the selection (argmax over the dumped symbols)
  * and the application (merge count via candidate-chain parity: a chain of
  * L consecutive candidate positions yields ceil(L/2) merges — provably
  * equal to the left-to-right fold) from the same rows Spark used.
  *
  * Reference anchor: none — engine addition in the training-data-pipeline
  * class (SURVEY §3.4), the tokenizer-training counterpart of the q79 pair
  * census.
  */
object Bpe {

  /** Train `rounds` BPE merges over the corpus. Returns one row per round:
    * (`round`, `pa`, `pb`, `cnt`, `n_tokens_after`) — the merged pair, its
    * weighted frequency at selection time, and the corpus token count after
    * applying it. When `dumpDir` is set, round r's pre-merge vocabulary is
    * dumped positionally to `dumpDir/r{r}` as (w, cnt, pos, sym) for the
    * cross-engine oracle. Stops early if no pair remains (every word fused
    * to a single symbol).
    */
  def train(spark: SparkSession, df: DataFrame, textCol: String, rounds: Int,
      dumpDir: Option[String] = None): DataFrame =
    run(spark, df, textCol, rounds, dumpDir)._1

  /** The trained segmentation: the post-merge vocabulary (`w`, `cnt`,
    * `syms`) after `rounds` merges — the artifact `encode` applies. When
    * `dumpDir` is set, it is also dumped positionally to `dumpDir/final`
    * so the oracle can cross-derive any encode census from the same rows.
    */
  def trainedVocab(spark: SparkSession, df: DataFrame, textCol: String,
      rounds: Int, dumpDir: Option[String] = None): DataFrame =
    run(spark, df, textCol, rounds, dumpDir)._2

  /** Encode a corpus with a trained vocabulary: every token occurrence is
    * replaced by its trained subword segmentation. Returns one row per
    * (document, position, symbol). The vocabulary is distinct-word-sized,
    * so the join broadcasts while it fits (AQE decides — no forced hint,
    * the BM25 `dfreq` discipline); the corpus side never shuffles.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("tok_pos", "w")))
      .where(col("w") =!= "")
      .join(vocab.select(col("w"), col("syms")), "w")
      .select(col("doc_id"), col("tok_pos"), col("w"),
        posexplode(col("syms")).as(Seq("sym_pos", "sym")))

  private def run(spark: SparkSession, df: DataFrame, textCol: String,
      rounds: Int, dumpDir: Option[String]): (DataFrame, DataFrame) = {
    require(rounds >= 1, "rounds must be >= 1")
    val words = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    var vocab = words
      .withColumn("syms", expr("filter(split(w, ''), c -> c <> '')"))
      .localCheckpoint(false)

    var roundRows = Vector.empty[DataFrame]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      dumpDir.foreach { dd =>
        vocab.select(col("w"), col("cnt"),
            posexplode(col("syms")).as(Seq("pos", "sym")))
          .write.mode("overwrite").parquet(s"$dd/r$r")
      }
      val pairs = vocab
        .select(col("cnt"), explode(expr(
          """case when size(syms) >= 2
            |  then transform(sequence(0, size(syms) - 2),
            |         i -> named_struct('pa', syms[i], 'pb', syms[i + 1]))
            |  else cast(array() as array<struct<pa:string,pb:string>>)
            |end""".stripMargin)).as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum("cnt").as("cnt"))
      // the argmax is ONE bounded row; materializing it here is the same
      // size class as a bench scalar, not a collect-the-data antipattern
      val top = pairs.orderBy(col("cnt").desc, col("pa").asc, col("pb").asc)
        .limit(1).localCheckpoint(false)
      if (top.isEmpty) { exhausted = true }
      else {
        val merged = vocab.crossJoin(broadcast(top.select(
            col("pa").as("_pa"), col("pb").as("_pb"))))
          .select(col("w"), col("cnt"), expr(
            // left-to-right fold with a one-symbol carry: merge consumes the
            // carry, so an overlapping second candidate ("aaa") cannot fire
            """aggregate(
              |  syms,
              |  named_struct('acc', cast(array() as array<string>),
              |               'carry', cast(null as string)),
              |  (s, x) -> case
              |    when s.carry is null
              |      then named_struct('acc', s.acc, 'carry', x)
              |    when s.carry = _pa and x = _pb
              |      then named_struct('acc', array_append(s.acc, concat(_pa, _pb)),
              |                        'carry', cast(null as string))
              |    else named_struct('acc', array_append(s.acc, s.carry), 'carry', x)
              |  end,
              |  s -> case when s.carry is null then s.acc
              |            else array_append(s.acc, s.carry) end)""".stripMargin)
            .as("syms"))
          .localCheckpoint(false)
        val after = merged.agg(
          sum(col("cnt") * size(col("syms"))).as("n_tokens_after"))
        roundRows :+= top.select(lit(r.toLong).as("round"), col("pa"),
          col("pb"), col("cnt")).crossJoin(broadcast(after))
        vocab = merged
        r += 1
      }
    }
    dumpDir.foreach { dd =>
      vocab.select(col("w"), col("cnt"),
          posexplode(col("syms")).as(Seq("pos", "sym")))
        .write.mode("overwrite").parquet(s"$dd/final")
    }
    val roundsDf =
      if (roundRows.isEmpty)
        spark.range(0).select(col("id").as("round"),
          lit("").as("pa"), lit("").as("pb"), col("id").as("cnt"),
          col("id").as("n_tokens_after"))
      else roundRows.reduce(_ union _).orderBy("round")
    (roundsDf, vocab)
  }
}
