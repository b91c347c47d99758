package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + sharding of a training corpus.
  *
  * Before a training run, a corpus must be (a) shuffled so a reader sees a
  * well-mixed stream, and (b) split into shards a data-loader can consume
  * in parallel. Doing this with `ORDER BY rand()` is irreproducible and
  * plans a full global sort; this operator derives both the shard and the
  * intra-shard position from the CONTENT fingerprint, so the layout is a
  * pure function of the data — re-running the job, or running it on a
  * re-partitioned copy, produces byte-identical shards (the same property
  * [[Sampling.stratifiedContentSample]] gives sampling).
  *
  * Scale shape: one hash-partitioned exchange on `shard` plus a per-shard
  * sort (the sort a sharded write needs anyway — each shard is one output
  * unit). Parallelism equals `nShards`, which scales WITH the corpus
  * (a 100 TB corpus takes ~100k shards of ~1 GB, not 32), so no shard ever
  * exceeds a task; there is no global sort and no driver-side state.
  *
  * Reference anchor: the reference enumerates its config grid in fixed
  * order (`helper_funcs` writers); shuffling/sharding is a pipeline op the
  * engine adds for training-data preparation (prompt-mandated surface).
  */
object Shard {

  /** Per-row placement: shard = fingerprint mod nShards, pos = 1-based rank
    * of (fingerprint, id) within the shard. The id tie-break makes the
    * order total even for byte-identical duplicate texts, so the placement
    * is deterministic for any input multiset.
    */
  def shardPlacement(df: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("fp"), col(idCol))
    df.select(col(idCol), col(textCol),
        TextOps.fingerprint(col(textCol)).as("fp"))
      .withColumn("shard", pmod(col("fp"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
  }
}
