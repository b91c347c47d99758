package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filter (Bloom 1970) with a RELATIONAL bit-set contract:
  * the filter is the distinct set of set-bit indices — ≤ m rows no matter
  * how large the build side — broadcast to the probe side, where a key
  * "passes" iff all k of its bits are present. One-sided: every true member
  * passes; non-members pass with the classic false-positive rate, which the
  * probe output exposes next to exact membership.
  *
  * The relational bit-set (instead of a packed byte-array sketch) is what
  * makes the operator expressible in ANSI SQL for the oracle AND keeps the
  * build a plain distinct-aggregate: map-side partial distinct, ≤ m rows
  * shuffled, associative merge — the same properties a packed
  * `spark.util.sketch.BloomFilter` has, minus the opaque binary format. A
  * production variant packs these indices into m/64 longs at the driver;
  * the decision semantics are identical.
  *
  * Hash family: the [[Sketch.CmsParams]] affine rows over 2^31−1, reduced
  * mod [[BloomBits]] — fixed literals, mirrored into the oracle.
  */
object Bloom {

  val BloomBits: Int = 8192
  /** k = 2 affine hash rows (the first two CMS rows). */
  val Hashes: Seq[(Long, Long)] = Sketch.CmsParams.take(2)

  private def bitCols(key: Column): Seq[Column] =
    Hashes.map { case (a, b) => (key.cast("long") * a + b) % 2147483647L % BloomBits }

  /** The filter: distinct set-bit indices of the build side's keys. */
  def bloomBits(build: DataFrame, keyCol: String): DataFrame =
    build.select(explode(array(bitCols(col(keyCol)): _*)).as("bit")).distinct()

  /** Prune `fact` rows to those whose key passes the filter WITHOUT a
    * per-key aggregate: one broadcast inner equi-join per hash row (k
    * joins, each against the ≤ m-row bit set). Row-grain and shuffle-free —
    * the shape that lets a 100 TB fact table drop non-members before the
    * expensive join ships them anywhere. One-sided as always: every true
    * member survives; the residual false positives are eliminated by the
    * real join that follows.
    */
  def bloomPrune(fact: DataFrame, keyCol: String, bits: DataFrame): DataFrame =
    Hashes.zipWithIndex.foldLeft(fact) { case (df, ((a, b), i)) =>
      val bn = s"_bloombit_$i"
      df.join(broadcast(bits.select(col("bit").as(bn))),
        (col(keyCol).cast("long") * a + b) % 2147483647L % BloomBits === col(bn))
        .drop(bn)
    }

  /** Probe decisions: for each distinct probe key, whether it passes the
    * filter (all bits set). Emits (key, bloom_pass) with bloom_pass ∈ {0,1}.
    */
  def bloomProbe(probes: DataFrame, bits: DataFrame, keyCol: String): DataFrame = {
    val k = Hashes.size
    probes.select(col(keyCol)).distinct()
      .select(col(keyCol), posexplode(array(bitCols(col(keyCol)): _*)))
      .withColumnRenamed("col", "bit")
      .join(broadcast(bits.withColumn("_hit", lit(1))), Seq("bit"), "left")
      .groupBy(col(keyCol))
      .agg((sum(coalesce(col("_hit"), lit(0))) === k).cast("int").as("bloom_pass"))
  }
}
