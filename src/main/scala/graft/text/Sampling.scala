package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Both samplers are pure functions of row CONTENT, never of partitioning,
  * task order, or an RNG stream — `df.sample()` is none of those things
  * across retries/re-runs, which is why real corpus pipelines sample by
  * hash. Content-keyed sampling has two properties a 100 TB pipeline needs:
  * reproducibility (re-running the job, or running it on a re-partitioned
  * copy of the corpus, selects the same documents) and dedup-consistency
  * (byte-identical duplicates sample identically, so a sample-then-dedup
  * and dedup-then-sample commute).
  *
  * Reference anchor: the reference takes every config (no sampling); this
  * is a pipeline op the engine adds for corpus curation (SURVEY §3.4 class:
  * "sampling", plus the prompt-mandated pipeline surface).
  */
object Sampling {

  /** Per-stratum deterministic sample: keep a row iff
    * fingerprint(text) mod 1000 < permille(stratum). The 31-polynomial
    * rolling-hash fingerprint (TextOps.fingerprint) is bit-identical in
    * DuckDB, so the selection is fully oracle-checkable. Rates are permille
    * per stratum value, with a default for unlisted strata.
    */
  def stratifiedContentSample(df: DataFrame, textCol: String, strataCol: String,
      permille: Map[String, Int], defaultPermille: Int): DataFrame = {
    val rate = permille.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille): Column) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("sample_bucket", pmod(TextOps.fingerprint(col(textCol)), lit(1000L)))
      .where(col("sample_bucket") < rate)
  }

  /** Scale variant keyed on xxhash64 over arbitrary key columns (plus a salt
    * so independent samples can be decorrelated): one codegen'd expression
    * per row, no string scan. Not SQL-mirrorable (xxhash64 is Spark-
    * specific) — covered by determinism/rate/commutation specs instead of a
    * DuckDB oracle; the oracle-checked contract lives in
    * [[stratifiedContentSample]].
    */
  def hashSample(df: DataFrame, keyCols: Seq[Column], permille: Int,
      salt: Long = 0L): DataFrame =
    df.where(pmod(xxhash64((lit(salt) +: keyCols): _*), lit(1000L)) < lit(permille.toLong))
}
