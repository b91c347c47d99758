package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Cluster-consistent train/test split: rows carry a `componentCol` label
    * (e.g. a near-dup component from `ConnectedComponents`), and the split
    * bucket is a deterministic affine hash of the COMPONENT — so every
    * member of a duplicate cluster lands on the same side. Splitting
    * per-document leaks near-identical text across the train/eval boundary
    * (the classic contamination bug); splitting per-component is the guard.
    * The affine step ((c mod p)·a + b mod p, p = 2³¹−1) decorrelates the
    * bucket from raw id order so consecutive components don't stripe;
    * reducing BEFORE the multiply keeps the product < 2^62 for any long id.
    */
  def clusterSafeSplit(labeled: DataFrame, componentCol: String,
      trainPermille: Int): DataFrame = {
    val p = 2147483647L
    val (a, b) = (1373158607L, 239081663L)
    labeled
      .withColumn("split_bucket",
        pmod(pmod(col(componentCol).cast("long"), lit(p)) * a + b, lit(p)) % 1000)
      .withColumn("split",
        when(col("split_bucket") < trainPermille, "train").otherwise("test"))
  }

  /** Deterministic weighted bottom-k sample (the hash-analog of A-Res
    * weighted reservoir sampling): each row gets the integer priority
    *
    *   priority = (fingerprint(text) mod 10^6) · 1000  div  max(weight, 1)
    *
    * and the global k lowest priorities win — heavier rows draw
    * proportionally smaller priorities, so inclusion probability scales with
    * weight, yet the draw is a pure function of content (reproducible across
    * re-runs and re-partitionings, like [[stratifiedContentSample]]).
    *
    * Scale design: orderBy(...).limit(k) compiles to TakeOrderedAndProject —
    * each partition keeps its local top-k heap and only k·partitions rows
    * ever move, never a global sort. Ties break on (priority, id): fully
    * deterministic, fully oracle-checkable (ORDER BY ... LIMIT k in SQL).
    */
  def weightedPrioritySample(df: DataFrame, idCol: String, textCol: String,
      weight: Column, k: Int): DataFrame =
    df.select(col(idCol), weight.cast("long").as("weight"),
        // (fp mod 1e6)·1000 < 1e9 — far from the long boundary
        (pmod(TextOps.fingerprint(col(textCol)), lit(1000000L)) * 1000L).as("_num"))
      .withColumn("priority", expr("_num div greatest(weight, 1L)"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
      .select(col(idCol), col("weight"), col("priority"))

  /** Per-stratum variant of [[weightedPrioritySample]]: the k lowest
    * priorities WITHIN each stratum win — equal representation however
    * skewed the strata sizes (the global bottom-k would let a dominant
    * stratum crowd the others out). One shuffle partitioning by stratum;
    * the rank evaluates inside that partition and only k·|strata| rows
    * survive. Same content-keyed priority, so the two samplers agree on
    * what "priority" means and differ only in scope.
    */
  def stratifiedPrioritySample(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, weight: Column, kPerStratum: Int): DataFrame = {
    val w = Window.partitionBy("stratum").orderBy(col("priority"), col(idCol))
    df.select(col(strataCol).as("stratum"), col(idCol),
        weight.cast("long").as("weight"),
        (pmod(TextOps.fingerprint(col(textCol)), lit(1000000L)) * 1000L).as("_num"))
      .withColumn("priority", expr("_num div greatest(weight, 1L)"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= kPerStratum)
      .select(col("stratum"), col(idCol), col("weight"), col("priority"))
  }
}
