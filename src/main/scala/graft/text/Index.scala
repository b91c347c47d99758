package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus indexing statistics: inverted-index postings and vocabulary-growth
  * (Heaps-law) curves.
  *
  * Reference anchor: none — the reference has no text surface; these are the
  * retrieval-side pipeline ops (build a posting sample for inspection,
  * profile vocabulary saturation to size tokenizers) the prompt-mandated
  * training-data surface needs.
  */
object Index {

  /** Mid-frequency inverted-index slice: for every term with
    * df ∈ [minDf, maxDf], emit document frequency, total term frequency,
    * and the first `postingCap` doc ids (ascending) as a comma-joined
    * posting string.
    *
    * Scale design: df is computed FIRST (per-(term,doc) reduce, then
    * per-term count — both map-side combinable), and only surviving terms'
    * rows reach the posting-list collect via a semi-join. head terms (df >
    * maxDf) therefore never enter any collect_list: per-group state is
    * bounded by maxDf regardless of corpus size — the difference between
    * this and "collect then filter" is exactly the difference between
    * bounded and unbounded executor memory at 100 TB.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      minDf: Long, maxDf: Long, postingCap: Int): DataFrame = {
    val perDoc = df.select(col(idCol).cast("long").as("doc_id"),
        explode(TextOps.tokensCol(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val terms = perDoc.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"))
      .where(col("df").between(minDf, maxDf))
    perDoc.join(terms, Seq("term"), "left_semi")
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"),
        array_join(transform(
          slice(sort_array(collect_list(col("doc_id"))), 1, postingCap),
          _.cast("string")), ",").as("postings"))
  }

  /** Heaps-law vocabulary-growth curve: bucket the corpus into `buckets`
    * id-ranges and report, per bucket, cumulative tokens seen and cumulative
    * distinct vocabulary (a term counts in the bucket where it FIRST
    * appears).
    *
    * The bucket is `(doc_id · buckets) div (max_id + 1)` — a deterministic
    * function of the id, NOT of a global sort: no single-partition
    * row_number ever exists, so the curve costs one token explode + two
    * map-side-combinable aggregates at any corpus size. (Bucket populations
    * track the id distribution; for the uniform synthetic ids they are
    * equal-sized.) The final cumulative window runs over `buckets` rows —
    * driver-scale by construction.
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val maxId = df.agg(max(col(idCol).cast("long")).as("_max_id"))
    val bucketed = df.join(broadcast(maxId))
      .select(expr(s"(cast($idCol as bigint) * $buckets) div (_max_id + 1)").as("bucket"),
        col(textCol))
    val toks = bucketed.select(col("bucket"),
      explode(TextOps.tokensCol(col(textCol))).as("term"))
    val perBucket = bucketed.groupBy("bucket").agg(count(lit(1)).as("n_docs"))
    val tokCounts = toks.groupBy("bucket").agg(count(lit(1)).as("n_tokens"))
    val newTerms = toks.groupBy("term").agg(min("bucket").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_terms"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.join(tokCounts, Seq("bucket"), "left")
      .join(newTerms, Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("cum_vocab", sum("new_terms").over(w))
  }
}
