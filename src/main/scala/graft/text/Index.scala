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

  /** BM25 sparse retrieval (k1 = 1.2, b = 0.75), the lexical baseline every
    * retrieval/RAG pipeline starts from — in a PURE-INTEGER contract so two
    * engines agree bitwise:
    *
    *   idf_bl   = bitlen(N div df)           (integer log2, the q188 device)
    *   norm_mi  = (dl·1e6) div avg_milli     (dl/avgdl in milli)
    *   den_mi   = tf·1000 + 300 + (900·norm_mi) div 1000
    *   c_milli  = (idf_bl · tf · 2200 · 1000) div den_mi
    *   score    = Σ over the query's DISTINCT terms of the candidate's
    *              c_milli (k3 = 0: query tf ignored, the standard choice)
    *
    * Scale shape: postings and doc lengths are one map-side-combined
    * aggregate each; corpus stats are scalar and broadcast; the df table is
    * vocab-sized and joined WITHOUT a forced broadcast hint — AQE converts
    * it to broadcast at runtime while it fits and degrades to a shuffle
    * join above the threshold. Query terms meet postings in ONE token
    * equi-join (the inverted-index join — candidates are docs sharing ≥1
    * term, never the full corpus per query); ranking is the k-bounded
    * mergeable aggregate (no per-query window sort).
    *
    * Head-term skew — two independent controls:
    *
    *  1. SALTING (the scale guarantee, always on, score-preserving): the
    *     posting join runs on (tok, salt) where the posting side salts by
    *     `pmod(hash(doc_id), shards)` and the query side fans each term out
    *     to all `shards` replicas; `shards = ceil(df / saltRowsPerShard)`,
    *     per token, from the df table both sides already join. A df=O(N)
    *     token therefore lands on df/saltRowsPerShard shuffle keys of
    *     bounded size instead of one corpus-sized hot partition. Joined
    *     row COUNT is unchanged (each posting row meets exactly the one
    *     query replica with its salt), so scores are bitwise identical to
    *     the unsalted plan. Query-side fan-out is |terms|·shards rows —
    *     negligible against the posting side it de-skews.
    *
    *  2. `maxDfPermille` (a QUALITY/VOLUME policy, default 1000 = off):
    *     prune tokens with df·1000 > permille·n_docs from the posting
    *     table. Their integer idf is floor-trivial (bitlen(N div df) = 1
    *     bit for df > N/2) so scores barely move, and join volume drops by
    *     their corpus-sized posting lists. Deliberately NOT the default:
    *     on a head-heavy vocabulary (the shipped synthetic corpus has 31
    *     tokens, median df = 78% of docs) any cap tight enough to bound
    *     keys empties the ranking — pruning is a relevance policy, salting
    *     is the skew guarantee.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      probeFilter: org.apache.spark.sql.Column, k: Int,
      maxDfPermille: Int = 1000, saltRowsPerShard: Long = 1L << 20)
      : DataFrame = {
    require(saltRowsPerShard > 0, "saltRowsPerShard must be positive")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.tokensCol(col(textCol))).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // doc length = Σ tf (identical long to counting the raw token rows),
    // so ONE corpus tokenize+aggregate pass feeds tf, dl, dfreq AND stats
    // — the r14 shape re-exploded the corpus for dl, paying a second full
    // scan+shuffle that exchange reuse could not dedupe (guide §2.3/§2.4;
    // r15 interleaved medians on the 10x corpus: 13.3 → 5.0 s, outputs
    // bitwise identical)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      expr("(sum(dl) * 1000) div count(1)").as("avg_milli"))
    val shardsOf = expr(
      s"(df + ${saltRowsPerShard - 1}L) div ${saltRowsPerShard}L")
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .select(col("tok"), col("df"), greatest(lit(1L), shardsOf).as("shards"))
    val joined = tf.join(dl, "doc_id")
      .join(dfreq, "tok")
      .crossJoin(broadcast(stats))
    val post = (if (maxDfPermille >= 1000) joined
       else joined.where(col("df") * 1000 <= col("n_docs") * maxDfPermille))
      .select(col("doc_id"), col("tok"),
        pmod(hash(col("doc_id")).cast("long"), col("shards")).as("salt"),
        expr("""(cast(length(bin(n_docs div df)) as bigint) * tf * 2200 * 1000)
               | div (tf * 1000 + 300 +
               |      (900 * ((dl * 1000000) div avg_milli)) div 1000)"""
          .stripMargin).as("c_milli"))
    val qterms = docs.where(probeFilter)
      .select(col(idCol).as("query_id"),
        explode(TextOps.tokensCol(col(textCol))).as("tok"))
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
}
