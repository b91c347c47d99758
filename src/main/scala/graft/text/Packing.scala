package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concat-and-chunk placement.
  *
  * The standard pretraining layout concatenates documents (in a fixed
  * order) into one token stream and cuts it into fixed-length sequences.
  * The placement of every document — its token offset, and which sequences
  * it lands in — is a per-shard prefix sum: deterministic, integer-only,
  * and embarrassingly parallel ACROSS shards. Real pipelines pack per
  * shard/file for exactly this reason; a single global stream would
  * serialize the whole corpus through one cumulative sum (one partition at
  * 100 TB), while per-shard packing scales the sequential dependency down
  * to shard size and the shard count up with the data.
  *
  * Reference anchor: out of the reference's scope (it emits CSV series) —
  * prompt-mandated pipeline surface ("operations a large-scale
  * training-data pipeline would need").
  */
object Packing {

  /** Per-document placement under concat-and-chunk packing with context
    * length `ctxLen`, sharded by `pmod(id, nShards)`, concatenation order
    * = id order within the shard. Tokens = whitespace tokens (the engine's
    * q09 token contract). Emits doc_id, shard, n_tokens, tok_start (offset
    * of the doc's first token in its shard stream), first_seq/last_seq
    * (sequence indices the doc spans) and n_seqs.
    */
  def packPlacement(df: DataFrame, idCol: String, textCol: String,
      ctxLen: Int, nShards: Int): DataFrame = {
    require(ctxLen > 0 && nShards > 0)
    val w = Window.partitionBy("shard").orderBy("doc_id")
    df.select(col(idCol).cast("long").as("doc_id"),
        pmod(col(idCol), lit(nShards.toLong)).as("shard"),
        size(TextOps.tokensCol(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("tok_end", sum("n_tokens").over(w)) // inclusive prefix sum
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      // integer div, not double `/`: exact at any stream length
      .withColumn("first_seq", expr(s"tok_start div ${ctxLen.toLong}"))
      .withColumn("last_seq", expr(s"(tok_end - 1) div ${ctxLen.toLong}"))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("tok_start"),
        col("first_seq"), col("last_seq"),
        (col("last_seq") - col("first_seq") + 1L).as("n_seqs"))
  }

  /** Per-sequence document counts over a shard's chunked stream — the
    * packing-quality stat an attention-masking step consumes. Computed from
    * placements WITHOUT exploding docs×sequences into token rows: a doc
    * spanning k sequences contributes k rows (first_seq..last_seq), so the
    * explode stays linear in Σ n_seqs (bounded by tokens/ctxLen + docs).
    */
  def sequenceStats(placement: DataFrame): DataFrame =
    placement.select(col("shard"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_idx"))
      .groupBy("shard", "seq_idx").agg(count(lit(1)).as("n_docs"))

  /** Overlapping-window chunking (RAG/embedding-prep shape): one chunk per
    * `strideTokens` offset, `chunkTokens` wide (the tail chunk truncates at
    * the document end). Emits the chunk's position, size, and the
    * rolling-hash fingerprint of its re-joined text — the identity a chunk
    * index stores. Per-row explode, no shuffle; chunk count per doc is
    * ceil(n_tokens / stride), so output size is corpus-linear.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens)
    val toks = TextOps.tokensCol(col(textCol))
    df.select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(strideTokens))).as(Seq("chunk_idx", "start_tok")))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        slice(col("toks"), col("start_tok") + 1, lit(chunkTokens)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("chunk")).as("n_chunk_tokens"),
        TextOps.fingerprint(array_join(col("chunk"), " ")).as("chunk_fp"))
  }

  /** Span-level duplication stats (the detection half of "Deduplicating
    * Training Data Makes Language Models Better", Lee et al. 2022, over
    * fixed windows instead of suffix-array substrings): a chunk is a
    * duplicated span iff its fingerprint occurs in MORE THAN ONE document.
    * Emits per document the chunk count, duplicated-chunk count, and the
    * integer dup rate in permille.
    *
    * Distribution: one groupBy on the 8-byte fingerprint (map-side partial
    * distinct-ish via the (fp, doc) pre-aggregate) + one equi-join back on
    * the fingerprint — no pairwise comparison ever materializes, so cost is
    * linear in total chunks at any corpus size.
    */
  def chunkDupStats(chunks: DataFrame): DataFrame = {
    // collapse repeats of a chunk within one doc first: the wide shuffle
    // carries (fp, doc) once, not once per occurrence
    val perDoc = chunks.groupBy("chunk_fp", "doc_id")
      .agg(count(lit(1)).as("n_occ"))
    val fpDocs = perDoc.groupBy("chunk_fp")
      .agg(count(lit(1)).as("n_docs_with_fp"))
    perDoc.join(fpDocs, "chunk_fp")
      .groupBy("doc_id")
      .agg(sum(col("n_occ")).as("n_chunks"),
        sum(when(col("n_docs_with_fp") > 1, col("n_occ")).otherwise(0L))
          .as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        expr("(n_dup_chunks * 1000) div n_chunks").as("dup_permille"))
  }
}
