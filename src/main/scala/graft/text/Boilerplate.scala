package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Template / boilerplate stripping by corpus-frequent n-grams — the
  * positional-phrase form of CCNet's common-line removal, adapted to
  * line-less text: an n-gram that appears in more than `permille`/1000 of
  * all documents is template material (navigation chrome, license blurbs,
  * generated scaffolding), and every token position covered by at least one
  * such gram is dropped from the retained view of the document.
  *
  * Integer contract: the threshold is compared as `df · 1000 ≥ n_docs ·
  * permille` (no ratio double crosses an engine boundary), and the output
  * is per-document token COUNTS (total / covered / retained), not rewritten
  * text — downstream consumers decide whether to materialize the stripped
  * string.
  *
  * Scale design (100 TB corpus):
  *  - the gram document-frequency pass is distinct-per-(gram,doc) then
  *    count — both map-side combinable; no collect_list ever holds a
  *    posting.
  *  - the boilerplate gram set is tiny BY CONSTRUCTION (only grams in
  *    ≥ permille/1000 of docs survive: at most 1000/permille · n-gram-
  *    per-doc-average distinct values), so the coverage pass is one
  *    equi-join of positional grams against that small set — AQE picks
  *    broadcast while it fits, exactly the BM25 `dfreq` discipline
  *    (`Index.scala`). No forced hint.
  *  - covered-position dedup (a token under two overlapping template grams
  *    counts once) shuffles (doc_id, pos) pairs bounded by n · matched
  *    grams, keyed by doc — no skew: a doc contributes at most its own
  *    length.
  *
  * Reference anchor: the reference has no corpus-curation layer; this is an
  * engine addition in the training-data-pipeline class (SURVEY §3.4), next
  * to the Gopher repetition filter (`TextOps.repetitionCounts`).
  */
object Boilerplate {

  /** Per-document boilerplate coverage: (`idCol`, `n_tokens`, `n_covered`,
    * `n_retained`). `n` = gram size, `permille` = document-frequency
    * threshold in 1/1000 of corpus size.
    */
  def coverage(df: DataFrame, idCol: String, textCol: String, n: Int,
      permille: Long): DataFrame = {
    require(n >= 1 && permille >= 1 && permille <= 1000)
    val docs = df.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val pg = docs
      .select(col("doc_id"),
        posexplode(TextOps.shinglesAll(col("text"), n)).as(Seq("pos", "gram")))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // df per gram (distinct docs), thresholded against the corpus size —
    // the surviving set is small by construction (see scaladoc)
    val boiler = pg.select("doc_id", "gram").distinct()
      .groupBy("gram").agg(count(lit(1)).as("gdf"))
      .crossJoin(broadcast(nDocs))
      .where(col("gdf") * 1000 >= col("n_docs") * permille)
      .select("gram")
    // token positions covered by ≥1 template gram, deduped per doc
    val covered = pg.join(boiler, "gram")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("tokpos"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_covered"))
    docs
      .select(col("doc_id"),
        size(TextOps.tokensCol(col("text"))).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol),
        col("n_tokens"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        (col("n_tokens") - coalesce(col("n_covered"), lit(0L)))
          .as("n_retained"))
  }
}
