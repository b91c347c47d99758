package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k as a mergeable aggregate — the scale-safe replacement for
  * `row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id)`.
  *
  * The window formulation gathers EVERY candidate of a query into one
  * partition and sorts it: at 100× corpus that single sort is the straggler
  * (the one plan ceiling flagged in round 5). This aggregator keeps a
  * k-bounded best-first list as its buffer, so partial (map-side)
  * aggregation reduces each input partition to at most k entries per query
  * BEFORE the shuffle — only k·partitions rows per query ever move, and the
  * final merge is O(k log k) per query regardless of corpus size.
  *
  * Determinism contract (identical to the window it replaces): order by
  * (score DESC, id ASC) with scores pre-rounded by the caller (6dp), so the
  * emitted ranks are bitwise those of `row_number` — reduce/merge order
  * cannot matter because the comparator is a total order over distinct ids.
  */
object TopK {

  final case class Scored(score: Double, id: Long)
  final case class TopBuf(items: Seq[Scored])

  /** best-first: higher score wins, lower id breaks ties. */
  private def beats(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def sortedK(xs: Seq[Scored], k: Int): Seq[Scored] =
    xs.sortWith(beats).take(k)

  def byScore(k: Int): Aggregator[Scored, TopBuf, TopBuf] =
    new Aggregator[Scored, TopBuf, TopBuf] {
      override def zero: TopBuf = TopBuf(Vector.empty)
      override def reduce(b: TopBuf, a: Scored): TopBuf =
        // steady-state fast path: a full buffer rejects a non-improving row
        // in O(1) — the sort only runs on the (rare) accepted inserts
        if (b.items.length >= k && !beats(a, b.items.last)) b
        else TopBuf(sortedK(a +: b.items, k))
      override def merge(a: TopBuf, b: TopBuf): TopBuf =
        TopBuf(sortedK(a.items ++ b.items, k))
      override def finish(b: TopBuf): TopBuf = b
      override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
      override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    }

  /** Rank `scored` (columns: query_id, cand_id, `scoreName`) to the top k
    * rows per query_id, emitting (query_id, cand_id, `scoreName`, rank) —
    * the same output contract as the window path, minus the per-query sort.
    */
  def rankTopK(scored: DataFrame, scoreName: String, k: Int): DataFrame = {
    val agg = udaf(byScore(k), Encoders.product[Scored])
    scored.groupBy("query_id")
      .agg(agg(col(scoreName), col("cand_id").cast("long")).as("_top"))
      .select(col("query_id"), posexplode(col("_top.items")))
      .select(col("query_id"), col("col.id").as("cand_id"),
        col("col.score").as(scoreName), (col("pos") + 1).as("rank"))
  }
}
