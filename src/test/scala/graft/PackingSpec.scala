package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Packing

class PackingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("placement matches the hand-computed concat-and-chunk layout") {
    import spark.implicits._
    // one shard; token counts 3,5,4 with ctx=4:
    // stream offsets [0,3) [3,8) [8,12) → seqs 0 | 0-1 | 2
    val df = Seq((0L, doc(3)), (1L, doc(5)), (2L, doc(4))).toDF("doc_id", "text")
    val got = Packing.packPlacement(df, "doc_id", "text", ctxLen = 4, nShards = 1)
      .orderBy("doc_id")
      .select("tok_start", "first_seq", "last_seq", "n_seqs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 0L, 0L, 1L), (3L, 0L, 1L, 2L), (8L, 2L, 2L, 1L)))
  }

  test("placement is invariant under input repartitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val a = Packing.packPlacement(docs, "doc_id", "text", 256, 8)
      .collect().map(_.toSeq).toSet
    val b = Packing.packPlacement(docs.repartition(23), "doc_id", "text", 256, 8)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("chunking matches the hand-computed overlapping windows") {
    import spark.implicits._
    // 10 distinct tokens, chunk=4, stride=3 → starts 0,3,6,9:
    // [t0..t3] [t3..t6] [t6..t9] [t9]
    val words = (0 until 10).map(i => s"t$i")
    val df = Seq((7L, words.mkString(" "))).toDF("doc_id", "text")
    val got = Packing.chunkDocs(df, "doc_id", "text", chunkTokens = 4, strideTokens = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "n_chunk_tokens")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq((0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1)))
    // chunk fingerprints equal the fingerprints of the expected substrings
    val expFp = Seq(words.slice(0, 4), words.slice(3, 7), words.slice(6, 10),
      words.slice(9, 10)).map(_.mkString(" "))
    val gotFp = Packing.chunkDocs(df, "doc_id", "text", 4, 3)
      .orderBy("chunk_idx").select("chunk_fp").collect().map(_.getLong(0)).toSeq
    val refFp = expFp.toDF("s")
      .select(graft.text.TextOps.fingerprint(col("s"))).collect().map(_.getLong(0)).toSeq
    assert(gotFp == refFp)
  }

  test("tokens are conserved and sequence stats cover the stream contiguously") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val p = Packing.packPlacement(docs, "doc_id", "text", 256, 8).cache()
    // per shard: the last doc's tok_end equals the shard's total token count
    val bad = p.groupBy("shard")
      .agg(max(col("tok_start") + col("n_tokens")).as("stream_end"),
           sum("n_tokens").as("total"))
      .where(col("stream_end") =!= col("total")).count()
    assert(bad == 0)
    // sequence stats: every doc lands in Σ n_seqs slots, and each shard's
    // sequence indices are exactly 0..(total-1)/ctx with no holes
    val stats = Packing.sequenceStats(p).cache()
    val nDocSlots = stats.agg(sum("n_docs")).head().getLong(0)
    val nSeqSpans = p.agg(sum("n_seqs")).head().getLong(0)
    assert(nDocSlots == nSeqSpans)
    val holes = stats.groupBy("shard")
      .agg(count(lit(1)).as("n_seqs_present"), max("seq_idx").as("max_idx"))
      .where(col("n_seqs_present") =!= col("max_idx") + 1).count()
    assert(holes == 0)
    p.unpersist(); stats.unpersist()
  }
}
