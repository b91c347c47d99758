package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Hits
import graft.text.{Boilerplate, Bpe}

/** Unit coverage for the round-7 additions: HITS, boilerplate stripping,
  * BPE training. Each checked on hand-computable fixtures, including the
  * semantics corners the oracles exercise only statistically (overlap
  * resolution in BPE, the boilerplate negative control, hub/authority role
  * separation).
  */
class GraphTextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("HITS separates hub from authority roles") {
    import spark.implicits._
    // star: h1 and h2 each point at a1, a2, a3; no edges into h*, none out
    // of a*. Hubs must score hub_micro=1e6-ish and auth 0; sinks inverse
    val edges = Seq(
      ("h1", "a1", 1L), ("h1", "a2", 1L), ("h1", "a3", 1L),
      ("h2", "a1", 1L), ("h2", "a2", 1L), ("h2", "a3", 1L))
      .toDF("src", "dst", "w")
    val out = Hits.scoresMicro(edges, iterations = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (h <- Seq("h1", "h2")) assert(out(h) == (0L, 1000000L), s"$h: ${out(h)}")
    for (a <- Seq("a1", "a2", "a3")) assert(out(a) == (1000000L, 0L), s"$a: ${out(a)}")
  }

  test("HITS weighted asymmetry: the heavier-pointed authority dominates") {
    import spark.implicits._
    val edges = Seq(("u", "x", 3L), ("u", "y", 1L), ("v", "x", 3L))
      .toDF("src", "dst", "w")
    val out = Hits.scoresMicro(edges, iterations = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("x")._1 == 1000000L)          // max authority
    assert(out("y")._1 < out("x")._1 && out("y")._1 > 0)
    assert(out("u")._2 == 1000000L)          // u points at both → max hub
    assert(out("v")._2 < 1000000L && out("v")._2 > 0)
  }

  test("boilerplate coverage: planted template stripped, rare one kept") {
    import spark.implicits._
    val tmpl = "t1 t2 t3 t4 t5" // 5 tokens → exactly one 5-gram per doc
    val docs = (0L until 20L).map { i =>
      val body = s"b$i c$i d$i e$i f$i g$i" // 6 unique tokens per doc
      // template on 10 docs (50% ≥ 10%), rare tag on 1 doc (5% < 10%)
      val text =
        if (i % 2 == 0) s"$tmpl $body"
        else if (i == 1) s"r1 r2 r3 r4 r5 $body"
        else body
      (i, text)
    }.toDF("doc_id", "text")
    val out = Boilerplate.coverage(docs, "doc_id", "text", n = 5, permille = 100)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (i <- 0L until 20L by 2)
      assert(out(i) == (11L, 5L, 6L), s"doc $i must lose its 5 template tokens: ${out(i)}")
    assert(out(1L) == (11L, 0L, 11L), "the 5%-df rare tag must NOT be stripped")
    for (i <- 3L until 20L by 2)
      assert(out(i) == (6L, 0L, 6L), s"clean doc $i must be untouched: ${out(i)}")
  }

  test("boilerplate coverage: overlapping template grams count positions once") {
    import spark.implicits._
    // every doc = the same 6 tokens → two overlapping boilerplate 5-grams
    // covering 6 distinct positions (not 10)
    val docs = (0L until 4L).map(i => (i, "t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val out = Boilerplate.coverage(docs, "doc_id", "text", n = 5, permille = 100)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).distinct.toList
    assert(out == List((6L, 6L, 0L)), s"overlap must dedup positions: $out")
  }

  test("substring dedup: keep-first by (doc, pos), overlapping spans merge") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),   // first occurrence of the run a..e and b..f
      (2L, "x a b c d e f"), // both 5-grams duplicated → 6 covered (0-based 1..6)
      (3L, "p q r s t u"))   // clean
      .toDF("doc_id", "text")
    val out = graft.text.Dedup.substringDupCoverage(docs, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (6L, 0L, 6L), s"doc 1 is the first occurrence: ${out(1L)}")
    assert(out(2L) == (7L, 6L, 1L), s"doc 2 loses the 6 spliced positions: ${out(2L)}")
    assert(out(3L) == (6L, 0L, 6L))
  }

  test("BPE: merge order, counts, and overlap resolution (aaa → one merge)") {
    import spark.implicits._
    // corpus: "aaab" ×3, "ab" ×2. Round 0 pairs: (a,a) 2·3=6, (a,b) 3+2=5,
    // tie-break none. Merge (a,a): "aaab" → [aa, a, b] (overlap: ONE merge),
    // "ab" → [a, b]. tokens after = 3·3 + 2·2 = 13
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val out = Bpe.train(spark, docs, "text", rounds = 3, dumpDir = None)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out(0) == (0L, "a", "a", 6L, 13L), s"round0: ${out(0)}")
    // round 1 state: aaab=[aa,a,b]×3, ab=[a,b]×2 → pairs: (aa,a)=3,
    // (a,b)=5 → merge (a,b): aaab=[aa,ab]×3, ab=[ab]×2 → tokens 3·2+2·1=8
    assert(out(1) == (1L, "a", "b", 5L, 8L), s"round1: ${out(1)}")
    // round 2: pairs: (aa,ab)=3 → merge → aaab=[aaab]×3 → tokens 3+2=5
    assert(out(2) == (2L, "aa", "ab", 3L, 5L), s"round2: ${out(2)}")
  }

  test("BPE encode: segmentation concatenates back to the word, in order") {
    import spark.implicits._
    val docs = Seq((1L, "aaab ab aaab"), (2L, "ab ba")).toDF("doc_id", "text")
    val vocab = Bpe.trainedVocab(spark, docs, "text", rounds = 2, dumpDir = None)
    val enc = Bpe.encode(docs, "doc_id", "text", vocab)
    // per (doc, token position): symbols in sym_pos order rebuild the word
    val rebuilt = enc.groupBy("doc_id", "tok_pos", "w")
      .agg(concat_ws("", array_sort(collect_list(struct(col("sym_pos"),
        col("sym")))).getField("sym")).as("joined"))
      .collect()
    assert(rebuilt.nonEmpty)
    rebuilt.foreach(r => assert(r.getString(2) == r.getString(3),
      s"segmentation of '${r.getString(2)}' rebuilt as '${r.getString(3)}'"))
    // corpus-side totals match vocab-side weighting: 5 tokens total
    assert(enc.select("doc_id", "tok_pos").distinct().count() == 5L)
  }

  test("BPE: stops early when every word is a single symbol") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val out = Bpe.train(spark, docs, "text", rounds = 10, dumpDir = None).collect()
    // round 0 merges (a,b) cnt 2; round 1 merges (c,d) cnt 1; then no
    // pairs remain → exactly 2 rows despite rounds=10
    assert(out.length == 2, s"expected early stop at 2 rounds: ${out.mkString(";")}")
    assert(out(1).getLong(4) == 3L) // 3 words, each one symbol
  }
}
