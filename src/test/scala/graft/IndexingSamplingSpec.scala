package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Dedup, Index, Sampling, TextOps}

/** Unit contracts for the indexing/sampling/profiling text operators:
  * inverted-index posting bounds, Heaps-curve bookkeeping, weighted-sample
  * determinism and weight monotonicity, char-class Gini arithmetic, and the
  * containment ⊇ subset guarantee.
  */
class IndexingSamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("invertedIndex: postings sorted, capped, df band enforced") {
    val docs = Seq((3L, "x x y"), (1L, "x z"), (2L, "x y")).toDF("doc_id", "text")
    val out = Index.invertedIndex(docs, "doc_id", "text",
        minDf = 2, maxDf = 2, postingCap = 1)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("df"), r.getAs[Long]("total_tf"), r.getString(3))).toMap
    // x has df 3 (> maxDf) → excluded; z has df 1 (< minDf) → excluded
    assert(out.keySet === Set("y"))
    assert(out("y") === ((2L, 2L, "2"))) // postings capped to first id only
  }

  test("invertedIndex: total_tf counts multiplicity, postings ascend") {
    val docs = Seq((9L, "w w w"), (4L, "w")).toDF("doc_id", "text")
    val r = Index.invertedIndex(docs, "doc_id", "text", 1, 10, 5).collect().head
    assert(r.getAs[Long]("df") === 2)
    assert(r.getAs[Long]("total_tf") === 4)
    assert(r.getAs[String]("postings") === "4,9")
  }

  test("vocabGrowth: cumulative vocab ends at the distinct-term count") {
    val docs = Seq((0L, "a b"), (1L, "b c"), (2L, "c d"), (3L, "a e"))
      .toDF("doc_id", "text")
    val out = Index.vocabGrowth(docs, "doc_id", "text", buckets = 2)
      .orderBy("bucket").collect()
    assert(out.map(_.getAs[Long]("n_docs")).toSeq === Seq(2L, 2L))
    assert(out.last.getAs[Long]("cum_tokens") === 8L)
    assert(out.last.getAs[Long]("cum_vocab") === 5L)
    // bucket 0 introduces a,b,c; bucket 1 introduces d,e
    assert(out.head.getAs[Long]("new_terms") === 3L)
    assert(out.last.getAs[Long]("new_terms") === 2L)
    // cumulative columns are prefix sums → monotone
    assert(out.head.getAs[Long]("cum_vocab") === 3L)
  }

  test("weightedPrioritySample: deterministic under repartition, k-bounded") {
    val docs = (1L to 200L).map(i => (i, s"doc number $i " * (i % 7 + 1).toInt))
      .toDF("doc_id", "text")
    val w = size(TextOps.tokensCol(col("text")))
    val a = Sampling.weightedPrioritySample(docs, "doc_id", "text", w, 50)
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.weightedPrioritySample(docs.repartition(13), "doc_id",
        "text", w, 50)
      .collect().map(_.getLong(0)).toSeq
    assert(a === b, "sample must be partitioning-independent")
    assert(a.length === 50)
  }

  test("weightedPrioritySample: for equal content, higher weight → lower priority") {
    val docs = Seq((1L, "same text here"), (2L, "same text here"))
      .toDF("doc_id", "text")
    val out = Sampling.weightedPrioritySample(docs, "doc_id", "text",
        when(col("doc_id") === 1, lit(1)).otherwise(lit(1000)), 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("priority")).toMap
    assert(out(2L) < out(1L))
    assert(out(1L) === out(2L) * 1000 || out(1L) / 1000 === out(2L))
  }

  test("charClassProfile: exact counts and floor-div Gini") {
    val docs = Seq((1L, "ab 12!"), (2L, "")).toDF("doc_id", "text")
    val out = TextOps.charClassProfile(docs, "doc_id", "text").collect()
    assert(out.length === 1, "empty text dropped")
    val r = out.head
    assert(r.getAs[Long]("n_chars") === 6)
    assert(r.getAs[Long]("n_alpha") === 2)
    assert(r.getAs[Long]("n_digit") === 2)
    assert(r.getAs[Long]("n_space") === 1)
    assert(r.getAs[Long]("n_other") === 1)
    // 10000 − ⌊10000·(4+4+1+1)/36⌋ = 10000 − 2777
    assert(r.getAs[Long]("gini_permyriad") === 7223L)
  }

  test("charClassProfile: single-class text has zero impurity") {
    val r = TextOps.charClassProfile(Seq((1L, "aaaa")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(r.getAs[Long]("gini_permyriad") === 0L)
  }

  test("keepBestDedup: survivor is the (quality, id)-max of its group") {
    val docs = Seq((1L, "same text", 10L), (2L, "same text", 30L),
        (3L, "same text", 30L), (4L, "other text", 5L))
      .toDF("doc_id", "text", "q")
    val out = Dedup.keepBestDedup(docs, "doc_id", "text", col("q"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("quality"), r.getAs[Long]("group_size"))).toMap
    // quality tie between ids 2 and 3 → larger id wins
    assert(out === Map(3L -> ((30L, 3L)), 4L -> ((5L, 1L))))
  }

  test("stratifiedPrioritySample: k per stratum, same priority contract as global") {
    val docs = (1L to 120L).map(i => (i, s"text body $i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val w = size(TextOps.tokensCol(col("text")))
    val out = Sampling.stratifiedPrioritySample(docs, "doc_id", "text", "lang", w, 10)
      .collect()
    val byStratum = out.groupBy(_.getString(0))
    assert(byStratum.keySet === Set("en", "de"))
    assert(byStratum.forall(_._2.length === 10), "exactly k per stratum")
    // the per-stratum winners must carry the same priority value the global
    // sampler assigns to the same documents
    val global = Sampling.weightedPrioritySample(docs, "doc_id", "text", w, 120)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("priority")).toMap
    for (r <- out)
      assert(r.getAs[Long]("priority") === global(r.getAs[Long]("doc_id")))
  }

  test("clusterSafeSplit: no component ever straddles the train/test boundary") {
    val labeled = (1L to 300L).map(i => (i, i % 37)).toDF("doc_id", "component")
    val out = Sampling.clusterSafeSplit(labeled, "component", 900)
      .select("component", "split").distinct().collect()
    val byComp = out.groupBy(_.getLong(0))
    assert(byComp.forall(_._2.length === 1),
      "every member of a component must land on the same side")
    // affine-hash replica: bucket = ((c mod p)·a + b mod p) mod 1000
    val buckets = Sampling.clusterSafeSplit(labeled, "component", 900)
      .select("component", "split_bucket").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((c, got) <- buckets) {
      val expect = ((c % 2147483647L) * 1373158607L + 239081663L) % 2147483647L % 1000L
      assert(got === expect, s"component $c")
    }
  }

  test("tokenBudgetFill: keeps the maximal in-order prefix, conserves totals") {
    // one stratum: docs of 900, 700, 500, 300 tokens (ids 1..4) vs budget
    // 1700 → kept prefix is 900+700 = 1600 (500 would overflow)
    val docs = Seq((1L, "a", 900L), (2L, "a", 700L), (3L, "a", 500L),
        (4L, "a", 300L), (5L, "b", 100L))
      .toDF("doc_id", "lang", "n")
    val out = graft.text.Mixing.tokenBudgetFill(docs, "lang", "doc_id",
        col("n"), budgetTokens = 1700L)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_docs_total") === 4)
    assert(a.getAs[Long]("tokens_total") === 2400)
    assert(a.getAs[Long]("n_docs_kept") === 2)
    assert(a.getAs[Long]("tokens_kept") === 1600)
    val b = out("b")
    assert(b.getAs[Long]("n_docs_kept") === 1)
    assert(b.getAs[Long]("tokens_kept") === 100)
  }

  test("containmentPairs: an embedded document scores exactly 1000") {
    val small = "alpha beta gamma delta epsilon"
    val big = s"intro words here $small trailing tail words"
    val docs = Seq((1L, small), (2L, big), (3L, "completely different text body now"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
        minContainMilli = 800L, maxDocFreq = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("contain_milli"))
      .toMap
    assert(out.keySet === Set((1L, 2L)), s"got $out")
    assert(out((1L, 2L)) === 1000L)
  }

  test("containmentPairs: prefix filter is exactness-preserving on a real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    def run(prefix: Boolean) =
      Dedup.containmentPairs(docs, "doc_id", "text", 3, 800L, 100L, prefix)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("inter"),
          r.getAs[Long]("n_a"), r.getAs[Long]("contain_milli"))).toSet
    val withPrefix = run(true)
    val naive = run(false)
    assert(withPrefix === naive, "prefix-filtered result must equal the naive join")
    assert(withPrefix.nonEmpty, "corpus should contain at least one near-contained pair")
  }

  test("containmentPairs prefix bound survives the exact-threshold boundary") {
    // A = 10 shingles (12 tokens), B missing exactly 2 of them → contain
    // = 800 exactly; the integer bound must keep the pair
    val aToks = (1 to 12).map(i => s"w$i").mkString(" ")
    val bToks = ((1 to 10) ++ (13 to 17)).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, aToks), (2L, bToks)).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text", 3, 800L, 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("contain_milli"))
      .toMap
    assert(out.contains((1L, 2L)), s"boundary pair must survive: $out")
    assert(out((1L, 2L)) === 800L)
  }

  test("containmentPairs is asymmetric: the containing side stays below threshold") {
    val small = "alpha beta gamma delta epsilon"
    val big = s"one two three four five six seven eight nine ten $small"
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val all = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0L, 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("contain_milli"))
      .toMap
    assert(all((1L, 2L)) === 1000L)
    assert(all((2L, 1L)) < 400L)
  }

  test("bm25TopK matches a sequential integer replica; no window sort in the plan") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana apple cherry"),
      (1L, "banana cherry cherry date"),
      (2L, "apple apple apple apple"),
      (3L, "date elderberry fig grape"),
      (50L, "apple cherry date")).toDF("doc_id", "text")
    val out = Index.bm25TopK(docs, "doc_id", "text",
      probeFilter = col("doc_id") % 50 === 0, k = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "ranking must not use a per-query window sort")
    assert("Join \\[(tok#\\d+, salt#\\d+L?|salt#\\d+L?, tok#\\d+)\\]"
      .r.findFirstIn(plan).isDefined,
      s"the posting join must include the skew salt in its key:\n$plan")

    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getInt(3))).toMap

    // sequential replica of the exact same integer formula
    val corpus = Seq(0L -> "apple banana apple cherry",
      1L -> "banana cherry cherry date", 2L -> "apple apple apple apple",
      3L -> "date elderberry fig grape", 50L -> "apple cherry date")
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
    val n = corpus.length.toLong
    val avgMilli = toks.map(_._2.length.toLong).sum * 1000 / n
    val dfm = toks.flatMap { case (_, ts) => ts.distinct }.groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    def bitlen(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    def score(q: Seq[String], cand: Seq[String]): Long = {
      val dl = cand.length.toLong
      val normMilli = dl * 1000000L / avgMilli
      q.distinct.map { t =>
        val tf = cand.count(_ == t).toLong
        if (tf == 0) 0L
        else (bitlen(n / dfm(t)) * tf * 2200 * 1000) /
          (tf * 1000 + 300 + (900 * normMilli) / 1000)
      }.sum
    }
    val probes = Seq(0L, 50L)
    val expect = probes.flatMap { p =>
      val q = toks.find(_._1 == p).get._2
      toks.map { case (c, ct) => (c, score(q, ct)) }
        .filter(_._2 > 0)
        .sortBy { case (c, s) => (-s, c) }.take(3).zipWithIndex
        .map { case ((c, s), i) => (p, c) -> (s, i + 1) }
    }.toMap
    assert(got == expect, s"got $got\nexpect $expect")
  }

  test("bm25TopK salting is score-preserving: tiny shards == one shard") {
    import spark.implicits._
    // df("common") = 60 docs; saltRowsPerShard = 7 → 9 salt shards on the
    // hot token, vs the effectively-unsalted default — results must be
    // bitwise identical because each posting row meets exactly one query
    // replica
    val docs = ((0L until 60L).map(i => (i, s"common word$i filler"))
      :+ (100L, "common word1 word2")).toDF("doc_id", "text")
    def run(shard: Long) = Index.bm25TopK(docs, "doc_id", "text",
        probeFilter = col("doc_id") === 100L, k = 10,
        saltRowsPerShard = shard)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(run(7L) == run(1L << 20), "salted ranking must equal unsalted")
  }

  test("bm25TopK maxDfPermille prunes head terms from the posting side") {
    import spark.implicits._
    // "hot" df=4/5 (800‰), "rare" df=2/5 (400‰); cap at 500‰ keeps only
    // rare — candidates sharing just the hot token must vanish
    val docs = Seq((0L, "hot rare a"), (1L, "hot b c"), (2L, "hot d e"),
      (3L, "hot f g"), (4L, "rare h i")).toDF("doc_id", "text")
    val out = Index.bm25TopK(docs, "doc_id", "text",
        probeFilter = col("doc_id") === 0L, k = 10, maxDfPermille = 500)
      .collect().map(r => r.getLong(1)).toSet
    assert(out == Set(0L, 4L),
      s"only rare-token candidates (0 self, 4) may survive the cap: $out")
  }
}
