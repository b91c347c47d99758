package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextOps

/** Bit-parity of the native Shingles expression vs the HOF baseline it
  * replaced — including element ORDER (first occurrence), empty-token
  * handling from consecutive spaces, short texts, and null text.
  */
class TextShinglesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("native shingles == HOF shingles on edge cases (order included)") {
    import spark.implicits._
    val texts = Seq(
      "a b c d e", "a b", "", "a", "a  b c", " a b c ", "x x x x x",
      "a b c a b c a b c", "tok1 tok2 tok3 tok4", null.asInstanceOf[String])
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val got = df.select(col("id"), TextOps.shingles(col("text"), n).as("s"))
        .as[(Long, Seq[String])].collect().toMap
      val want = df.select(col("id"), TextOps.shinglesHof(col("text"), n).as("s"))
        .as[(Long, Seq[String])].collect().toMap
      assert(got == want, s"divergence at n=$n")
    }
  }

  test("native shingles == HOF shingles on the real documents corpus") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val joined = docs.select(col("doc_id"),
        TextOps.shingles(col("text"), 3).as("native"),
        TextOps.shinglesHof(col("text"), 3).as("hof"))
      .where(not(col("native") === col("hof")))
    assert(joined.count() == 0, "native and HOF shingles must agree on every doc")
  }

  test("repetitionCounts: multiset vs distinct shingle counts") {
    import spark.implicits._
    // "x x x x x" has 3 trigram occurrences, all identical → 3 vs 1
    val df = Seq((1L, "x x x x x"), (2L, "a b c d"), (3L, "a b")).toDF("doc_id", "text")
    val m = TextOps.repetitionCounts(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(m(1L) == ((3, 1)) && m(2L) == ((2, 2)) && m(3L) == ((0, 0)))
  }

  test("contaminationCounts: distinct probe-shingle overlap per doc") {
    import spark.implicits._
    val docs = Seq((10L, "a b c d e"), (11L, "z z z")).toDF("doc_id", "text")
    val probes = Seq((1L, "a b c x y b c d")).toDF("doc_id", "text")
    // probe trigrams: {a b c, b c x, c x y, x y b, y b c, b c d}
    // doc 10 trigrams: {a b c, b c d, c d e} → overlap {a b c, b c d} = 2
    val m = TextOps.contaminationCounts(docs, probes, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(10L -> 2L), s"got $m")
  }

  test("native fingerprint == HOF fingerprint on edge cases") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(17)
    val cases = Seq("", "A", "hello world", " leading", "trailing ",
      "päö non-ascii ü", "a" * 5000) ++
      (1 to 50).map(_ => (1 to rnd.nextInt(200)).map(_ =>
        (32 + rnd.nextInt(95)).toChar).mkString)
    val df = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
    val out = df.select(col("id"), TextOps.fingerprint(col("t")).as("native"),
        TextOps.fingerprintHof(col("t")).as("hof"))
      .collect()
    out.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"fingerprint mismatch for id ${r.getLong(0)}"))
  }

  test("native fingerprint == HOF fingerprint on the real documents corpus") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.select(TextOps.fingerprint(col("text")).as("a"),
        TextOps.fingerprintHof(col("text")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(n == 0L)
  }

  test("NormalizeUnicode: NFC composes, NFD+mark-strip de-accents, codegen == interpreted") {
    import org.apache.spark.sql.functions.{col, length, regexp_replace}
    import graft.text.NormalizeUnicode
    import spark.implicits._
    // explicit escapes only: precomposed \u00e9 and combining e+\u0301 render
    // identically in an editor, which is exactly the bug class under test
    val mixed = "caf\u00e9 re\u0301sume\u0301" // one precomposed, two combining
    val composed = "caf\u00e9 r\u00e9sum\u00e9"
    val df = Seq(mixed, "plain ascii", "\ufb01le").toDF("t") // U+FB01 = fi ligature
    val out = df.select(col("t"),
        NormalizeUnicode(col("t"), "NFC").as("nfc"),
        NormalizeUnicode(col("t"), "NFKC").as("nfkc"),
        regexp_replace(NormalizeUnicode(col("t"), "NFD"), "\\p{Mn}", "").as("strip"),
        length(col("t")).as("lr"), length(NormalizeUnicode(col("t"), "NFC")).as("ln"))
      .collect().map(r => r.getString(0) -> r).toMap
    val cafe = out(mixed)
    assert(cafe.getString(1) == composed, "NFC must compose the combining pairs")
    assert(cafe.getString(3) == "cafe resume", "NFD + \\p{Mn} strip must de-accent")
    assert(cafe.getInt(4) == cafe.getInt(5) + 2, "two combining pairs collapse")
    assert(out("plain ascii").getString(1) == "plain ascii")
    assert(out("\ufb01le").getString(2) == "file", "NFKC unfolds compatibility ligatures")
    // interpreted eval (no codegen) must agree with the generated code path
    val expr = graft.text.NormalizeUnicode(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(mixed)), "NFC")
    assert(expr.eval(null).toString == composed)
    intercept[IllegalArgumentException] {
      graft.text.NormalizeUnicode(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFX")
    }
  }
}
