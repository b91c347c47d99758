package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language-ID, document fingerprinting.
  *
  * All implemented with codegen'd built-in functions (no UDFs) so they stay
  * inside whole-stage codegen and are exactly reproducible in the DuckDB
  * oracle. Every op is a narrow projection — embarrassingly parallel at any
  * scale, no shuffle.
  */
object TextOps {

  /** Whitespace tokens (single-space corpus). */
  def tokensCol(text: Column): Column = split(text, " ")

  /** Token count + distinct-token count per doc. */
  def tokenStats(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_tokens", size(tokensCol(col(textCol))))
      .withColumn("n_distinct_tokens", size(array_distinct(tokensCol(col(textCol)))))

  /** BPE-ish subword-boundary tokenization: letter runs, digit runs, and
    * single punctuation marks — the regex analogue of a byte-pair pretokenizer
    * (identical match semantics in Spark's Java regex and DuckDB's RE2 for
    * this POSIX-safe pattern).
    */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def regexTokens(text: Column): Column = regexp_extract_all(text, lit(BpeishPattern), lit(0))

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Quality heuristics: length, mean token length, stopword ratio,
    * type-token ratio, digit ratio. Deterministic arithmetic only.
    */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokensCol(col(textCol))
    val nTok = size(toks)
    val stopArr = array(Stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t)))
    df.withColumn("n_chars_m", length(col(textCol)))
      .withColumn("n_tokens", nTok)
      .withColumn("mean_token_len",
        round((length(col(textCol)) - nTok + 1).cast("double") / nTok, 6))
      .withColumn("stopword_ratio", round(nStop.cast("double") / nTok, 6))
      .withColumn("type_token_ratio",
        round(size(array_distinct(toks)).cast("double") / nTok, 6))
      .withColumn("quality_score",
        round(least(lit(1.0), nTok.cast("double") / 100.0) * (lit(1.0) - nStop.cast("double") / nTok), 6))
  }

  /** Language-ID by stopword-list voting: score per language = matching token
    * count; prediction = argmax with deterministic tie-break on language code.
    * (The real-world analogue is an n-gram profile model; the vote keeps the
    * operator SQL-expressible for the oracle.)
    */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht", "das", "ist", "du", "ich", "ein", "mit"),
    "en" -> Seq("the", "and", "is", "of", "to", "a", "in", "that", "it", "for"),
    "es" -> Seq("el", "la", "que", "de", "no", "los", "una", "por", "con", "para"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"),
    "zh" -> Seq("de", "shi", "bu", "wo", "ni", "ta", "zai", "le", "you", "men"))

  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokensCol(col(textCol))
    val scored = LangMarkers.foldLeft(df) { case (d, (code, markers)) =>
      val arr = array(markers.map(lit): _*)
      d.withColumn(s"score_$code", size(filter(toks, t => array_contains(arr, t))))
    }
    // argmax with tie-break on language code order (greatest of structs)
    val structs = LangMarkers.map { case (code, _) =>
      struct(col(s"score_$code").as("s"), lit(LangMarkers.size - LangMarkers.indexWhere(_._1 == code)).as("prio"), lit(code).as("code"))
    }
    scored.withColumn("lang_pred", greatest(structs: _*).getField("code"))
  }

  /** Model-based quality filtering with a fixed linear classifier — the
    * production pattern (a fastText/logreg quality model scored over every
    * document) distilled to an integer contract: four integer features
    * (token count, stopword permille, lowercase-alpha permille, mean token
    * length in milli-chars) meet fixed integer weights in one codegen'd
    * projection, and the decision is the sign of the margin. No sigmoid —
    * P(keep) > ½ ⟺ margin > 0, so the filter decision needs no float math
    * and is bitwise-reproducible in the oracle. Narrow map, no shuffle.
    *
    * The weights favor longer documents with natural stopword density and
    * alphabetic content, and penalize abnormal mean token length — the
    * shape of a real corpus-quality model, with made-up (but fixed)
    * coefficients standing in for trained ones.
    */
  def linearQualityMargin(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokensCol(col(textCol))
    val nTok = size(toks).cast("long")
    val nChars = length(col(textCol)).cast("long")
    val stopArr = array(Stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t))).cast("long")
    val nAlpha = length(regexp_replace(col(textCol), "[^a-z]", "")).cast("long")
    df.withColumn("n_tokens", nTok)
      .withColumn("n_stop_q", nStop)
      .withColumn("n_alpha_q", nAlpha)
      .withColumn("n_chars_q", nChars)
      .withColumn("stop_pm", expr("(n_stop_q * 1000) div n_tokens"))
      .withColumn("alpha_pm",
        expr("(n_alpha_q * 1000) div greatest(n_chars_q, 1)"))
      .withColumn("mtl_milli",
        expr("((n_chars_q - n_tokens + 1) * 1000) div n_tokens"))
      .withColumn("margin", expr(
        "4 * n_tokens + 2 * stop_pm + alpha_pm" +
          " - abs(mtl_milli - 4500) div 2 - 800"))
      .withColumn("keep", (col("margin") > 0).cast("long"))
      .drop("n_stop_q", "n_alpha_q", "n_chars_q")
  }

  /** Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
    * algorithm): positional `n`-gram shingle hashes, then the minimum of
    * every `w`-length window with a rightmost-min tie-break — any shared
    * token run of length ≥ n + w − 1 + 1 between two documents yields a
    * shared SELECTED hash, at ~2/(w+1) storage density. The (hash,
    * pos-desc) window min rides one encoded integer key
    * (h·2^32 + (2^32−1−pos): h < 2^31 keeps the product below 2^63, and
    * the full-width position field is exact for any document below 2^32
    * shingles — no modular wrap to mis-decode or mis-tie-break on long
    * documents), making the selection a plain frame-bounded `min` every
    * engine evaluates identically.
    *
    * Returns one row per selected fingerprint: (idCol, n_shingles, sh,
    * spos). Scale shape: per-document windows (bounded by document
    * length), one exchange on the document id — embarrassingly parallel
    * over documents.
    */
  def winnowedFingerprints(df: DataFrame, idCol: String, textCol: String,
      w: Int = 4): DataFrame = {
    val id = col(idCol)
    val grams = df.select(id, split(col(textCol), " ").as("t"))
      .where(size(col("t")) >= 3)
      .select(id, posexplode(expr(
        "transform(sequence(0, size(t) - 3), " +
          "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")))
      .select(id, col("pos").cast("long").as("pos"),
        fingerprint(col("col")).as("h"))
    val nsh = grams.groupBy(idCol).agg(count(lit(1)).as("n_shingles"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    val f = 4294967296L // 2^32 position field
    grams
      .withColumn("wmin", min(col("h") * f +
        (lit(f - 1) - col("pos"))).over(win))
      .join(nsh, Seq(idCol))
      .where(col("pos") <= col("n_shingles") - w)
      .select(id, col("n_shingles"),
        expr(s"wmin div ${f}L").as("sh"),
        (lit(f - 1) - pmod(col("wmin"), lit(f))).as("spos"))
      .distinct()
  }

  /** 31-polynomial rolling hash of the text modulo 2^31-1 — a deterministic
    * document fingerprint computable with identical integer arithmetic in
    * Spark and DuckDB (`list_reduce` over `ascii(substr(...))`) — verified
    * bit-identical. Native single-pass expression ([[Fingerprint]]); the HOF
    * formulation below is the retained parity baseline.
    */
  def fingerprint(textCol: Column): Column = Fingerprint(textCol)

  /** HOF formulation — parity baseline for [[Fingerprint]] (O(n²): boxes a
    * Long per char and substr re-scans the string; never use in a hot path).
    */
  def fingerprintHof(textCol: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(textCol)),
        i => ascii(textCol.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31L + c) % 2147483647L)

  def fingerprints(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("fingerprint", fingerprint(col(textCol)))

  /** Word n-gram shingles (for Jaccard/MinHash dedup). */
  def shingles(textCol: Column, n: Int): Column =
    // native single-pass expression; coalesce keeps the HOF's null behavior
    // (null text → empty shingle set, not null)
    coalesce(Shingles(textCol, n), array().cast("array<string>"))

  /** HOF formulation — retained as the parity baseline for `Shingles`. */
  def shinglesHof(textCol: Column, n: Int): Column = {
    val toks = split(textCol, " ")
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingles WITH duplicates (multiset) — the within-document
    * repetition signal; `shingles` returns the distinct set.
    */
  def shinglesAll(textCol: Column, n: Int): Column = {
    val toks = split(textCol, " ")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Within-document repetition counts (Gopher-style duplicate n-gram
    * filter): total vs distinct shingle occurrences per document. Pure
    * integer contract — downstream thresholds compare scaled integers
    * (e.g. repetitive ⇔ 5·(total−distinct) > total) so no ratio double
    * ever crosses an engine boundary. Narrow per-row op: distributes
    * trivially at any corpus scale.
    */
  def repetitionCounts(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol),
      // the multiset size is a closed form of the token count (never
      // materialize the shingle array for it), and the DISTINCT size is the
      // native single-pass expression — size(array_distinct(HOF)) cost
      // O(len²) allocations per doc
      shingleCounts(col(textCol), n))
      .select(col(idCol), col("sc.n_shingles").as("n_shingles"),
        col("sc.n_distinct_shingles").as("n_distinct_shingles"))

  /** (total, distinct) n-gram shingle counts as a struct column `sc` —
    * total = max(tokens − n + 1, 0) in closed form, distinct via the native
    * [[Shingles]] expression. The shared kernel of every repetition
    * predicate (q57, q64/q66's `notRepetitive`).
    */
  def shingleCounts(text: Column, n: Int): Column =
    struct(
      greatest(size(tokensCol(text)) - (n - 1), lit(0)).as("n_shingles"),
      size(shingles(text, n)).as("n_distinct_shingles")).as("sc")

  /** Salient-term extraction (tf-idf-INSPIRED keyword ranking with a PURE
    * INTEGER contract): per document, the top-k tokens by
    * (term frequency DESC, document frequency ASC, token ASC) — tf-major
    * with an idf tie-break. NOTE this is not the tf·idf ordering itself:
    * tf·log(N/df) can rank a rare low-tf term above a common high-tf term
    * (tf=1,df=1 beats tf=2,df=100 for large N). The integer contract is
    * chosen so both engines sort identical integers — no transcendental
    * log whose last ulp differs across engines (the r1 q31 lesson).
    * Distribution: one tf groupBy, one df groupBy, one equi-join on the
    * token, and a per-document window — all narrow or single-shuffle at
    * any corpus scale.
    */
  def topTermsPerDoc(df: DataFrame, idCol: String, textCol: String, k: Int,
      minTokenLen: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol), explode(tokensCol(col(textCol))).as("token"))
      .where(length(col("token")) >= minTokenLen)
    val tf = tok.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val docFreq = tok.select(col(idCol), col("token")).distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(docFreq, Seq("token"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("rk"))
  }

  /** Benchmark decontamination: for each corpus document, the number of
    * DISTINCT probe-set (benchmark) n-grams it contains — the standard
    * exact-overlap contamination check before training. One equi-join on
    * the shingle string; the probe side is the benchmark suite (tiny), so
    * it broadcasts — corpus-side work is a narrow explode + map-side join
    * at any scale. Documents with zero overlap are absent from the result
    * (anti-join them for the clean set).
    */
  def contaminationCounts(docs: DataFrame, probes: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val docSh = docs.select(col(idCol),
      explode(shingles(col(textCol), n)).as("shingle"))
    val probeSh = probes.select(
      explode(shingles(col(textCol), n)).as("shingle")).distinct()
    docSh.join(broadcast(probeSh), Seq("shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated_shingles"))
  }

  /** PII patterns — deliberately POSIX-safe (character classes, counted
    * repetition, no lookaround/backreferences) so Java regex and DuckDB's
    * RE2 match identically, the q37 parity discipline. Conservative on
    * purpose: a corpus scrubber prefers recall via simple patterns over a
    * brittle RFC-exact grammar.
    */
  val EmailPattern = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+"
  val PhonePattern = "[0-9]{3}-[0-9]{4}"

  /** PII detection + redaction: per-document match counts and the redacted
    * text (emails → <EMAIL> first, then phones → <PHONE> — an email's
    * digits must not be half-eaten by the phone pass). The redacted string
    * itself is summarized by the rolling-hash fingerprint, so the oracle
    * verifies the REDACTION OUTPUT bit-for-bit, not just the counts.
    * Narrow per-row projection — no shuffle at any scale.
    */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val emailRedacted = regexp_replace(col(textCol), EmailPattern, "<EMAIL>")
    val redacted = regexp_replace(emailRedacted, PhonePattern, "<PHONE>")
    df.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))).as("n_emails"),
      // phones counted AFTER the email pass, so a digit run inside an
      // address never double-counts — counts match what redaction replaced
      size(regexp_extract_all(emailRedacted, lit(PhonePattern), lit(0))).as("n_phones"),
      length(redacted).as("n_chars_redacted"),
      fingerprint(redacted).as("redacted_fp"))
  }

  /** Character-class profile + Gini impurity, a pure-integer quality signal
    * (machine-generated text skews heavily to one class; natural prose
    * mixes). Classes: ASCII letters, digits, spaces, other. The impurity is
    * emitted in permyriad with one floor division,
    *
    *   gini = 10000 − (10000·(a² + d² + s² + o²)) div n²
    *
    * so no ratio or log ever crosses an engine boundary (contrast an
    * entropy score, whose ln() last-ulp differs across libm builds). Class
    * counts come from length-after-regexp-delete — codegen'd string ops,
    * no explode. Rows with empty text are dropped (n² division guard).
    */
  def charClassProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val n = length(t)
    // counts widened to LONG before any product: length() is INT, and the
    // permyriad numerator crosses 2^31 already at ~460-char docs
    df.select(col(idCol), n.cast("long").as("n_chars"),
        (n - length(regexp_replace(t, "[A-Za-z]", ""))).cast("long").as("n_alpha"),
        (n - length(regexp_replace(t, "[0-9]", ""))).cast("long").as("n_digit"),
        (n - length(regexp_replace(t, " ", ""))).cast("long").as("n_space"))
      .where(col("n_chars") > 0)
      .withColumn("n_other",
        col("n_chars") - col("n_alpha") - col("n_digit") - col("n_space"))
      .withColumn("gini_permyriad", expr(
        """10000 - (10000 * (n_alpha * n_alpha + n_digit * n_digit
          |  + n_space * n_space + n_other * n_other))
          |  div (n_chars * n_chars)""".stripMargin))
  }
}
