package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, embedding-cosine near-dup.
  *
  * Scale design notes (100 TB):
  *  - exact dedup: the oracle-exact variant groups by the text itself (one
  *    shuffle of the corpus); the scale optimization is a two-phase
  *    hash-group (shuffle 8-byte xxhash64, verify text equality within
  *    groups) — same result, 100-1000x less shuffle payload.
  *  - MinHash/LSH: candidate pairs come from banded bucket joins — the only
  *    shuffle is on (band, bucketHash); no all-pairs comparison ever happens.
  *  - n-gram Jaccard: restricted to candidate pairs that share a shingle
  *    (inverted-index join), with popular-shingle capping to bound skew.
  */
object Dedup {

  /** Exact duplicates via 64-bit content hash: keeps min(doc_id) per text,
    * reports group size. One shuffle on the (cheap, fixed-width) hash.
    */
  def exactDuplicateGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("canonical_id"),
           count(lit(1)).as("group_size"))
      .where(col("group_size") > 1)
      .select(col("canonical_id"), col("group_size"))

  /** Scale variant of exact dedup: phase 1 shuffles only 8-byte hashes to
    * find candidate hash groups; phase 2 shuffles just the duplicate
    * candidates' text for collision-safe verification. Same result as
    * exactDuplicateGroups with orders-of-magnitude less shuffle payload when
    * duplicates are rare (the 100 TB regime).
    */
  def exactDuplicateGroupsScalable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.select(col(idCol).as("id"), col(textCol).as("txt"),
      xxhash64(col(textCol)).as("h"))
    val dupHashes = hashed.groupBy("h").agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select("h")
    hashed.join(dupHashes, Seq("h"), "left_semi")
      .groupBy("h", "txt")
      .agg(min("id").as("canonical_id"), count(lit(1)).as("group_size"))
      .where(col("group_size") > 1)
      .select(col("canonical_id"), col("group_size"))
  }

  /** Exact-dedup'd view: first row (by id) per distinct text. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /** Exact n-gram Jaccard near-dup pairs (J >= minJaccard) via prefix-filtered
    * AllPairs (Bayardo et al.): with shingles globally ordered rare-first, two
    * docs with J >= t MUST share a shingle within each one's first
    * (n − ⌈t·n⌉ + 1) shingles — so only prefix rows enter the candidate join,
    * and the exact intersection is computed for candidates only. The result is
    * IDENTICAL to the naive all-shared-shingle join; candidate volume drops by
    * the prefix ratio squared (≈(1−t)², 25× at t=0.8), and — the 100 TB
    * property — popular shingles sort to the END of every doc, so the
    * candidate join never touches the high-df skew keys at all.
    *
    * `maxDocFreq` additionally drops shingles occurring in more than that many
    * docs (stop-shingle guard). When the cap bites, per-doc sizes are
    * recomputed over the SURVIVING shingles, so the reported Jaccard stays
    * exact over the capped shingle universe (not an underestimate).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double, maxDocFreq: Long = 1000L): DataFrame = {
    val t = minJaccard
    val exploded0 = df.select(col(idCol).as("id"),
      explode(TextOps.shingles(col(textCol), n)).as("shingle"))
    // doc frequency per shingle: drives both the cap and the rare-first order
    val docFreq = exploded0.groupBy("shingle").agg(count(lit(1)).as("df_"))
      .where(col("df_") <= maxDocFreq)
    // the shingle-explode + doc-freq join feeds THREE consumers (prefix
    // window, both intersection sides); Catalyst plans them as independent
    // subtrees (no exchange reuse), so checkpoint lazily to compute the
    // dominant stage once — storage is executor-local and freed by the
    // context cleaner with the plan
    val exploded = exploded0.join(docFreq, Seq("shingle")).localCheckpoint(false)
    val wCount = Window.partitionBy("id")
    val wOrder = Window.partitionBy("id").orderBy(col("df_"), col("shingle"))
    val prefix = exploded
      .withColumn("n_sh", count(lit(1)).over(wCount))
      .withColumn("pos", row_number().over(wOrder))
      // FP-safe prefix bound: ceil of the DOUBLE product t·n can exceed the
      // exact decimal ⌈t·n⌉ when the product rounds up to the next integer
      // (t=0.55, n=20 → 11.000000000000002 → ceil 12), silently shortening
      // the prefix; the 1e-9 slack restores the exact bound for any
      // plausible (t, n)
      .where(col("pos") <= col("n_sh") - ceil(lit(t) * col("n_sh") - lit(1e-9)) + 1)
    val a = prefix.select(col("id").as("id_a"), col("n_sh").as("n_a"), col("shingle"))
    val b = prefix.select(col("id").as("id_b"), col("n_sh").as("n_b"), col("shingle"))
    // length filter (exactness-preserving): J >= t implies
    // min(|A|,|B|) >= t * max(|A|,|B|)
    val cands = a.join(b, Seq("shingle"))
      .where(col("id_a") < col("id_b") &&
        col("n_a") >= lit(t) * col("n_b") &&
        col("n_b") >= lit(t) * col("n_a"))
      .select("id_a", "id_b", "n_a", "n_b").distinct()
    // exact intersection over the full surviving shingle sets, candidates only
    val e1 = exploded.select(col("id").as("id_a"), col("shingle"))
    val e2 = exploded.select(col("id").as("id_b"), col("shingle"))
    cands.join(e1, Seq("id_a")).join(e2, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 6))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Asymmetric shingle CONTAINMENT pairs: for ordered pairs (a, b),
    *
    *   contain_milli = ⌊ |A∩B| · 1000 / |A| ⌋  ≥  minContainMilli
    *
    * over distinct n-gram shingle sets. Containment catches what Jaccard
    * structurally cannot: a short document wholly embedded in a long one
    * (J = |A|/|B| ≈ 0, containment = 1000) — the quote/boilerplate/
    * supersede pattern that dominates real crawl dedup. Pure integer
    * (floor-division of non-negative counts): bit-identical across engines.
    *
    * Scale design: candidates come from the shared-shingle inverted-index
    * join with a doc-frequency cap (`maxDocFreq`) — the Jaccard prefix
    * filter does NOT apply to one-sided containment (a contained doc may
    * share only its own rare shingles), so the df cap is the skew bound:
    * join fan-out per shingle is ≤ maxDocFreq², and popular boilerplate
    * shingles (the 100 TB skew keys) never enter the join. Containment is
    * then exact over the SURVIVING (capped) shingle universe, with |A|
    * recomputed over survivors — same exactness contract as
    * [[ngramJaccardPairs]].
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, minContainMilli: Long, maxDocFreq: Long,
      prefixFilter: Boolean = true): DataFrame = {
    val exploded0 = df.select(col(idCol).as("id"),
      explode(TextOps.shingles(col(textCol), n)).as("shingle"))
    val kept = exploded0.join(
      exploded0.groupBy("shingle").agg(count(lit(1)).as("df_"))
        .where(col("df_") <= maxDocFreq),
      Seq("shingle")).localCheckpoint(false)
    // one-sided prefix bound (exactness-preserving): contain ≥ m/1000 needs
    // inter ≥ ⌈m·n_a/1000⌉, so A can miss at most n_a − ⌈m·n_a/1000⌉
    // shingles of ITS OWN set — if none of A's (maxmiss + 1) RAREST
    // shingles hits B, the pair cannot qualify. Only A's prefix enters the
    // candidate join (≈(1−t)·n_a rows, and the high-df skew keys sort out
    // of every prefix); B stays whole — that is the asymmetric analog of
    // the Jaccard AllPairs filter, with the bound computed in pure integer
    // arithmetic (the q13 1e-9-slack lesson, solved exactly this time).
    val aSide =
      if (!prefixFilter) kept.withColumn("n_sh",
        count(lit(1)).over(Window.partitionBy("id")))
      else {
        val wCount = Window.partitionBy("id")
        val wOrder = Window.partitionBy("id").orderBy(col("df_"), col("shingle"))
        kept
          .withColumn("n_sh", count(lit(1)).over(wCount))
          .withColumn("pos", row_number().over(wOrder))
          .where(col("pos") <= expr(
            s"n_sh - (($minContainMilli * n_sh + 999) div 1000) + 1"))
      }
    val cands = aSide.select(col("id").as("id_a"), col("n_sh").as("n_a"), col("shingle"))
      .join(kept.select(col("id").as("id_b"), col("shingle")), Seq("shingle"))
      .where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b", "n_a").distinct()
    // exact intersection over the full surviving sets, candidates only
    val e1 = kept.select(col("id").as("id_a"), col("shingle"))
    val e2 = kept.select(col("id").as("id_b"), col("shingle"))
    cands.join(e1, Seq("id_a")).join(e2, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b", "n_a")
      .agg(count(lit(1)).as("inter"))
      .withColumn("contain_milli", expr("(inter * 1000) div n_a"))
      .where(col("contain_milli") >= minContainMilli)
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"),
        col("contain_milli"))
  }

  /** Keep-BEST exact dedup: one survivor per content group, chosen by a
    * caller-supplied integer quality signal (ties → larger id), via a single
    * map-side-combinable max(struct) — no window sort, no self-join. The
    * group key is the rolling-hash fingerprint, NOT the text: the shuffle
    * carries an 8-byte key instead of the document (the q08-scalable
    * lesson), and any fingerprint collision merges identically on both
    * engine sides, so the contract stays oracle-exact by construction.
    * Complements [[exactDedup]] (keep-first-by-id): real pipelines keep the
    * best-quality copy, not the lowest id.
    */
  def keepBestDedup(df: DataFrame, idCol: String, textCol: String,
      quality: Column): DataFrame =
    df.select(TextOps.fingerprint(col(textCol)).as("group_fp"),
        col(idCol).as("id"), quality.cast("long").as("q"))
      .groupBy("group_fp")
      .agg(max(struct(col("q"), col("id"))).as("best"),
        count(lit(1)).as("group_size"))
      .select(col("group_fp"), col("best.id").as(idCol),
        col("best.q").as("quality"), col("group_size"))

  /** Deterministic per-shingle 32-bit-ish hash family for MinHash: h_i(s) =
    * (a_i * h(s) + b_i) mod p, p = 2^31-1, h = polynomial rolling hash.
    */
  private val MinhashP = 2147483647L

  private def shingleHash(c: Column): Column = TextOps.fingerprint(c)

  /** Fixed affine hash-family coefficients (h_i(x) = (a_i x + b_i) mod p) —
    * deterministic constants so the DuckDB oracle can mirror the arithmetic.
    */
  val MinhashCoefs: Vector[(Long, Long)] = Vector(
    (1373158607L, 239081663L),
    (53710185L, 1592467581L),
    (590620972L, 525901256L),
    (479341424L, 299655412L),
    (1581559893L, 220106707L),
    (1453201079L, 1590571865L),
    (1915941033L, 1171165722L),
    (186699714L, 1268073012L),
    (906070221L, 68252793L),
    (63989048L, 201209005L),
    (469521478L, 499635468L),
    (1085242217L, 1292825378L),
    (56985562L, 1205264595L),
    (427000597L, 1537640408L),
    (1395616197L, 1506083910L),
    (1170252924L, 900911954L))

  /** MinHash signatures (numHashes values per doc) over word n-gram shingles. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame = {
    require(numHashes <= MinhashCoefs.size, s"at most ${MinhashCoefs.size} hashes")
    val sh = df.select(col(idCol).as("id"), explode(TextOps.shingles(col(textCol), n)).as("shingle"))
      .withColumn("h", shingleHash(col("shingle")))
    val aggs = MinhashCoefs.take(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(MinhashP))).as(s"mh_$i")
    }
    sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** Polynomial band-bucket over minhash components — deterministic integer
    * arithmetic (acc·1000003 + mh mod p) so the DuckDB oracle reproduces the
    * buckets bit-for-bit (Spark's `hash()` is Murmur3, not SQL-expressible).
    * acc < 2^31 keeps acc·1000003 + mh < 2^52, safely inside a long.
    */
  def bandBucket(mhCols: Seq[Column]): Column =
    mhCols.foldLeft(lit(0L): Column)((acc, v) => pmod(acc * lit(1000003L) + v, lit(MinhashP)))

  /** MinHash-LSH candidate pairs: band the signature, bucket-join per band,
    * estimate similarity as matching-component fraction. The join key is
    * (band, bucket) — a single shuffle, never all-pairs.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 16, bands: Int = 4, minEstJaccard: Double = 0.5): DataFrame = {
    val sig = minhashSignatures(df, idCol, textCol, n, numHashes)
    val rows = numHashes / bands
    val banded = sig
      .withColumn("sig", array((0 until numHashes).map(i => col(s"mh_$i")): _*))
      .select(col("id"), col("sig"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            bandBucket((0 until rows).map(i => col(s"mh_${b * rows + i}"))).as("bucket"))
        }: _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col("id").as("id_a"), col("sig").as("sig_a"), col("band"), col("bucket"))
    val b = banded.select(col("id").as("id_b"), col("sig").as("sig_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b")).distinct()
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int")),
          v => v === 1)).cast("double") / numHashes, 6))
      .where(col("est_jaccard") >= minEstJaccard)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** 31-bit SimHash over token hashes: sign-sum of per-bit votes. 31 bits
    * because the token hash is mod 2^31−1, so bit 31 is never set — voting
    * over it would always yield −1 and a constant-0 output bit (it previously
    * masqueraded as a 32-bit hash with one dead bit).
    */
  val SimhashBits = 31

  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"), explode(TextOps.tokensCol(col(textCol))).as("tok"))
      .withColumn("h", shingleHash(col("tok")))
    val bitCols = (0 until SimhashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"bit_$b")
    }
    toks.groupBy("id").agg(bitCols.head, bitCols.tail: _*)
      .withColumn("simhash",
        (0 until SimhashBits).map(b => when(col(s"bit_$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _))
      .select("id", "simhash")
  }

  /** SimHash near-dup pairs within Hamming distance `maxHamming`, candidates
    * from 4-chunk LSH (two dups within distance d<=3 share >=1 of 4 chunks).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(df, idCol, textCol)
    val chunks = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"), shiftright(col("simhash"), c * 8).bitwiseAND(lit(255L)).as("ckey"))
      }: _*)).as("cc"))
      .select(col("id"), col("simhash"), col("cc.chunk"), col("cc.ckey"))
    val a = chunks.select(col("id").as("id_a"), col("simhash").as("sh_a"), col("chunk"), col("ckey"))
    val b = chunks.select(col("id").as("id_b"), col("simhash").as("sh_b"), col("chunk"), col("ckey"))
    a.join(b, Seq("chunk", "ckey"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Corpus-wide EXACT-SUBSTRING dedup, keep-first (the Lee et al. 2021
    * "Deduplicating Training Data Makes Language Models Better" shape,
    * token-k-gram formulation): every k-token run that occurs more than
    * once in the corpus keeps only its first occurrence — (doc_id, pos)
    * lexicographic — and every token position covered by a later
    * occurrence is marked duplicate. Returns per-document counts
    * (`idCol`, `n_tokens`, `n_dup`, `n_kept`); rewriting the stripped
    * text is the caller's choice.
    *
    * Scale design: gram occurrences shuffle as 8-BYTE fingerprints, never
    * gram strings (the [[shingleHash]] discipline); the first-occurrence
    * reduce is a map-side-combinable (count, min-struct) aggregate — no
    * window sort over the corpus; only grams with ≥2 occurrences survive
    * into the join side, which is duplicate-sized, so AQE broadcasts it
    * while it fits. Covered-position dedup shuffles (doc, pos) pairs
    * bounded by k · duplicate occurrences, keyed by doc.
    *
    * Contract caveat: the 31-bit rolling fingerprint can collide, marking
    * a non-duplicate run as duplicate; deterministic and mirrored exactly
    * by the oracle. A production corpus would widen the hash to 128 bits
    * — the plan shape is unchanged.
    */
  def substringDupCoverage(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val docs = df.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val grams = docs
      .select(col("doc_id"),
        posexplode(TextOps.shinglesAll(col("text"), k)).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), shingleHash(col("g")).as("h"))
    val firsts = grams.groupBy("h")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      .where(col("cnt") >= 2)
      .select(col("h"), col("first"))
    val dups = grams.join(firsts, "h")
      .where(!(col("doc_id") === col("first.doc_id")
        && col("pos") === col("first.pos")))
    val covered = dups
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("tp"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    docs
      .select(col("doc_id"),
        size(TextOps.tokensCol(col("text"))).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol), col("n_tokens"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        (col("n_tokens") - coalesce(col("n_dup"), lit(0L))).as("n_kept"))
  }
}
