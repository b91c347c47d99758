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

  /** Candidate pairs sharing at least one word n-gram, with exact Jaccard
    * similarity over distinct shingle sets. `maxDocFreq` drops shingles that
    * occur in more than that many docs (stop-shingle skew cap).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double, maxDocFreq: Long = 1000L): DataFrame = {
    val sh = df.select(col(idCol).as("id"), TextOps.shingles(col(textCol), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val exploded = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("shingle"))
    // doc-frequency cap as a partial-agg groupBy + join (map-side combine)
    // instead of a window count, which would sort every shingle partition
    val docFreq = exploded.groupBy("shingle").agg(count(lit(1)).as("df_"))
      .where(col("df_") <= maxDocFreq)
    val filtered = exploded.join(docFreq, Seq("shingle"))
    val a = filtered.select(col("id").as("id_a"), col("n_sh").as("n_a"), col("shingle"))
    val b = filtered.select(col("id").as("id_b"), col("n_sh").as("n_b"), col("shingle"))
    // length filter (exactness-preserving): J >= t implies
    // min(|A|,|B|) >= t * max(|A|,|B|), pruning pairs before aggregation
    a.join(b, Seq("shingle"))
      .where(col("id_a") < col("id_b") &&
        col("n_a") >= lit(minJaccard) * col("n_b") &&
        col("n_b") >= lit(minJaccard) * col("n_a"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 6))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

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

  /** MinHash-LSH candidate pairs: band the signature, bucket-join per band,
    * estimate similarity as matching-component fraction. The join key is
    * (band, hash-of-band) — a single shuffle, never all-pairs.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 16, bands: Int = 4, minEstJaccard: Double = 0.5): DataFrame = {
    val sig = minhashSignatures(df, idCol, textCol, n, numHashes)
    val rows = numHashes / bands
    val sigArr = sig.withColumn("sig", array((0 until numHashes).map(i => col(s"mh_$i")): _*))
      .select("id", "sig")
    val banded = sigArr.select(col("id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), hash(slice(col("sig"), b * rows + 1, rows)).as("bucket"))
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

  /** 32-bit SimHash over token hashes: sign-sum of per-bit votes. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"), explode(TextOps.tokensCol(col(textCol))).as("tok"))
      .withColumn("h", shingleHash(col("tok")))
    val bitCols = (0 until 32).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"bit_$b")
    }
    toks.groupBy("id").agg(bitCols.head, bitCols.tail: _*)
      .withColumn("simhash",
        (0 until 32).map(b => when(col(s"bit_$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _))
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
}
