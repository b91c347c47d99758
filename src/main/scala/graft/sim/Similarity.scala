package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; O(Q·N) dot products — fine when
  * the query set is small and broadcast). Scale path: LSH bucketing by
  * random-hyperplane signs — candidates share a bucket, one shuffle on the
  * bucket key, never Q×N.
  *
  * All float math is done by casting each element to double and summing
  * left-to-right (`aggregate`), which DuckDB's list lambda mirrors exactly —
  * bitwise-reproducible cosine values for the oracle.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double, left-to-right — native codegen'd Catalyst expression
    * (DotProduct); numerically identical to the higher-order-function
    * formulation kept below for reference/verification.
    */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** HOF formulation (interpreted lambda) — retained as the parity baseline. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector (queries broadcast).
    * Rank on cosine rounded to 6dp with id tie-break — deterministic and
    * oracle-stable.
    *
    * Scale shape: the ranking is a k-bounded mergeable aggregate
    * ([[TopK.rankTopK]]), NOT a `row_number` window — each scan partition
    * reduces to ≤k candidates per query map-side, so no single task ever
    * sorts a whole query's corpus-sized candidate list (the round-5 plan
    * ceiling). Results are bitwise those of the window formulation.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // hoist norms: computed once per vector, not once per pair — same
    // arithmetic as dot/(sqrt·sqrt) so results stay bit-identical
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    TopK.rankTopK(scored, "cos", k)
  }

  /** Exact top-k by RAW dot product (unnormalized — magnitude-sensitive,
    * the ranker a max-inner-product retrieval system uses). Same shape and
    * determinism contract as [[cosineTopK]]: score rounded to 6dp, id
    * tie-break, queries broadcast so the corpus never shuffles, partial
    * top-k aggregation instead of a per-query window sort.
    */
  def dotTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("dp", round(dot(col("qv"), col("cv")), 6))
    TopK.rankTopK(scored, "dp", k)
  }

  /** Deterministic seeded gaussian hyperplanes — shared by the Spark LSH
    * signature and the DuckDB oracle (which inlines these as SQL literals, so
    * both engines bucket identically).
    */
  def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rng.nextGaussian())
  }

  /** Random-hyperplane LSH signature (nBits sign bits, seeded hyperplanes). */
  def lshSignature(vecCol: Column, dim: Int, nBits: Int, seed: Long): Column = {
    val planes = hyperplanes(dim, nBits, seed)
    val bits = (0 until nBits).map { b =>
      val plane = array(planes(b).map(lit).toSeq: _*)
      when(aggregate(zip_with(vecCol, plane, (x, p) => x.cast("double") * p),
        lit(0.0), (acc, v) => acc + v) >= 0, lit(1L << b)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k via hyperplane-LSH buckets + multiprobe on 1-bit flips:
    * candidates limited to vectors sharing any probed bucket.
    */
  def lshCosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, nBits: Int = 12, seed: Long = 42L): DataFrame = {
    val sigC = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
      .withColumn("bucket", lshSignature(col("cv"), dim, nBits, seed))
    // multiprobe: query also probes all 1-bit-flipped buckets
    val sigQ = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket0", lshSignature(col("qv"), dim, nBits, seed))
      .withColumn("bucket", explode(array(
        (col("bucket0") +: (0 until nBits).map(b => col("bucket0").bitwiseXOR(lit(1L << b)))): _*)))
    val cand = sigC.join(sigQ, Seq("bucket"))
      .where(col("query_id") =!= col("cand_id"))
      .select("query_id", "qv", "cand_id", "cv").distinct()
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    TopK.rankTopK(cand, "cos", k)
  }

  /** IVF-style ANN: a coarse quantizer of `nCells` deterministic centroids
    * (first rows by id — swap for k-means iterates offline); every vector is
    * assigned to its nearest centroid (one broadcast pass), queries probe the
    * `nProbe` nearest cells. Candidate set = vectors in probed cells — one
    * equi-join shuffle on cell id, never Q×N.
    */
  def ivfCosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).as("cell_id"), col(vecCol).as("centroid"))
    val cDist = broadcast(cents)

    def assign(df: DataFrame, id: String, v: String, topCells: Int): DataFrame = {
      val scored = df.crossJoin(cDist)
        .withColumn("cdist", dot(col(v), col("centroid")) /
          (norm(col(v)) * norm(col("centroid"))))
      if (topCells == 1) {
        // nearest-cell argmax as a partially-aggregable max-of-struct —
        // (cdist, −cell_id) orders by similarity with smallest-cell
        // tie-break, identical to the row_number path below but with
        // map-side combine over the nCells candidates and no window sort:
        // the shuffle carries one row per vector instead of nCells
        scored
          .groupBy(col(id))
          .agg(first(col(v)).as(v), // constant within the group
               max(struct(col("cdist"), (-col("cell_id")).as("neg_cell"))).as("best"))
          .withColumn("cell_id", -col("best").getField("neg_cell"))
          .drop("best")
      } else {
        val w = Window.partitionBy(col(id)).orderBy(col("cdist").desc, col("cell_id"))
        scored
          .withColumn("crank", row_number().over(w))
          .where(col("crank") <= topCells)
          .drop("centroid", "cdist", "crank")
      }
    }

    val corpusCells = assign(
      corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv")), "cand_id", "cv", 1)
    val queryCells = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id", "qv", nProbe)

    val cand = corpusCells.join(queryCells, Seq("cell_id"))
      .where(col("query_id") =!= col("cand_id"))
      .select("query_id", "qv", "cand_id", "cv").distinct()
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (norm(col("qv")) * norm(col("cv"))), 6))
    TopK.rankTopK(cand, "cos", k)
  }

  /** Product-quantization ANN (Jégou et al. 2011) with asymmetric distance
    * computation: vectors are encoded as `nSub` centroid codes (one per
    * `subDim`-wide subspace; codebook = the subvectors of the first `nCent`
    * rows by id — swap for k-means iterates offline, as with [[ivfCosineTopK]]),
    * and a query ranks candidates by the SUM of per-subspace
    * query-to-centroid distances looked up from a precomputed table — never
    * touching the original vectors again. This is the memory side of the
    * IVF-PQ pairing every billion-vector ANN system runs: N·nSub small ints
    * instead of N·dim floats.
    *
    * Scale shape: the codebook and the Q·nSub·nCent ADC tables are tiny and
    * broadcast; encoding is one map-side-combinable argmin (shuffle ≤ N·nSub
    * rows); scoring is one equi-join on (sub, code) + an integer sum; the
    * final ranking is the k-bounded [[TopK]] aggregate. No Q×N stage exists.
    *
    * Determinism: each subspace distance ‖x−c‖² is computed as
    * xx − 2·xc + cc in left-to-right double arithmetic (bitwise equal in
    * DuckDB's list_dot_product), then half-up-rounded to integer MICRO
    * units — so the ADC sum is an order-free integer and the (distance,
    * id) ranking cannot drift between engines.
    */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nSub: Int = 4, subDim: Int = 16,
      nCent: Int = 16): DataFrame = {
    val subs = array((0 until nSub).map(lit): _*)
    def d2Micro(x: Column, c: Column): Column =
      floor((dot(x, x) - lit(2.0) * dot(x, c) + dot(c, c)) * 1e6 + lit(0.5))
        .cast("long")

    // ids < nCent, the repo's deterministic seeding convention (matches
    // the oracle and ivfCosineTopK/kmeansStepStats; orderBy().limit()
    // would pick DIFFERENT centroids on any non-0-contiguous id space
    // and plan a global TakeOrdered besides)
    val cents = broadcast(corpus.where(col(idCol) < nCent)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cv"))
      .withColumn("sub", explode(subs))
      .withColumn("cs", expr(s"slice(cv, sub * $subDim + 1, $subDim)"))
      .select("sub", "cid", "cs"))

    // encode: nearest centroid per (vector, subspace) — argmin as a
    // partially-aggregable min-of-struct, so the exploded N·nSub·nCent
    // candidate rows reduce map-side to one code per (vector, sub)
    val codes = corpus.select(col(idCol).cast("long").as("cand_id"),
        col(vecCol).as("v"))
      .withColumn("sub", explode(subs))
      .withColumn("xs", expr(s"slice(v, sub * $subDim + 1, $subDim)"))
      .join(cents, Seq("sub"))
      .withColumn("d2m", d2Micro(col("xs"), col("cs")))
      .groupBy("cand_id", "sub")
      .agg(min(struct(col("d2m"), col("cid"))).as("best"))
      .select(col("cand_id"), col("sub"), col("best.cid").as("code"))

    // ADC lookup tables: per (query, sub, centroid) distance — broadcast
    val qtab = broadcast(queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
      .withColumn("sub", explode(subs))
      .withColumn("qs", expr(s"slice(qv, sub * $subDim + 1, $subDim)"))
      .join(cents, Seq("sub"))
      .withColumn("qd", d2Micro(col("qs"), col("cs")))
      .select(col("query_id"), col("sub"), col("cid").as("code"), col("qd")))

    val scored = codes.join(qtab, Seq("sub", "code"))
      .where(col("query_id") =!= col("cand_id"))
      .groupBy("query_id", "cand_id")
      .agg(sum("qd").as("adc_micro"))
      // TopK ranks (score DESC, id ASC); negating the integer distance
      // gives (distance ASC, id ASC) — integers < 2^53 negate exactly
      .withColumn("neg_adc", -col("adc_micro").cast("double"))
    TopK.rankTopK(scored, "neg_adc", k)
      .select(col("query_id"), col("cand_id"),
        (-col("neg_adc")).cast("long").as("adc_micro"), col("rank"))
  }

  /** Full IVF-PQ with RESIDUAL quantization (Jégou et al. 2011, the
    * architecture billion-vector ANN indexes actually ship): a coarse
    * quantizer routes each vector to its nearest cell by exact L2, PQ
    * codes are trained on and encode the RESIDUAL x − c(cell) (residuals
    * concentrate near the origin, which is why PQ-on-residuals beats
    * PQ-on-raw at equal code budget), and a query probes its `nProbe`
    * nearest cells scoring candidates by per-(cell, subspace) ADC lookup
    * tables over the query's own residual in that cell.
    *
    * Deterministic seeding convention: coarse centroids are ids < nCells;
    * PQ codebooks are the residuals of the next `nCent` ids (the first
    * nCells ids ARE the centroids — their residuals are zero vectors and
    * would be a degenerate codebook).
    *
    * Scale shape: centroids and codebooks broadcast; assignment and
    * encoding are map-side-combinable argmins (shuffle ≤ N and N·nSub
    * rows); candidates meet the ADC tables in ONE equi-join on (cell,
    * sub, code) — the probed-cell restriction IS the join (qtab only
    * carries probed cells); ranking is the k-bounded [[TopK]] aggregate.
    * All distances are half-up micro-rounded integers ([[pqAdcTopK]]'s
    * contract), so sums are order-free and bitwise across engines.
    */
  def ivfPqAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
      nSub: Int = 4, subDim: Int = 16, nCent: Int = 16): DataFrame = {
    val subs = array((0 until nSub).map(lit): _*)
    def d2Micro(x: Column, c: Column): Column =
      floor((dot(x, x) - lit(2.0) * dot(x, c) + dot(c, c)) * 1e6 + lit(0.5))
        .cast("long")
    val cents = broadcast(corpus.where(col(idCol) < nCells)
      .select(col(idCol).cast("long").as("cell_id"), col(vecCol).as("cellv")))

    // nearest-cell assignment + the residual against that cell's centroid
    def assignResid(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).cast("long").as(outId), col(vecCol).as("v"))
        .crossJoin(cents)
        .withColumn("d2m", d2Micro(col("v"), col("cellv")))
        .groupBy(outId)
        .agg(min(struct(col("d2m"), col("cell_id"))).as("best"),
          first(col("v")).as("v"))
        .select(col(outId), col("v"), col("best.cell_id").as("cell_id"))
        .join(cents, Seq("cell_id"))
        .withColumn("r", zip_with(col("v"), col("cellv"),
          (a, b) => a.cast("double") - b.cast("double")))
        .drop("cellv")

    // PQ codebooks from the residuals of ids [nCells, nCells + nCent)
    val cb = broadcast(assignResid(
        corpus.where(col(idCol) >= nCells && col(idCol) < nCells + nCent),
        "seed_id")
      .select((col("seed_id") - nCells).as("cid"), col("r"))
      .withColumn("sub", explode(subs))
      .withColumn("cs", expr(s"slice(r, sub * $subDim + 1, $subDim)"))
      .select("sub", "cid", "cs"))

    // encode every corpus vector's residual
    val codes = assignResid(corpus, "cand_id")
      .withColumn("sub", explode(subs))
      .withColumn("xs", expr(s"slice(r, sub * $subDim + 1, $subDim)"))
      .join(cb, Seq("sub"))
      .withColumn("d2m", d2Micro(col("xs"), col("cs")))
      .groupBy("cand_id", "cell_id", "sub")
      .agg(min(struct(col("d2m"), col("cid"))).as("best"))
      .select(col("cand_id"), col("cell_id"), col("sub"),
        col("best.cid").as("code"))

    // query side: nProbe nearest cells, residual per probed cell, ADC
    // tables per (query, cell, sub, codebook entry)
    val qcells = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
      .crossJoin(cents)
      .withColumn("d2m", d2Micro(col("qv"), col("cellv")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2m"), col("cell_id"))))
      .where(col("crank") <= nProbe)
      .withColumn("rq", zip_with(col("qv"), col("cellv"),
        (a, b) => a.cast("double") - b.cast("double")))
      .select("query_id", "cell_id", "rq")
    val qtab = broadcast(qcells
      .withColumn("sub", explode(subs))
      .withColumn("qs", expr(s"slice(rq, sub * $subDim + 1, $subDim)"))
      .join(cb, Seq("sub"))
      .withColumn("qd", d2Micro(col("qs"), col("cs")))
      .select(col("query_id"), col("cell_id"), col("sub"),
        col("cid").as("code"), col("qd")))

    val scored = codes.join(qtab, Seq("cell_id", "sub", "code"))
      .where(col("query_id") =!= col("cand_id"))
      .groupBy("query_id", "cand_id")
      .agg(sum("qd").as("adc_micro"))
      .withColumn("neg_adc", -col("adc_micro").cast("double"))
    TopK.rankTopK(scored, "neg_adc", k)
      .select(col("query_id"), col("cand_id"),
        (-col("neg_adc")).cast("long").as("adc_micro"), col("rank"))
  }

  /** Scale path for near-dup pairs: candidates share an LSH bucket (single
    * equi-join shuffle on the bucket id — never all-pairs), then exact cosine
    * on candidates only. Recall < 1 by construction; raise nBits probes or
    * lower nBits for denser buckets.
    */
  def embeddingNearDupsLsh(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double, nBits: Int = 8, seed: Long = 42L): DataFrame = {
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshSignature(col("v"), dim, nBits, seed))
      .withColumn("n", norm(col("v")))
    val a = sig.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na"), col("bucket"))
    val b = sig.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .where(col("cos") >= minCosine)
      .select("id_a", "id_b", "cos").distinct()
  }

  /** Embedding-cosine near-duplicate pairs above a threshold (exact for the
    * broadcastable side; LSH variant for scale).
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", norm(col("va")))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", norm(col("vb")))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .where(col("cos") >= minCosine)
      .select("id_a", "id_b", "cos")
  }
}
