package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-means building block over an embedding column.
  *
  * One Lloyd iteration, declaratively: ASSIGN each vector to the nearest
  * centroid (cosine, rounded to 6dp with centroid-id tie-break — the
  * engine's deterministic ranking contract), then UPDATE centroids as the
  * element-wise mean of their members, carried as an exact integer contract
  * (per-dimension Σ floor(v·1e6) plus member count — the mean is the
  * division the consumer performs, so no order-dependent double aggregate
  * crosses an engine or partition boundary).
  *
  * Scale shape (100 TB): centroids broadcast (k rows), so assignment is a
  * broadcast nested product N×k reduced map-side by the per-vector max —
  * the shuffle carries N pre-reduced rows, never N×k. The update explodes
  * dimensions INSIDE the map stage and partially aggregates before the
  * shuffle, so each task emits at most k·d partial rows regardless of task
  * size; the cluster-update shuffle is O(tasks · k · d), independent of N.
  * Iterating Lloyd = calling this per round on the previous round's means
  * (the caller owns the loop and the stopping rule, as with
  * ConnectedComponents).
  */
object Clustering {

  /** One Lloyd step with centroids taken from the corpus itself (the k
    * vectors with id < k — a deterministic seeding; k-means++ or a prior
    * round's output can be swapped in via `centroids`). Output: one row per
    * (cluster, dim) with n_members and sum_micro.
    */
  def kmeansStepStats(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame =
    kmeansStep(corpus, idCol, vecCol,
      corpus.where(col(idCol) < k)
        .select(col(idCol).as("cid"), col(vecCol).as("cv")))

  /** One Lloyd step against an explicit centroid set (cid, cv). */
  def kmeansStep(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val c = centroids.withColumn("cn", Similarity.norm(col("cv")))
    val e = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("ev"))
      .withColumn("en", Similarity.norm(col("ev")))
    val scored = e.crossJoin(broadcast(c))
      .withColumn("cos_r",
        round(Similarity.dot(col("ev"), col("cv")) / (col("en") * col("cn")), 6))
    // per-vector argmax: max of (cos, -cid) — highest cosine, then lowest
    // centroid id; partial aggregation reduces the N×k product map-side
    val assigned = scored.groupBy("vec_id")
      .agg(max(struct(col("cos_r"), (-col("cid")).as("ncid"))).as("best"),
           first(col("ev")).as("ev")) // ev is identical across a group
      .select((-col("best.ncid")).as("cluster"), col("ev"))
    assigned
      .select(col("cluster"), posexplode(col("ev")).as(Seq("dim", "v")))
      .groupBy("cluster", "dim")
      .agg(count(lit(1)).as("n_members"),
        // micro-quantized exact sum; DECIMAL(38,0) so a 1e12-member cluster
        // cannot silently wrap a LONG (same contract as ExactStats)
        sum(floor(col("v").cast("double") * lit(1e6)).cast("decimal(38,0)"))
          .as("sum_dec"))
      // the LONG downcast must not quietly NULL when the exact decimal sum
      // exceeds the long range (non-ANSI behavior) — fail loudly instead;
      // consumers at that scale should read sum_dec directly
      .withColumn("sum_micro",
        when(col("sum_dec") > lit(Long.MaxValue) || col("sum_dec") < lit(Long.MinValue),
          raise_error(lit("graft.Clustering: sum_micro exceeds LONG — " +
            "read the DECIMAL(38,0) sum instead")))
        .otherwise(col("sum_dec").cast("long")))
      .drop("sum_dec")
  }

  /** Pairwise affinity between per-label centroid SUMS: for every label
    * pair (a < b), the integer dot product Σ_d SA_d·SB_d of the exact
    * per-dimension micro sums, plus both member counts — the consumer
    * divides by n_a·n_b (and the norms) to get mean-centroid cosine, so no
    * double aggregate or sqrt crosses an engine/partition boundary.
    *
    * The class-confusability matrix a labeling pipeline watches: labels
    * whose centroids align are candidates for merging or for label-noise
    * review.
    *
    * Scale shape: the corpus collapses to |labels|·d sum rows in ONE
    * map-side-combined groupBy (the only pass over the data); the pairwise
    * stage runs on that tiny table (labels²·d) via a broadcast self-join —
    * never a vector-level cross product. The dot accumulates in
    * DECIMAL(38,0)/HUGEINT with a loud LONG-downcast guard (bound:
    * Σ_d |SA·SB| < 2^63, i.e. per-label per-dim |Σv_micro| < ~3.8e8·√d at
    * d = 64 — re-quantize to milli-units beyond it).
    */
  def labelAffinity(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val sums = df
      .select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("v").cast("double") * lit(1e6)).cast("decimal(38,0)"))
          .as("s_dec"))
      .withColumn("s_micro",
        when(col("s_dec") > lit(Long.MaxValue) || col("s_dec") < lit(Long.MinValue),
          raise_error(lit("graft.Clustering: label sum exceeds LONG")))
          .otherwise(col("s_dec").cast("long")))
    val a = sums.select(col("label").as("label_a"), col("dim"),
      col("s_micro").as("sa"), col("n").as("na"))
    val b = sums.select(col("label").as("label_b"), col("dim"),
      col("s_micro").as("sb"), col("n").as("nb"))
    a.join(broadcast(b), Seq("dim"))
      .where(col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sum(col("sa").cast("decimal(38,0)") * col("sb").cast("decimal(38,0)"))
          .as("dot_dec"))
      .withColumn("dot_micro2",
        when(col("dot_dec") > lit(Long.MaxValue) || col("dot_dec") < lit(Long.MinValue),
          raise_error(lit("graft.Clustering: affinity dot exceeds LONG")))
          .otherwise(col("dot_dec").cast("long")))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("dot_micro2"))
  }

  /** SemDeDup-style semantic deduplication: cluster the embedding space
    * (one broadcast-assign step against the deterministic id<k seeding, as
    * [[kmeansStepStats]]), then prune near-duplicates WITHIN each cluster —
    * a vector is dropped when a higher-priority clustermate sits within
    * cosine `tau` of it. Priority keeps the vectors LEAST similar to their
    * centroid (ascending centroid-cosine, id tie-break): the diverse
    * exemplars survive, the redundant core is pruned.
    *
    * Scale shape (100 TB): the all-pairs product never materializes —
    * candidate pairs are equi-joined on the cluster id, so the comparison
    * count is Σ|cluster|², bounded by the clustering granularity k (raise
    * k to cap cluster sizes; the assignment stage stays broadcast either
    * way). This is the same bucket-bounding argument as the LSH/IVF
    * rankers, with the bucket key learned from the data instead of hashed.
    * Output is the per-cluster audit grain: sizes, drops, and an
    * id-checksum of the dropped set (order-free but membership-exact).
    */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      tau: Double): DataFrame =
    semDedupAgainst(corpus, idCol, vecCol,
      corpus.where(col(idCol) < k)
        .select(col(idCol).as("cid"), col(vecCol).as("cv")),
      tau, maxDroppersPerCluster = None)

  /** [[semDedup]] with its scale knobs wired to the DATA instead of the
    * caller — the 100 TB entry point:
    *
    *  - k is DERIVED: `ceil(n / targetClusterSize)` from one scalar count,
    *    so expected cluster size (and with it the Σ|cluster|² pair bound)
    *    stays fixed as the corpus grows — a constant k would let
    *    within-cluster candidates grow O((N/k)²).
    *  - centroids are REFINED: one Lloyd iterate ([[kmeansStepStats]]) on
    *    the deterministic id<k seed, means rebuilt from the exact integer
    *    sums — data-shaped buckets instead of whichever vectors own the
    *    first k ids.
    *  - droppers are CAPPED: only the `maxDroppersPerCluster` least-central
    *    vectors per cluster (the k-bounded [[TopK]] aggregate, no window
    *    sort) act as the pruning side, so pairs per cluster are ≤
    *    cap·|cluster| even when a cluster degenerates — linear, not
    *    quadratic, in cluster size.
    */
  def semDedupAuto(corpus: DataFrame, idCol: String, vecCol: String,
      targetClusterSize: Long, tau: Double,
      maxDroppersPerCluster: Int): DataFrame = {
    require(targetClusterSize > 0, "targetClusterSize must be positive")
    require(maxDroppersPerCluster > 0, "maxDroppersPerCluster must be positive")
    // one scalar count sizes the clustering — a driver scalar, not a collect
    val n = corpus.count()
    val kL = math.max(1L, (n + targetClusterSize - 1) / targetClusterSize)
    // fail loudly instead of letting .toInt wrap to a bogus seed predicate:
    // a 2^31-cluster request means the target size, not k, should scale
    require(kL <= Int.MaxValue,
      s"derived k=$kL exceeds Int range — raise targetClusterSize")
    val k = kL.toInt
    // one Lloyd refinement: exact integer sums → per-dimension means
    // (sum/n/1e6 in double, mirrored verbatim by the oracle), reassembled
    // into centroid vectors by dim order
    val refined = kmeansStepStats(corpus, idCol, vecCol, k)
      .withColumn("cvd",
        col("sum_micro").cast("double") / col("n_members") / lit(1e6))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cvd")))),
        x => x.getField("cvd")).as("cv"))
      .select(col("cluster").as("cid"), col("cv"))
    semDedupAgainst(corpus, idCol, vecCol, refined, tau,
      Some(maxDroppersPerCluster))
  }

  private def semDedupAgainst(corpus: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, tau: Double,
      maxDroppersPerCluster: Option[Int]): DataFrame = {
    val c = centroids.withColumn("cn", Similarity.norm(col("cv")))
    val e = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("ev"))
      .withColumn("en", Similarity.norm(col("ev")))
    val assigned = e.crossJoin(broadcast(c))
      .withColumn("cos_r",
        round(Similarity.dot(col("ev"), col("cv")) / (col("en") * col("cn")), 6))
      .groupBy("vec_id")
      .agg(max(struct(col("cos_r"), (-col("cid")).as("ncid"))).as("best"),
        first(col("ev")).as("ev"), first(col("en")).as("en"))
      .select(col("vec_id"), (-col("best.ncid")).as("cluster"),
        col("best.cos_r").as("ccos"), col("ev"), col("en"))
      // the assignment feeds both self-join sides AND the size aggregate —
      // materialize it once instead of re-running the broadcast N×k
      // assignment three times (downstream joins are cluster-key SMJs, so
      // the checkpoint's missing stats cost nothing)
      .localCheckpoint()
    val aBase = assigned.select(col("cluster"), col("vec_id").as("id_a"),
      col("ccos").as("ca"), col("ev").as("va"), col("en").as("na"))
    val a = maxDroppersPerCluster match {
      case None => aBase
      case Some(cap) =>
        // only the cap least-central vectors per cluster may drop others:
        // rankTopK on (-ccos, id) is exactly the dropper-priority order, so
        // the capped set is the priority prefix — pairs ≤ cap·|cluster|
        val exemplars = TopK.rankTopK(
          assigned.select(col("cluster").as("query_id"),
            col("vec_id").as("cand_id"), (-col("ccos")).as("score")),
          "score", cap)
          .select(col("query_id").as("cluster"), col("cand_id").as("id_a"))
        aBase.join(exemplars, Seq("cluster", "id_a"), "left_semi")
    }
    val b = assigned.select(col("cluster"), col("vec_id").as("id_b"),
      col("ccos").as("cb"), col("ev").as("vb"), col("en").as("nb"))
    // b is dropped when a higher-priority a (further from the centroid,
    // id tie-break) is within tau of it
    val dropped = a.join(b, Seq("cluster"))
      .where((col("ca") < col("cb")) ||
             (col("ca") === col("cb") && col("id_a") < col("id_b")))
      .where(round(Similarity.dot(col("va"), col("vb")) /
        (col("na") * col("nb")), 6) >= tau)
      .select(col("cluster"), col("id_b")).distinct()
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_dropped"), sum("id_b").as("dropped_id_sum"))
    assigned.groupBy("cluster").agg(count(lit(1)).as("n_docs"))
      .join(dropped, Seq("cluster"), "left")
      .select(col("cluster"), col("n_docs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        (col("n_docs") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"),
        coalesce(col("dropped_id_sum"), lit(0L)).as("dropped_id_sum"))
  }

  /** Greedy k-center coreset selection (Gonzalez 1985; the farthest-point
    * diversity sampler modern data-selection pipelines use to pick a
    * maximally-spread training subset): start from `seedId`, then k−1
    * times add the point FARTHEST from the chosen set (max over points of
    * min over chosen of distance). Output: (sel_round, vec_id,
    * dist_micro) — the distance at which each point was selected, a
    * decreasing sequence that doubles as the coreset's covering-radius
    * profile.
    *
    * Determinism: distances are ‖x−c‖² as xx − 2·xc + cc in left-to-right
    * double arithmetic, half-up-rounded to integer micro (the
    * [[Similarity.pqAdcTopK]] contract), so min/argmax ranking with id
    * tie-breaks is bitwise across engines and partitionings.
    *
    * Scale shape: the chosen set (≤ k rows) broadcasts; each round is one
    * broadcast product reduced map-side by the per-point min — the
    * shuffle carries one row per point — plus a 1-row TakeOrdered argmax.
    * k rounds = k linear passes; nothing quadratic in N exists.
    */
  def kCenterGreedy(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, seedId: Long = 0L): DataFrame = {
    def d2Micro(x: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      floor((Similarity.dot(x, x) - lit(2.0) * Similarity.dot(x, c) +
        Similarity.dot(c, c)) * 1e6 + lit(0.5)).cast("long")
    val e = corpus.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).as("v")).localCheckpoint()
    var chosen = e.where(col("vec_id") === seedId)
      .select(col("vec_id").as("id"), lit(0L).as("rnd"), lit(0L).as("dm"),
        col("v").as("cv"))
      .localCheckpoint()
    // a missing seed must fail loudly, not return an empty coreset (the
    // SQL oracle fabricates its seed row unconditionally, so the two
    // sides would silently diverge on a bad seed id)
    require(chosen.count() == 1L,
      s"k-center seed id $seedId not present (exactly once) in the corpus")
    for (i <- 1L until k.toLong) {
      val dmin = e
        .join(chosen.select(col("id").as("vec_id")), Seq("vec_id"),
          "left_anti")
        .crossJoin(broadcast(chosen.select(col("cv"))))
        .withColumn("d2", d2Micro(col("v"), col("cv")))
        .groupBy("vec_id").agg(min("d2").as("dmin"), first(col("v")).as("v"))
      val pick = dmin.orderBy(col("dmin").desc, col("vec_id")).limit(1)
        .select(col("vec_id").as("id"), lit(i).as("rnd"),
          col("dmin").as("dm"), col("v").as("cv"))
      chosen = chosen.unionAll(pick).localCheckpoint()
    }
    chosen.select(col("rnd").as("sel_round"), col("id").as("vec_id"),
      col("dm").as("dist_micro"))
  }
}
