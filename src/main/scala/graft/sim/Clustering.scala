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
}
