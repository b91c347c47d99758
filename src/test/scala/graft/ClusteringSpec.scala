package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Clustering

/** Clustering.kmeansStepStats vs an exact local replica: same left-to-right
  * double dot product, same HALF_UP 6dp rounding, same (cos DESC, cid ASC)
  * argmax, same floor(v·1e6) sums — the distributed step must reproduce the
  * sequential computation bit-for-bit.
  */
class ClusteringSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("one Lloyd step matches the sequential replica exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Clustering.kmeansStepStats(emb, "vec_id", "embedding", k = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val cents = vecs.filter(_._1 < 8)
    val sums = scala.collection.mutable.Map.empty[(Long, Int), (Long, Long)]
    vecs.foreach { case (_, v) =>
      val vn = math.sqrt(dot(v, v))
      val best = cents.map { case (cid, cv) =>
        (round6(dot(v, cv) / (vn * math.sqrt(dot(cv, cv)))), cid)
      }.minBy { case (cos, cid) => (-cos, cid) }._2
      v.zipWithIndex.foreach { case (x, d) =>
        val (n0, s0) = sums.getOrElse((best, d), (0L, 0L))
        sums((best, d)) = (n0 + 1, s0 + math.floor(x.toDouble * 1e6).toLong)
      }
    }
    assert(got == sums.toMap)
    // every vector lands in exactly one cluster: member counts total N per dim
    assert(got.collect { case ((_, 0), (n, _)) => n }.sum == vecs.length)
  }

  test("semDedup matches the sequential dominance replica; pairs stay cluster-bounded") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Clustering.semDedup(emb, "vec_id", "embedding", k = 8, tau = 0.35)
    // the pair stage must be an equi-join on the cluster key; the broadcast
    // centroid assignment is materialized once behind the checkpoint, so NO
    // nested-loop join may survive in the final plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "pair stage degenerated to a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "assignment must be checkpointed, not re-run per self-join branch")
    assert(plan.contains("SortMergeJoin [cluster") ||
      plan.contains("ShuffledHashJoin [cluster") ||
      plan.contains("BroadcastHashJoin [cluster"),
      "pair stage must equi-join on the cluster key")

    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val cents = vecs.filter(_._1 < 8)
    val assigned = vecs.map { case (id, v) =>
      val vn = math.sqrt(dot(v, v))
      val (cos, cid) = cents.map { case (cid, cv) =>
        (round6(dot(v, cv) / (vn * math.sqrt(dot(cv, cv)))), cid)
      }.minBy { case (c, i) => (-c, i) }
      (id, v, vn, cid, cos)
    }
    val byCluster = assigned.groupBy(_._4)
    val expect = byCluster.map { case (cl, ms) =>
      val droppedIds = ms.filter { case (idB, vb, nb, _, cb) =>
        ms.exists { case (idA, va, na, _, ca) =>
          (ca < cb || (ca == cb && idA < idB)) &&
            round6(dot(va, vb) / (na * nb)) >= 0.35
        }
      }.map(_._1)
      cl -> (ms.length.toLong, droppedIds.length.toLong,
        (ms.length - droppedIds.length).toLong, droppedIds.sum)
    }
    assert(got == expect)
    // the prune must bite but not obliterate: some drops, most docs kept
    val (n, drop) = (got.values.map(_._1).sum, got.values.map(_._2).sum)
    assert(drop > 0 && drop < n / 2, s"implausible prune rate: $drop of $n")
  }

  test("semDedupAuto: derived k keeps cluster sizes bounded as N grows") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val n1 = emb.count()
    // a doubled corpus (ids shifted past the originals) — with k derived as
    // ceil(n/target), doubling N must double the cluster budget instead of
    // letting per-cluster candidate pairs grow O((N/k)²)
    val doubled = emb.unionAll(
      emb.select((col("vec_id") + n1).as("vec_id"), col("embedding")))
    def audit(df: org.apache.spark.sql.DataFrame) =
      Clustering.semDedupAuto(df, "vec_id", "embedding",
        targetClusterSize = 16L, tau = 0.35, maxDroppersPerCluster = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (a1, a2) = (audit(emb), audit(doubled))
    assert(a1.values.sum == n1 && a2.values.sum == 2 * n1,
      "every vector lands in exactly one cluster")
    // the bound under test: mean cluster size stays at the target as N
    // doubles (a fixed k would double it), and no cluster degenerates past
    // a small multiple of the target
    assert(a2.size >= a1.size,
      s"cluster budget must grow with N: ${a1.size} -> ${a2.size}")
    val cap = 16L * 6
    assert(a1.values.max <= cap && a2.values.max <= cap,
      s"cluster sizes must stay near the target: " +
        s"max ${a1.values.max} / ${a2.values.max} vs target 16")
  }

  test("semDedupAuto dropper cap: audit identity holds, cap is monotone") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(cap: Int) =
      Clustering.semDedupAuto(emb, "vec_id", "embedding",
        targetClusterSize = 32L, tau = 0.35, maxDroppersPerCluster = cap)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    val (small, big) = (run(1), run(64))
    for ((cl, (nd, dr, kp)) <- small) assert(nd == dr + kp,
      s"cluster $cl: n_docs must equal n_dropped + n_kept")
    // a 1-exemplar dropper side can only ever drop a subset of what the
    // effectively-uncapped side drops — per cluster, not just in total
    for ((cl, (_, drBig, _)) <- big)
      assert(small(cl)._2 <= drBig,
        s"cluster $cl: cap=1 dropped ${small(cl)._2} > cap=64 dropped $drBig")
    assert(big.values.map(_._2).sum > 0, "the uncapped prune must bite")
  }

  test("k-center greedy: covering radius non-increasing, invariant, maximal first pick") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val sel = Clustering.kCenterGreedy(emb, "vec_id", "embedding", k = 6)
      .orderBy("sel_round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sel.length == 6 && sel.head == ((0L, 0L, 0L)))
    // selection distances never increase (each pick shrinks the covering
    // radius of the chosen set)
    val dists = sel.drop(1).map(_._3)
    assert(dists.zip(dists.drop(1)).forall { case (a, b) => a >= b },
      s"profile must be non-increasing: ${dists.mkString(",")}")
    // round 1's pick IS the argmax of distance to the seed — brute check
    val d2 = expr("CAST(floor((dxx - 2.0 * dxc + dcc) * 1e6 + 0.5) AS LONG)")
    val seed = emb.where(col("vec_id") === 0)
      .select(col("embedding").as("sv"))
    val far = emb.crossJoin(broadcast(seed))
      .where(col("vec_id") =!= 0)
      .withColumn("dxx", graft.sim.Similarity.dot(col("embedding"), col("embedding")))
      .withColumn("dxc", graft.sim.Similarity.dot(col("embedding"), col("sv")))
      .withColumn("dcc", graft.sim.Similarity.dot(col("sv"), col("sv")))
      .withColumn("d2", d2)
      .orderBy(col("d2").desc, col("vec_id")).limit(1)
      .select("vec_id", "d2").head()
    assert(sel(1)._2 == far.getLong(0) && sel(1)._3 == far.getLong(1))
    // repartition invariance
    val sel2 = Clustering.kCenterGreedy(emb.repartition(17), "vec_id",
      "embedding", k = 6).orderBy("sel_round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sel.toSeq == sel2.toSeq)
  }
}
