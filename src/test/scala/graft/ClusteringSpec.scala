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
}
