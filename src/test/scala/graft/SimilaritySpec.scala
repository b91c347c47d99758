package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Similarity

/** The q19 contract: the bucketed LSH near-dup path is the benched entry, the
  * exact all-pairs path is its small-scale cross-check.
  */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dim = 32

  private def randomCorpus(n: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  test("LSH near-dup pairs are a subset of the exact all-pairs output") {
    import spark.implicits._
    val df = randomCorpus(150, 5).toDF("vec_id", "embedding")
    val exact = Similarity.embeddingNearDups(df, "vec_id", "embedding", 0.2)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Similarity.embeddingNearDupsLsh(df, "vec_id", "embedding", dim, 0.2, nBits = 8)
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty, "same-bucket pairs above threshold must exist")
    lsh.foreach { case (a, b, cos) =>
      assert(exact.get((a, b)).contains(cos),
        s"LSH pair ($a,$b,$cos) missing from or differing in the exact output")
    }
  }

  test("planted near-dup recall >= 90% (30 planted pairs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val nPlanted = 30
    // ids 0..29 are bases, 1000+i is a strong near-dup of base i (cos > 0.99)
    val bases = Array.fill(nPlanted, dim)(rnd.nextGaussian().toFloat)
    val planted = (0 until nPlanted).flatMap { i =>
      Seq((i.toLong, bases(i)),
          (1000L + i, bases(i).map(x => x + 0.02f * rnd.nextGaussian().toFloat)))
    }
    val fill = (100L until 600L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val df = (planted ++ fill).toDF("vec_id", "embedding")
    val got = Similarity.embeddingNearDupsLsh(df, "vec_id", "embedding", dim, 0.9, nBits = 8)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    val found = (0 until nPlanted).count(i => got.contains((i.toLong, 1000L + i)))
    assert(found >= 27, s"planted-pair recall too low: $found/$nPlanted")
  }
}
