package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utility: salted equi-join. The large (skewed) side gets a
  * random salt in [0, saltFactor); the small side is replicated saltFactor
  * times; the join key becomes (key, salt), splitting each hot key's rows
  * across saltFactor tasks. Semantically identical to the plain join.
  *
  * At 100 TB this is the manual fallback when AQE's skew-split can't help
  * (e.g. a skewed aggregation feeding a join, or stream-static joins where
  * AQE is unavailable).
  */
object Salted {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    val salted = large.withColumn("_salt", (rand(42) * saltFactor).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** EXACT distributed distinct count under key skew, via value-space
    * bucketing: phase 1 groups by (key, hash(value) mod buckets) — each
    * bucket deduplicates a disjoint slice of the value space, so per-bucket
    * distinct counts SUM exactly — phase 2 sums them per key. A hot key's
    * dedup state is split across `buckets` reducers instead of one; plain
    * map-side partial aggregation cannot do this for distincts (every
    * partition may hold every value, so the hot key's full value set would
    * still meet at a single reducer).
    */
  def bucketedDistinctCount(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    df.withColumn("_b", pmod(xxhash64(col(valueCol)), lit(buckets)))
      .groupBy((keys :+ "_b").map(col): _*)
      .agg(countDistinct(col(valueCol)).as("_pc"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_pc").as("n_distinct"))
  }
}
