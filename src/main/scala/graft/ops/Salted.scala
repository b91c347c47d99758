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
}
