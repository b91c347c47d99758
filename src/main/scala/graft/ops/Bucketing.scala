package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffling a fact table ONCE at write time
  * (bucketBy + sortBy on the join key) lets every later equi-join or
  * aggregation on that key run with NO exchange — the 100 TB answer to
  * repeated fact-fact joins (e.g. lineitem ⋈ orders on orderkey), where a
  * runtime shuffle of the big side would dominate the query.
  *
  * Both sides must agree on bucket count and key; Spark then plans a
  * SortMergeJoin directly over the bucketed file layout
  * (`BucketingSpec` asserts the exchange-free plan).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans without any
    * shuffle when bucket specs match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
