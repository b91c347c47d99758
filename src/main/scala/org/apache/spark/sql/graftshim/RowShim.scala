package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to the private[sql] InternalRow → DataFrame constructor (Spark 4
  * classic API): lets a generator emit catalyst rows directly, skipping the
  * typed-Encoder serialization layer (case class + Option boxing) that
  * dominates high-volume emission.
  */
object RowShim {
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
