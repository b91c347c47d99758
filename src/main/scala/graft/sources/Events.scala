package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Canonical read-side normalization for the events table. */
object Events {

  /** Normalize events.ts to the long-ns contract every consumer assumes
    * (ts div 1000 == DuckDB epoch_us): identity when the file stores
    * TIMESTAMP(NANOS) (read as a raw long under the legacy
    * `parquet.nanosAsLong` flag); an exact timezone-free conversion when
    * the table ships as TIMESTAMP_NTZ(us) (the round-6 testdata regen's
    * encoding). Works on batch and streaming frames alike.
    */
  def tsToLongNs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType) df
    else df.withColumn("ts", expr(
      "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', " +
        "cast(ts as timestamp_ntz)) * 1000"))
}
