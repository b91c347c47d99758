package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, lit}
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

  /** Range-filter events on the RAW ts column, then normalize — the
    * pushdown-safe way to ts-scan. Filtering the tsToLongNs output would
    * put the predicate above the conversion expression and forfeit parquet
    * row-group pruning; here the ns bounds are inverse-mapped onto
    * whichever physical encoding the file shipped with (long ns, or
    * TIMESTAMP_NTZ µs via exact ceil-division), so the comparison lands in
    * the scan's PushedFilters and prunes row groups by their min/max
    * stats. `loNs` inclusive, `hiNs` exclusive, on the NORMALIZED ns axis;
    * both mappings are exact (µs-grain data makes ceil(lo/1000)·1000 ≥ lo
    * select the same rows as the ns predicate would).
    */
  def tsRangeNs(df: DataFrame, loNs: Long, hiNs: Long): DataFrame = {
    val filtered =
      if (df.schema("ts").dataType == LongType)
        df.where(col("ts") >= loNs && col("ts") < hiNs)
      else {
        // us·1000 ∈ [loNs, hiNs)  ⟺  us ∈ [ceil(loNs/1000), ceil(hiNs/1000))
        def ceilUs(ns: Long) = Math.floorDiv(Math.addExact(ns, 999L), 1000L)
        // literal type mirrors the column type so the comparison needs no
        // cast on the column side (a cast would block pushdown): NTZ files
        // get a LocalDateTime literal, TIMESTAMP(LTZ) files an Instant —
        // equivalent under the UTC session every entry point pins
        val mkLit: Long => org.apache.spark.sql.Column =
          if (df.schema("ts").dataType ==
              org.apache.spark.sql.types.TimestampNTZType)
            us => lit(java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(us, 1000000L),
              (Math.floorMod(us, 1000000L) * 1000L).toInt,
              java.time.ZoneOffset.UTC))
          else
            us => lit(java.time.Instant.ofEpochSecond(
              Math.floorDiv(us, 1000000L),
              Math.floorMod(us, 1000000L) * 1000L))
        df.where(col("ts") >= mkLit(ceilUs(loNs)) &&
          col("ts") < mkLit(ceilUs(hiNs)))
      }
    tsToLongNs(filtered)
  }
}
