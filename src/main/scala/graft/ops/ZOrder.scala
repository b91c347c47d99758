package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys for multi-dimensional data layout.
  *
  * Sorting or range-partitioning a table by z(x, y) co-locates rows that are
  * close in BOTH dimensions, so per-file min/max statistics prune scans for
  * predicates on either column — the standard remedy (e.g. Delta/Iceberg
  * `OPTIMIZE ... ZORDER BY`) for the "sorted by x, unsorted by y" layout
  * where y-predicates read every file. The reference has no layout operator
  * (it writes one CSV per config); this is the engine's scale path for
  * multi-dimensional pruning on 100 TB fact tables (SURVEY §3.4 class:
  * physical layout / clustering).
  *
  * PURE INTEGER contract: the z-value is a sum of shifted bit-masks —
  * bit i of x lands at position 2i via `(x & 2^i) << i`, bit i of y at
  * position 2i+1 via `(y & 2^i) << (i+1)` — one codegen'd arithmetic
  * expression per row, no UDF, mirrored verbatim in SQL by [[zSql]].
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer columns
    * (x even positions, y odd). `bits` ≤ 31 keeps the result in a signed
    * 64-bit value (2·31 = 62 bits).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(xl.bitwiseAND(lit(1L << i)), i) +
        shiftleft(yl.bitwiseAND(lit(1L << i)), i + 1)
    }.reduce(_ + _)
  }

  /** DuckDB mirror of [[zValue]] over SQL expressions `x`, `y` — THE shared
    * definition of the interleave contract for oracle queries.
    */
  def zSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x) & ${1L << i}) << $i) + ((($y) & ${1L << i}) << ${i + 1})"
    }.mkString(" + ")

  /** Layout-quality report: bucket rows by the top bits of z(x, y)
    * (`bucket = z >> bucketShift`) and report per-bucket row counts and the
    * min/max envelope of each dimension. A good z-layout shows BOTH
    * envelopes narrow relative to the domain — exactly the statistics a
    * file-skipping reader would use. One map-side-combinable groupBy on a
    * derived integer; no wide row shuffle.
    */
  def layoutStats(df: DataFrame, xCol: String, yCol: String, bits: Int,
      bucketShift: Int): DataFrame = {
    val z = zValue(col(xCol), col(yCol), bits)
    df.select(shiftrightunsigned(z, bucketShift).as("z_bucket"),
        col(xCol).cast("long").as("_x"), col(yCol).cast("long").as("_y"))
      .groupBy("z_bucket")
      .agg(count(lit(1)).as("cnt"),
        min("_x").as("x_min"), max("_x").as("x_max"),
        min("_y").as("y_min"), max("_y").as("y_max"))
  }
}
