package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass OLS-slope aggregator (`Aggregator[IN, BUF, OUT]`): the
  * Dataset-typed analogue of `regr_slope`, usable with
  * `ds.groupByKey(...).agg(OlsAggregator.slope.toColumn)` — one pass, O(1)
  * state, mergeable (shuffle-safe partial aggregation).
  */
object OlsAggregator {

  final case class Buf(n: Long, sx: Double, sy: Double, sxx: Double, sxy: Double)

  /** slope of y on x over (x, y) pairs. */
  val slope: Aggregator[(Double, Double), Buf, Double] =
    new Aggregator[(Double, Double), Buf, Double] {
      override def zero: Buf = Buf(0L, 0.0, 0.0, 0.0, 0.0)
      override def reduce(b: Buf, p: (Double, Double)): Buf = {
        val (x, y) = p
        Buf(b.n + 1, b.sx + x, b.sy + y, b.sxx + x * x, b.sxy + x * y)
      }
      override def merge(a: Buf, b: Buf): Buf =
        Buf(a.n + b.n, a.sx + b.sx, a.sy + b.sy, a.sxx + b.sxx, a.sxy + b.sxy)
      override def finish(b: Buf): Double =
        if (b.n == 0) Double.NaN
        else {
          val vx = b.sxx - b.sx * b.sx / b.n
          if (vx == 0.0) Double.NaN else (b.sxy - b.sx * b.sy / b.n) / vx
        }
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  final case class BufM(n: Long, sx: Long, sy: Long, sxx: BigInt, sxy: BigInt)

  /** Order-insensitive variant: slope of y on x in milli-units (half-up),
    * matching graft.ops.ExactStats.slopeMilli. The buffer holds exact
    * integer sums of micro-quantized pairs (Σx² as BigInt — micro² sums
    * overflow LONG), so reduce/merge order cannot change the result; finish
    * runs the same double division DuckDB's HUGEINT mirror performs.
    */
  val slopeMilli: Aggregator[(Double, Double), BufM, Long] =
    new Aggregator[(Double, Double), BufM, Long] {
      override def zero: BufM = BufM(0L, 0L, 0L, BigInt(0), BigInt(0))
      override def reduce(b: BufM, p: (Double, Double)): BufM = {
        val xm = math.floor(p._1 * 1e6).toLong
        val ym = math.floor(p._2 * 1e6).toLong
        BufM(b.n + 1, b.sx + xm, b.sy + ym,
          b.sxx + BigInt(xm) * BigInt(xm), b.sxy + BigInt(xm) * BigInt(ym))
      }
      override def merge(a: BufM, b: BufM): BufM =
        BufM(a.n + b.n, a.sx + b.sx, a.sy + b.sy, a.sxx + b.sxx, a.sxy + b.sxy)
      override def finish(b: BufM): Long = {
        val num = (BigInt(b.n) * b.sxy - BigInt(b.sx) * BigInt(b.sy)).doubleValue
        val den = (BigInt(b.n) * b.sxx - BigInt(b.sx) * BigInt(b.sx)).doubleValue
        math.floor(num / den * 1000.0 + 0.5).toLong
      }
      override def bufferEncoder: Encoder[BufM] = Encoders.product[BufM]
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
}
