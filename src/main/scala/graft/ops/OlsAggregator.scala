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
}
