package graft.ops

import java.math.BigInteger

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Full pairwise covariance sufficient statistics over a k-slot INTEGER
  * vector column from ONE typed aggregate — the wide-k companion of
  * [[CovMatrix.pairSums]].
  *
  * `pairSums` encodes the 1 + k + k·(k+1)/2 sums as individual Catalyst
  * `agg` expressions; at k = 64 that is 2,145 DECIMAL(38,0) expressions and
  * the ANALYZE/codegen cost of the plan (tens of seconds, paid on the
  * DRIVER regardless of data size) dwarfs the data pass. This operator
  * instead accumulates the whole matrix in a single
  * `Aggregator[Seq[Option[Long]], _, _]` — Spark wraps a `udaf`-registered
  * Aggregator in `ScalaAggregator`, a `TypedImperativeAggregate`, so the
  * buffer lives as ONE JVM object per partial (a primitive long array plus
  * a BigInteger overflow carry), updated imperatively per row and
  * serialized only at the shuffle boundary. The plan is one
  * `ObjectHashAggregate` with map-side partials: the shuffle carries a
  * single sufficient-statistics row no matter the fact count — exactly the
  * pairSums shape at none of its expression cost.
  *
  * EXACTNESS contract: inputs are pre-quantized integer slots (the caller's
  * `transform(arr, v -> floor(v * 1e6))`), |slot| < 2³¹ (checked). Per-row
  * products are exact in LONG; the accumulator tracks a saturating bound of
  * its worst-case magnitude and spills into a per-slot BigInteger carry
  * BEFORE any long slot could wrap — so the emitted sums are exact at any
  * row count (the same values DECIMAL(38,0)/HUGEINT accumulation yields
  * inside the engines' 10³⁸ budget). Reduce/merge order cannot change an
  * integer sum, so the result is partitioning-invariant.
  *
  * NULL semantics (the per-expression SQL contract): every row counts
  * toward n; a NULL slot (or a slot past the array's end, or a NULL array)
  * is skipped by the sums and by every product involving it — matching
  * `sum(m_a)` / `sum(m_a*m_b)` null-skipping in both engines.
  *
  * Slot layout of the buffer (length k + k·(k+1)/2): [i] = Σ m_i;
  * [k + pairIdx(i,j)] = Σ m_i·m_j for i ≤ j, where
  * pairIdx(i,j) = i·k − i·(i−1)/2 + (j − i) (row-major upper triangle,
  * diagonal included). n rides separately on the buffer.
  */
object CovVec {

  /** Buffer: primitive long accumulators + lazy BigInteger carry (encoded
    * as minimal two's-complement byte arrays; empty = zero) + the
    * saturating magnitude bound that triggers a spill before overflow.
    */
  final case class Buf(var n: Long, var bound: Long, acc: Array[Long],
      carry: Array[Array[Byte]])

  private val SafeBound = Long.MaxValue / 2

  private def toBig(b: Array[Byte]): BigInteger =
    if (b.isEmpty) BigInteger.ZERO else new BigInteger(b)

  private def spill(b: Buf): Unit = {
    var s = 0
    while (s < b.acc.length) {
      if (b.acc(s) != 0L) {
        b.carry(s) = toBig(b.carry(s))
          .add(BigInteger.valueOf(b.acc(s))).toByteArray
        b.acc(s) = 0L
      }
      s += 1
    }
    b.bound = 0L
  }

  /** reduce/merge shared by every output flavor; `finish` is the plug. */
  private abstract class CovAgg[OUT](k: Int)
      extends Aggregator[Seq[Option[Long]], Buf, OUT] {
    protected val nSlots: Int = k + k * (k + 1) / 2

    final override def zero: Buf = Buf(0L, 0L, new Array[Long](nSlots),
      Array.fill(nSlots)(Array.emptyByteArray))

    final override def reduce(b: Buf, xs: Seq[Option[Long]]): Buf = {
      b.n += 1
      if (xs == null) return b
      val m = new Array[Long](k)
      val ok = new Array[Boolean](k)
      var maxA = 0L
      val len = math.min(xs.length, k)
      var i = 0
      while (i < len) {
        val o = xs(i)
        if (o != null && o.isDefined) {
          val v = o.get
          m(i) = v; ok(i) = true
          val a = math.abs(v)
          if (a > maxA) maxA = a
        }
        i += 1
      }
      require(maxA < (1L << 31),
        s"CovVec slot magnitude $maxA >= 2^31 — re-quantize coarser")
      // every slot add this row is ≤ max(maxA², maxA); spill the longs
      // into the BigInteger carry before any slot could pass ±2^62
      val step = math.max(maxA * maxA, 1L)
      if (b.bound > SafeBound - step) spill(b)
      b.bound += step
      i = 0
      while (i < k) {
        if (ok(i)) {
          b.acc(i) += m(i)
          val base = k + i * k - i * (i - 1) / 2 - i
          var j = i
          while (j < k) {
            if (ok(j)) b.acc(base + j) += m(i) * m(j)
            j += 1
          }
        }
        i += 1
      }
      b
    }

    final override def merge(a: Buf, b: Buf): Buf = {
      spill(a); spill(b)
      a.n += b.n
      var s = 0
      while (s < nSlots) {
        if (!b.carry(s).isEmpty) {
          a.carry(s) = toBig(a.carry(s)).add(toBig(b.carry(s))).toByteArray
        }
        s += 1
      }
      a
    }

    final override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]

    /** finish helper: exact sums, slot layout above. */
    protected final def bigSums(b: Buf): Array[BigInteger] = {
      spill(b); b.carry.map(toBig)
    }
  }

  /** The raw sufficient statistics: [n, Σm_0..Σm_{k−1}, pair products] as
    * decimal strings (1 + k + k·(k+1)/2 entries).
    */
  def sums(k: Int): Aggregator[Seq[Option[Long]], Buf, Seq[String]] =
    new CovAgg[Seq[String]](k) {
      override def finish(b: Buf): Seq[String] =
        b.n.toString +: bigSums(b).toIndexedSeq.map(_.toString)
      override def outputEncoder: Encoder[Seq[String]] =
        ExpressionEncoder[Seq[String]]()
    }

  /** Top principal component by power iteration, computed in the SAME
    * single pass: `finish` assembles the centered covariance numerators
    * C_ij = n·Σm_im_j − Σm_i·Σm_j (exact BigInteger) and runs `iters`
    * rounds of w ← (C·w)·scale ∕ max|C·w| — O(k²·iters) arithmetic on the
    * one sufficient-statistics buffer, executor-side, zero extra jobs.
    * BigInteger.divide truncates toward zero, the exact semantics of
    * Spark's `div` and the oracle's HUGEINT `//`, so the emitted ppm
    * weights are bit-identical to the engine-level CTE iteration they
    * replace (graft.SparkEntry.pcaIterSqlCtes renders the same loop for
    * DuckDB). This is the RowMatrix.computeGramian pattern — one
    * distributed pass, then eigen-iteration on the k×k result — minus
    * MLlib's driver-side step: here even the iteration stays in the plan.
    */
  def topComponent(k: Int, iters: Int,
      scale: Long = 1000000L): Aggregator[Seq[Option[Long]], Buf, Seq[Long]] =
    new CovAgg[Seq[Long]](k) {
      override def finish(b: Buf): Seq[Long] = {
        val s = bigSums(b)
        val n = BigInteger.valueOf(b.n)
        val c = Array.ofDim[BigInteger](k, k)
        var i = 0
        while (i < k) {
          var j = i
          while (j < k) {
            val pij = s(k + i * k - i * (i - 1) / 2 + (j - i))
            val cell = n.multiply(pij).subtract(s(i).multiply(s(j)))
            c(i)(j) = cell; c(j)(i) = cell
            j += 1
          }
          i += 1
        }
        val sc = BigInteger.valueOf(scale)
        var w = Array.fill(k)(sc)
        var it = 0
        while (it < iters) {
          val cw = Array.tabulate(k) { a =>
            var acc = BigInteger.ZERO
            var bIx = 0
            while (bIx < k) {
              acc = acc.add(c(a)(bIx).multiply(w(bIx))); bIx += 1
            }
            acc
          }
          val mx = cw.map(_.abs).max
          w =
            if (mx.signum == 0) Array.fill(k)(BigInteger.ZERO)
            else cw.map(_.multiply(sc).divide(mx))
          it += 1
        }
        w.toIndexedSeq.map(_.longValueExact)
      }
      override def outputEncoder: Encoder[Seq[Long]] =
        ExpressionEncoder[Seq[Long]]()
    }

  /** Sufficient-statistics rows over an integer-array column: one
    * aggregate over `df`, exploded to (pos, v DECIMAL(38,0)) with the slot
    * layout documented above (pos 0 = n) — 1 + k + k·(k+1)/2 rows total,
    * however many fact rows went in.
    */
  def suffStats(df: DataFrame, arr: Column, k: Int): DataFrame = {
    val agg = udaf(sums(k), ExpressionEncoder[Seq[Option[Long]]]())
    df.agg(agg(arr).as("ss"))
      .select(posexplode(col("ss")).as(Seq("pos", "v")))
      .select(col("pos"), col("v").cast("decimal(38,0)").as("v"))
  }

  /** One-row (k-slot array) ppm top component over an integer-array
    * column: the single-job driver of the PCA family.
    */
  def topComponentArr(df: DataFrame, arr: Column, k: Int,
      iters: Int): DataFrame = {
    val agg = udaf(topComponent(k, iters),
      ExpressionEncoder[Seq[Option[Long]]]())
    df.agg(agg(arr).as("warr"))
  }
}
