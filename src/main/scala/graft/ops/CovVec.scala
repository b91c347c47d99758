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
  * NULL semantics (the per-expression SQL contract, INCLUDING empty sums):
  * every row counts toward n; a NULL slot (or a slot past the array's end,
  * or a NULL array) is skipped by the sums and by every product involving
  * it; and a sum that received NO contribution at all (a dim never
  * observed, a pair never co-observed) is emitted as SQL NULL — exactly
  * what `sum(...)` over an empty set yields in both engines — not 0. The
  * power-iteration `finish` then mirrors NULL propagation through the
  * matrix arithmetic the way the engines' expressions would: a NULL cell
  * drops out of Σc·w, an all-NULL row yields a NULL component weight (and
  * the mx = 0 degenerate case zeroes every weight, the CASE's semantics).
  *
  * Slot layout of the buffer (length k + k·(k+1)/2): [i] = Σ m_i;
  * [k + pairIdx(i,j)] = Σ m_i·m_j for i ≤ j, where
  * pairIdx(i,j) = i·k − i·(i−1)/2 + (j − i) (row-major upper triangle,
  * diagonal included). n rides separately on the buffer.
  */
object CovVec {

  /** Buffer: primitive long accumulators + lazy BigInteger carry (encoded
    * as minimal two's-complement byte arrays; empty = zero) + per-slot
    * touched flags (an untouched slot is SQL NULL, not 0) + the saturating
    * magnitude bound that triggers a spill before overflow.
    */
  final case class Buf(var n: Long, var bound: Long, acc: Array[Long],
      carry: Array[Array[Byte]], touched: Array[Boolean])

  /** Aggregate output: the sufficient statistics as decimal strings
    * (`null` = the SQL-NULL empty sum; index 0 is n, never null) and the
    * converged ppm component (empty when `iters` = 0; `null` elements
    * where the engines' NULL propagation yields NULL weights).
    */
  final case class Out(ss: Seq[String], warr: Seq[Option[Long]])

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

  /** One aggregator serves every flavor: `iters` = 0 emits the sums alone,
    * `iters` ≥ 1 additionally runs the k×k power iteration in `finish`
    * (O(k²·iters) exact BigInteger arithmetic on the one buffer,
    * executor-side, zero extra jobs). BigInteger.divide truncates toward
    * zero — the exact semantics of Spark's `div` and the oracle's HUGEINT
    * `//` — so the ppm weights are bit-identical to the engine-level CTE
    * iteration they replace (graft.SparkEntry.pcaIterSqlCtes renders the
    * same loop for DuckDB). This is the RowMatrix.computeGramian pattern
    * — one distributed pass, then eigen-iteration on the k×k result —
    * minus MLlib's driver-side step: even the iteration stays in the plan.
    */
  def sumsAndComponent(k: Int, iters: Int,
      scale: Long = 1000000L): Aggregator[Seq[Option[Long]], Buf, Out] =
    new Aggregator[Seq[Option[Long]], Buf, Out] {
      private val nSlots = k + k * (k + 1) / 2

      override def zero: Buf = Buf(0L, 0L, new Array[Long](nSlots),
        Array.fill(nSlots)(Array.emptyByteArray), new Array[Boolean](nSlots))

      override def reduce(b: Buf, xs: Seq[Option[Long]]): Buf = {
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
            b.touched(i) = true
            val base = k + i * k - i * (i - 1) / 2 - i
            var j = i
            while (j < k) {
              if (ok(j)) {
                b.acc(base + j) += m(i) * m(j)
                b.touched(base + j) = true
              }
              j += 1
            }
          }
          i += 1
        }
        b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        spill(a); spill(b)
        a.n += b.n
        var s = 0
        while (s < nSlots) {
          if (!b.carry(s).isEmpty) {
            a.carry(s) = toBig(a.carry(s)).add(toBig(b.carry(s))).toByteArray
          }
          if (b.touched(s)) a.touched(s) = true
          s += 1
        }
        a
      }

      override def finish(b: Buf): Out = {
        spill(b)
        val sums = b.carry.map(toBig)
        val ss = b.n.toString +: sums.toIndexedSeq.zipWithIndex.map {
          case (v, s) => if (b.touched(s)) v.toString else null
        }
        if (iters <= 0) return Out(ss, Nil)
        // centered covariance numerators; an untouched pair sum is the
        // engines' NULL sab → the whole cell is NULL (valid = false) and
        // drops out of every Σ c·w exactly as sum() would drop it
        val n = BigInteger.valueOf(b.n)
        val c = Array.ofDim[BigInteger](k, k)
        val valid = Array.ofDim[Boolean](k, k)
        var i = 0
        while (i < k) {
          var j = i
          while (j < k) {
            val p = k + i * k - i * (i - 1) / 2 + (j - i)
            if (b.touched(p)) {
              val cell = n.multiply(sums(p))
                .subtract(sums(i).multiply(sums(j)))
              c(i)(j) = cell; c(j)(i) = cell
              valid(i)(j) = true; valid(j)(i) = true
            }
            j += 1
          }
          i += 1
        }
        val sc = BigInteger.valueOf(scale)
        var w: Array[BigInteger] = Array.fill(k)(sc) // null = NULL weight
        var it = 0
        while (it < iters) {
          val cw = Array.tabulate(k) { a =>
            var acc: BigInteger = null // empty sum = NULL
            var bIx = 0
            while (bIx < k) {
              if (valid(a)(bIx) && w(bIx) != null) {
                val t = c(a)(bIx).multiply(w(bIx))
                acc = if (acc == null) t else acc.add(t)
              }
              bIx += 1
            }
            acc
          }
          val defined = cw.filter(_ != null)
          val mx = if (defined.isEmpty) null else defined.map(_.abs).max
          w =
            if (mx == null) Array.fill[BigInteger](k)(null)
            else if (mx.signum == 0)
              // the CASE WHEN mx = 0 THEN 0 branch applies to EVERY dim,
              // NULL cw included — mirrored exactly
              Array.fill(k)(BigInteger.ZERO)
            else cw.map(v =>
              if (v == null) null else v.multiply(sc).divide(mx))
          it += 1
        }
        Out(ss, w.toIndexedSeq.map(v =>
          if (v == null) None else Some(v.longValueExact)))
      }

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Out] = Encoders.product[Out]
    }

  private def agg(df: DataFrame, arr: Column, k: Int, iters: Int): DataFrame = {
    val a = udaf(sumsAndComponent(k, iters),
      ExpressionEncoder[Seq[Option[Long]]]())
    df.agg(a(arr).as("cv"))
  }

  /** Sufficient-statistics rows over an integer-array column: one
    * aggregate over `df`, exploded to (pos, v DECIMAL(38,0) — NULL for an
    * empty sum) with the slot layout documented above (pos 0 = n) —
    * 1 + k + k·(k+1)/2 rows total, however many fact rows went in.
    */
  def suffStats(df: DataFrame, arr: Column, k: Int): DataFrame =
    agg(df, arr, k, 0)
      .select(posexplode(col("cv.ss")).as(Seq("pos", "v")))
      .select(col("pos"), col("v").cast("decimal(38,0)").as("v"))

  /** One-row (k-slot array) ppm top component over an integer-array
    * column: the single-job driver of the PCA family.
    */
  def topComponentArr(df: DataFrame, arr: Column, k: Int,
      iters: Int): DataFrame =
    agg(df, arr, k, iters).select(col("cv.warr").as("warr"))

  /** Both outputs of the ONE pass — (ss, warr) as a single row — for
    * consumers (q335) that need the matrix AND the component and must not
    * scan the fact table twice for them.
    */
  def statsAndComponentRow(df: DataFrame, arr: Column, k: Int,
      iters: Int): DataFrame =
    agg(df, arr, k, iters).select(col("cv.ss").as("ss"),
      col("cv.warr").as("warr"))
}
