package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.graftshim.ColumnShim

/** Static forwarder shared by interpreted eval and generated code. */
object HilbertUtil {

  /** Distance along the order-`order` Hilbert curve of grid cell (x, y),
    * x, y ∈ [0, 2^order) — the classic loop (Warren, Hacker's Delight
    * §16): per level, quadrant digit from the (rx, ry) bits, then rotate/
    * reflect the frame. O(order) per row.
    */
  def index(order: Int, x0: Long, y0: Long): Long = {
    val n = 1L << order
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // canonical rotation reflects within the FULL n×n frame — x and y
      // stay in [0, n), so floor-div/mod bit extraction (the SQL unroll)
      // and two's-complement bit tests agree at every level
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Hilbert-curve index as a native codegen'd expression — the locality-
  * preserving alternative to [[ZOrder]]: the Hilbert curve never jumps
  * (consecutive indexes are always grid neighbors), so bucket bounding
  * boxes are tighter than Morton's at the same bucket size, which is why
  * large lakehouse OPTIMIZE implementations offer Hilbert clustering next
  * to Z-order. The per-level rotation state makes the index a genuinely
  * iterative computation — as a giant unrolled expression it would triple
  * in size per level, so it ships as an O(order) static-call expression
  * (the [[graft.text.Fingerprint]] pattern); the SQL oracle unrolls the
  * identical recurrence as one CTE per level.
  */
case class HilbertIndex(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType &&
        order >= 1 && order <= 31)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index needs (bigint, bigint) and order in [1,31], got " +
        s"(${left.dataType}, ${right.dataType}, order=$order)")

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertUtil.index(order, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.ops.HilbertUtil.index($order, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Hilbert {

  def hValue(x: Column, y: Column, order: Int): Column =
    ColumnShim.column(HilbertIndex(
      ColumnShim.expression(x.cast("long")),
      ColumnShim.expression(y.cast("long")), order))

  /** The SQL unroll of [[HilbertUtil.index]]: CTE chain `hl0 … hl{order}`
    * over a source relation `src(id, gx, gy)` with gx, gy ∈ [0, 2^order),
    * ending in per-id state whose `d` is the Hilbert index. One CTE per
    * level — the rotation recurrence (x', y') := rotate(x, y) cannot be a
    * single flat expression without 3^order blowup. The (3·rx) XOR ry
    * quadrant digit is spelled arithmetically (rx=0 → ry, rx=1 → 3−ry) so
    * no dialect-specific XOR operator appears. `divOp` is the integer-
    * division spelling (`//` DuckDB, `div` Spark SQL).
    */
  def hilbertCtes(src: String, order: Int, divOp: String = "//"): String = {
    val n = 1L << order
    val levels = (0 until order).map { i =>
      val s = 1L << (order - 1 - i)
      s"""hl${i + 1} AS (
         |  SELECT id, gx, gy,
         |    d + ${s * s} * (CASE WHEN rx = 0 THEN ry ELSE 3 - ry END)
         |      AS d,
         |    CASE WHEN ry = 0 THEN
         |      CASE WHEN rx = 1 THEN ${n - 1} - y ELSE y END
         |    ELSE x END AS x,
         |    CASE WHEN ry = 0 THEN
         |      CASE WHEN rx = 1 THEN ${n - 1} - x ELSE x END
         |    ELSE y END AS y
         |  FROM (SELECT *, (x $divOp $s) % 2 AS rx, (y $divOp $s) % 2 AS ry
         |        FROM hl$i))""".stripMargin
    }
    (s"""hl0 AS (SELECT id, gx, gy, gx AS x, gy AS y, CAST(0 AS BIGINT) AS d
        |        FROM $src)""".stripMargin +: levels).mkString(",\n")
  }
}
