package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.ColumnShim

/** Static forwarder shared by interpreted eval and generated code. */
object DamerauLevUtil {

  /** FULL Damerau–Levenshtein distance (Lowrance–Wagner 1975): unit-cost
    * insertion, deletion, substitution, and transposition, where a
    * transposed pair may be further edited between its two characters —
    * unlike the restricted "optimal string alignment" variant, d("CA",
    * "ABC") is 2 here (CA → AC → ABC), the same contract DuckDB's
    * `damerau_levenshtein` implements, which is what makes the expression
    * oracle-comparable. O(|s|·|t|) time, alphabet-mapped `da` row reuse.
    * Operates on UTF-16 code units (exact for ASCII and all BMP text).
    */
  def distance(as: UTF8String, bs: UTF8String): Int = {
    val s = as.toString.toCharArray
    val t = bs.toString.toCharArray
    val n = s.length
    val m = t.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // d is (n+2) x (m+2) with a sentinel border of `inf`
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= m) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    // last row in which each character was seen in s
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0 // last column in t matched at the current row
      j = 1
      while (j <= m) {
        val i1: Int = { val v = da.get(t(j - 1)); if (v == null) 0 else v }
        val j1 = db
        val cost = if (s(i - 1) == t(j - 1)) { db = j; 0 } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(s(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }
}

/** Full Damerau–Levenshtein distance as a native codegen'd expression —
  * Spark ships `levenshtein` but nothing transposition-aware, and entity
  * resolution over human-keyed strings wants transpositions scored as one
  * edit, not two. A static call, so the operator stays inside whole-stage
  * codegen like [[Fingerprint]] and [[NormalizeUnicode]].
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"damerau_levenshtein needs string inputs, got " +
        s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevUtil.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.text.DamerauLevUtil.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(DamerauLevenshtein(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}
