package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.ColumnShim

/** Single-pass word n-gram shingling (distinct, first-occurrence order) —
  * called from both interpreted eval and generated code (top-level object
  * methods get static forwarders, so generated Java can call this directly).
  */
object ShinglesUtil {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Native codegen'd replacement for the HOF formulation
  * `array_distinct(transform(sequence(...), i => array_join(slice(toks, i+1,
  * n), " ")))`: identical output (order included — LinkedHashSet mirrors
  * array_distinct's first-occurrence order; split(" ", -1) mirrors Spark's
  * split semantics incl. empty tokens), but one pass over the string instead
  * of an interpreted lambda allocating two arrays per shingle. This is the
  * hot inner expression of every shingle-based dedup op (n-gram Jaccard,
  * MinHash, LSH banding); `TextShinglesSpec` pins bit-parity vs the HOF.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    ShinglesUtil.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.ShinglesUtil.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {
  def apply(text: Column, n: Int): Column =
    ColumnShim.column(Shingles(ColumnShim.expression(text), n))
}
