package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.ColumnShim

/** One-pass 31-polynomial rolling hash mod 2^31−1 — called from both
  * interpreted eval and generated code (static forwarder).
  */
object FingerprintUtil {
  def compute(text: UTF8String): Long = {
    val s = text.toString
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      // per CODE POINT, exactly ascii(substr(text, i, 1)) per character —
      // SQL substr/ascii index by code point, not UTF-16 unit
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Native codegen'd replacement for the HOF fingerprint formulation
  * `aggregate(transform(sequence(1, length(t)), i => ascii(substr(t, i, 1))),
  * ...)`. Identical output (parity pinned in `TextShinglesSpec`), but O(n)
  * instead of O(n²): the HOF materializes a boxed Long per character and
  * each `substr(i, 1)` re-scans the UTF8String from the start, which made
  * the fingerprint the dominant cost of every chunk/PII/dedup query over
  * full documents (q68 44 s → sub-second kernel at sf0.1).
  */
case class Fingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fingerprint needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    FingerprintUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.FingerprintUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fingerprint {
  def apply(text: Column): Column =
    ColumnShim.column(Fingerprint(ColumnShim.expression(text)))
}
