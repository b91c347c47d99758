package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.ColumnShim

/** Static forwarder shared by interpreted eval and generated code. */
object NormalizeUtil {
  def normalize(text: UTF8String, form: String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.valueOf(form)))
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — Spark ships no builtin for it, and text dedup keys are
  * wrong without one: the precomposed and combining-mark encodings of the
  * same visible text hash to different fingerprints until normalized.
  * Stays inside whole-stage codegen (a static call, like [[Fingerprint]]);
  * accent stripping composes with the builtin
  * `regexp_replace(normalize(s, "NFD"), "\\p{Mn}", "")`.
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unknown normalization form $form")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NormalizeUtil.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"""graft.text.NormalizeUtil.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeUnicode {
  def apply(text: Column, form: String): Column =
    ColumnShim.column(NormalizeUnicode(ColumnShim.expression(text), form))
}
