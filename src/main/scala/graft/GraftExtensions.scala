package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.sim.DotProduct
import graft.text.{Fingerprint, Shingles}

/** Session extensions: registers the engine's native expressions for SQL use
  * (`SELECT dot_product(a, b)`, `SELECT shingles(text, 3)`). Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingles takes (text, n)")
        val n = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"shingles: n must be an integer literal, got $other")
        }
        Shingles(args.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("fingerprint"),
      new ExpressionInfo(classOf[Fingerprint].getName, "fingerprint"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "fingerprint takes exactly 1 argument")
        Fingerprint(args.head)
      }))
  }
}
