package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Fnv1a64

/** SparkSessionExtensions entry point: registers graft's native
  * expressions so SQL users (`SELECT fnv1a64(text) FROM docs`) and the
  * Column API share one codegen'd implementation.
  *
  * Wire up with:
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)
  * // or spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64].getName, "fnv1a64"),
      (children: Seq[Expression]) => Fnv1a64(children.head)))
  }
}
