package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.AccentFoldExpr

/** Session extensions: registers the engine's native expressions for SQL
  * use (`spark.sql("SELECT accent_fold(c) ...")`).
  *
  * Wire up with:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("accent_fold"),
      new ExpressionInfo(classOf[AccentFoldExpr].getName, "accent_fold"),
      (children: Seq[Expression]) => AccentFoldExpr(children.head)))
  }
}
