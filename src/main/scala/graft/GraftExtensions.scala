package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{AccentFoldExpr, NormalizeTextExpr, RemovePrefixesExpr}

/** Session extensions: registers the engine's native expressions for SQL
  * use (`spark.sql("SELECT accent_fold(c) ...")`) — the full
  * text-normalization kernel a `spark.sql`-only user needs to replay the
  * FEFAL entity-matching semantics without touching the Scala API.
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
    def unary(name: String, clazz: Class[_], build: Expression => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => {
          // fail analysis, not execution: head-of-empty or silently
          // dropped extra args would otherwise surface as wrong results
          if (children.length != 1)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> name,
                "expectedNum" -> "1",
                "actualNum" -> children.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"))
          build(children.head)
        }))
    unary("accent_fold", classOf[AccentFoldExpr], AccentFoldExpr(_))
    unary("normalize_text", classOf[NormalizeTextExpr], NormalizeTextExpr(_))
    unary("remove_prefixes", classOf[RemovePrefixesExpr], RemovePrefixesExpr(_))
  }
}
