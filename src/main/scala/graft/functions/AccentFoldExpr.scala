package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for accent folding (X1's kernel) — keeps
  * the cornerstone string function inside whole-stage codegen instead of
  * a Scala UDF (no encoder boundary, no closure serialization; the
  * generated code is a single static call on the UTF8String).
  *
  * ASCII inputs (the overwhelming majority at corpus scale) return the
  * input object unchanged — zero allocation.
  */
case class AccentFoldExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    AccentFoldExpr.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AccentFoldExpr.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): AccentFoldExpr =
    copy(child = newChild)
}

object AccentFoldExpr {

  /** Static kernel invoked from generated code. */
  def fold(s: UTF8String): UTF8String = {
    if (s == null) return null
    // UTF8String is ASCII iff every byte < 0x80; numBytes==numChars is a
    // cheap sufficient check.
    if (s.numBytes() == s.numChars()) s
    else UTF8String.fromString(TextNorm.foldAccents(s.toString))
  }

  /** Column wrapper (classic-session API). */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(AccentFoldExpr(ColumnBridge.expression(c)))
  }
}
