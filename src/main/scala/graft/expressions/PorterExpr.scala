package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FTS5 `porter` tokenization ([[graft.functions.Porter]]: unicode61
  * fold + classic Porter stem) as a native codegen expression —
  * `string -> array<string>` of stemmed tokens in one pass per row,
  * the stemmed sibling of [[Unicode61Tokens]].
  */
case class PorterTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    graft.functions.Porter.tokensArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Porter.tokensArray($c);")

  override protected def withNewChildInternal(newChild: Expression): PorterTokens =
    copy(child = newChild)
}

object PorterTokens {
  def porter_tokens(c: Column): Column =
    GraftShim.column(PorterTokens(GraftShim.expression(c)))
}
