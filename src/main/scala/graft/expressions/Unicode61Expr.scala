package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FTS5 `unicode61` tokenization ([[graft.functions.Unicode61]]) as a
  * native codegen expression: `string -> array<string>` of folded
  * tokens in ONE pass per row (fold + diacritic elision + split,
  * no intermediate lowercased string, no regex). Replaces the former
  * `array_remove(split(lower(s), "[^a-z0-9]+"), "")` tree on the FTS
  * path — same results on ASCII, exact unicode61 semantics beyond it.
  */
case class Unicode61Tokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    graft.functions.Unicode61.tokensArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Unicode61.tokensArray($c);")

  override protected def withNewChildInternal(newChild: Expression): Unicode61Tokens =
    copy(child = newChild)
}

object Unicode61Tokens {
  def u61_tokens(c: Column): Column =
    GraftShim.column(Unicode61Tokens(GraftShim.expression(c)))
}
