package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FTS5 `highlight(t, col, open, close)` on the RAW text
  * ([[graft.functions.Unicode61.highlightRaw]]): original bytes
  * preserved, matched token spans wrapped — unlike
  * [[graft.operators.Fts.highlight]]'s token-stream rendering. The
  * query terms are plan-time constants (FTS5's MATCH argument must be
  * a literal too), carried as a reference object into codegen.
  */
case class HighlightRaw(child: Expression, terms: Seq[String],
    open: String, close: String) extends UnaryExpression {
  require(terms.nonEmpty, "highlight needs at least one term")

  override def dataType: DataType = StringType

  @transient private lazy val termSet: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    terms.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.functions.Unicode61.highlightRaw(
      input.asInstanceOf[UTF8String].toString, termSet, open, close))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("termSet", termSet, "java.util.Set<String>")
    val openRef = ctx.addReferenceObj("open", open, "String")
    val closeRef = ctx.addReferenceObj("close", close, "String")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.Unicode61.highlightRaw(
         |    $c.toString(), $setRef, $openRef, $closeRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HighlightRaw =
    copy(child = newChild)
}

object HighlightRaw {
  def highlight_raw(c: Column, terms: Seq[String],
      open: String = "<b>", close: String = "</b>"): Column =
    GraftShim.column(HighlightRaw(GraftShim.expression(c), terms, open, close))
}
