package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FTS5 tokenizer-option variants as native codegen expressions —
  * same contract as [[Unicode61Tokens]] (`string -> array<string>` of
  * folded tokens, one pass per row, whole-stage codegen).
  */
case class Unicode61Rd2Tokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    graft.functions.Unicode61Rd2.tokensArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Unicode61Rd2.tokensArray($c);")

  override protected def withNewChildInternal(newChild: Expression): Unicode61Rd2Tokens =
    copy(child = newChild)
}

object Unicode61Rd2Tokens {
  def u61_rd2_tokens(c: Column): Column =
    GraftShim.column(Unicode61Rd2Tokens(GraftShim.expression(c)))
}

/** FTS5 `ascii` tokenizer ([[graft.functions.AsciiTok]]). */
case class AsciiTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    graft.functions.AsciiTok.tokensArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AsciiTok.tokensArray($c);")

  override protected def withNewChildInternal(newChild: Expression): AsciiTokens =
    copy(child = newChild)
}

object AsciiTokens {
  def ascii_tokens(c: Column): Column =
    GraftShim.column(AsciiTokens(GraftShim.expression(c)))
}

/** FTS5 `trigram` tokenizer ([[graft.functions.TrigramTok]]): the
  * positional token stream — every 3-codepoint window of the folded
  * text, duplicates kept (positions ARE stream offsets, which is what
  * the phrase/NEAR span machinery consumes).
  */
case class TrigramTokens(child: Expression, mode: Int = 0) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    graft.functions.TrigramTok.tokensArray(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TrigramTok.tokensArray($c, $mode);")

  override protected def withNewChildInternal(newChild: Expression): TrigramTokens =
    copy(child = newChild)
}

object TrigramTokens {
  def trigram_tokens(c: Column): Column =
    GraftShim.column(TrigramTokens(GraftShim.expression(c)))
  def trigram_tokens(c: Column, mode: Int): Column =
    GraftShim.column(TrigramTokens(GraftShim.expression(c), mode))
}

/** The trigram tokenizer's case fold as a string→string expression —
  * the fast path for single-phrase trigram MATCH (`contains` /
  * `startsWith` on the folded text instead of a token-array span scan).
  */
case class TrigramFold(child: Expression, mode: Int = 0) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    graft.functions.TrigramTok.foldUtf8(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TrigramTok.foldUtf8($c, $mode);")

  override protected def withNewChildInternal(newChild: Expression): TrigramFold =
    copy(child = newChild)
}

object TrigramFold {
  def trigram_fold(c: Column): Column =
    GraftShim.column(TrigramFold(GraftShim.expression(c)))
  def trigram_fold(c: Column, mode: Int): Column =
    GraftShim.column(TrigramFold(GraftShim.expression(c), mode))
}

/** FTS5 `highlight()` over a trigram table on the RAW text
  * ([[graft.functions.TrigramTok.highlightRaw]]): folded-substring
  * occurrence ranges wrapped in the markers, overlapping/touching
  * spans coalesced, anchored needles at offset 0 only — probed
  * against the binary. Needles are plan-time constants (pre-folded),
  * carried as a reference object into codegen.
  */
case class TrigramHighlightRaw(child: Expression,
    needles: Seq[(String, Boolean)], open: String, close: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  @transient private lazy val needleArr: Array[(String, Boolean)] = needles.toArray

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.functions.TrigramTok.highlightRaw(
      input.asInstanceOf[UTF8String].toString, needleArr, open, close))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nRef = ctx.addReferenceObj("needles", needleArr, "scala.Tuple2[]")
    val openRef = ctx.addReferenceObj("open", open, "String")
    val closeRef = ctx.addReferenceObj("close", close, "String")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.TrigramTok.highlightRaw(
         |    $c.toString(), (scala.Tuple2[]) $nRef, $openRef, $closeRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramHighlightRaw =
    copy(child = newChild)
}

object TrigramHighlightRaw {
  def trigram_highlight_raw(c: Column, needles: Seq[(String, Boolean)],
      open: String, close: String): Column =
    GraftShim.column(TrigramHighlightRaw(GraftShim.expression(c), needles, open, close))
}
