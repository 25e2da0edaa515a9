package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FTS5 `highlight(t, col, open, close)` on the RAW text
  * ([[graft.functions.Unicode61.highlightRawPhrases]]): original bytes
  * preserved, matched PHRASE-HIT spans wrapped (whole multi-token hits,
  * separators included; overlapping hits coalesced) — unlike
  * [[graft.operators.Fts.highlight]]'s token-stream rendering.
  *
  * `children(0)` is the text; `children(i + 1)` is phrase i's GATE — a
  * boolean that is FALSE on rows where FTS5 would not report that
  * phrase's instances (an OR operand whose branch didn't match, a
  * NOT'd operand; see [[graft.operators.Fts.PhraseEntry]]). The phrase
  * shapes themselves are plan-time constants (FTS5's MATCH argument
  * must be a literal too), carried as flat reference arrays into
  * codegen: `terms(p)(k)` / `prefix(p)(k)` = folded term k of phrase p
  * and its prefix-star flag.
  */
case class HighlightRaw(children: Seq[Expression],
    phrases: Seq[Seq[(String, Boolean)]],
    open: String, close: String) extends Expression {
  require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
    "highlight needs at least one non-empty phrase")
  require(children.length == phrases.length + 1,
    "one gate child per phrase, after the text child")

  override def dataType: DataType = StringType
  override def nullable: Boolean = children.head.nullable
  override def foldable: Boolean = children.forall(_.foldable)

  @transient private lazy val termArr: Array[Array[String]] =
    phrases.map(_.map(_._1).toArray).toArray
  @transient private lazy val prefixArr: Array[Array[Boolean]] =
    phrases.map(_.map(_._2).toArray).toArray

  override def eval(input: InternalRow): Any = {
    val t = children.head.eval(input)
    if (t == null) null
    else {
      val active = new Array[Boolean](phrases.length)
      var i = 0
      while (i < active.length) {
        val g = children(i + 1).eval(input)
        active(i) = g != null && g.asInstanceOf[Boolean]
        i += 1
      }
      UTF8String.fromString(graft.functions.Unicode61.highlightRawPhrasesGated(
        t.asInstanceOf[UTF8String].toString, termArr, prefixArr, active,
        open, close))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("terms", termArr, "java.lang.String[][]")
    val prefixRef = ctx.addReferenceObj("prefix", prefixArr, "boolean[][]")
    val openRef = ctx.addReferenceObj("open", open, "String")
    val closeRef = ctx.addReferenceObj("close", close, "String")
    val textGen = children.head.genCode(ctx)
    val gateGens = children.tail.map(_.genCode(ctx))
    val act = ctx.freshName("active")
    val gateCode = gateGens.zipWithIndex.map { case (g, i) =>
      s"""${g.code}
         |$act[$i] = !${g.isNull} && ${g.value};""".stripMargin
    }.mkString("\n")
    ev.copy(code = code"""
      ${textGen.code}
      boolean ${ev.isNull} = ${textGen.isNull};
      org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
      if (!${ev.isNull}) {
        boolean[] $act = new boolean[${phrases.length}];
        $gateCode
        ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
          graft.functions.Unicode61.highlightRawPhrasesGated(
            ${textGen.value}.toString(), $termsRef, $prefixRef, $act,
            $openRef, $closeRef));
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HighlightRaw =
    copy(children = newChildren)
}

object HighlightRaw {
  /** Gated phrase surface (r18): one (terms-with-prefix-flags, gate
    * column) pair per phrase.
    */
  def highlight_raw(c: Column, phrases: Seq[(Seq[(String, Boolean)], Column)],
      open: String = "<b>", close: String = "</b>"): Column =
    GraftShim.column(HighlightRaw(
      GraftShim.expression(c) +: phrases.map(p => GraftShim.expression(p._2)),
      phrases.map(_._1), open, close))

  /** Single-token ungated bareword surface (the pre-r18 signature):
    * each term is a 1-token exact phrase, always reported.
    */
  def highlight_raw_terms(c: Column, terms: Seq[String],
      open: String = "<b>", close: String = "</b>"): Column = {
    import org.apache.spark.sql.functions.lit
    highlight_raw(c, terms.map(t => (Seq((t, false)), lit(true))), open, close)
  }
}
